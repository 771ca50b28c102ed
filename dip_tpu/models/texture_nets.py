"""Multi-scale pyramid generator (Texture Networks style).

Re-design of /root/reference/models/texture_nets.py:17-79: one branch per
pyramid ratio (avg-pool of the input, optional fresh-noise injection, three
conv-BN-act stages), merged coarse-to-fine — each merge batch-norms both
sides, concatenates, runs three conv-BN-act stages and upsamples until the
finest level emits the output conv.

Divergence (documented): the reference's local conv() computes float padding
under Python 3 (texture_nets.py:11) and would crash; we implement the
intended integer padding.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dip_tpu.models.blocks import Conv, GenNoise, TrainBatchNorm, act, concat_cropped, upsample
from dip_tpu.ops.resample import avg_pool


class TextureNet(nn.Module):
    ratios: Sequence[int] = (32, 16, 8, 4, 2, 1)
    fill_noise: bool = False
    pad: str = "zero"
    need_sigmoid: bool = False
    conv_num: int = 8
    upsample_mode: str = "nearest"
    num_output_channels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def cba(h, features, ksize):
            h = Conv(features, ksize, 1, True, self.pad)(h)
            h = TrainBatchNorm()(h)
            return act(h, "LeakyReLU")

        cur = None
        for i, ratio in enumerate(self.ratios):
            j = i + 1
            b = avg_pool(x, ratio) if ratio > 1 else x
            if self.fill_noise:
                b = GenNoise(b.shape[-1])(b)
            b = cba(b, self.conv_num, 3)
            b = cba(b, self.conv_num, 3)
            b = cba(b, self.conv_num, 1)

            if i == 0:
                cur = upsample(b, 2, self.upsample_mode)
                continue

            # batch-norm both sides before merging (texture_nets.py:53-54)
            b = TrainBatchNorm()(b)
            prev = TrainBatchNorm()(cur)
            m = concat_cropped([prev, b])
            width = self.conv_num * j
            m = cba(m, width, 3)
            m = cba(m, width, 3)
            m = cba(m, width, 1)
            if i == len(self.ratios) - 1:
                cur = Conv(self.num_output_channels, 1, 1, True, self.pad)(m)
            else:
                cur = upsample(m, 2, self.upsample_mode)

        if self.need_sigmoid:
            cur = nn.sigmoid(cur)
        return cur


def get_texture_nets(inp: int = 3, **kwargs) -> TextureNet:
    """Constructor mirroring the reference signature (texture_nets.py:17).
    `inp` is implied by the input tensor in a functional design."""
    del inp
    return TextureNet(**kwargs)
