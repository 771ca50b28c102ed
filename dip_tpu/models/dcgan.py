"""DCGAN-style generator (NHWC, flax.linen).

Re-design of /root/reference/models/dcgan.py:4-34: ConvTranspose(3x3, s1)
stem, (num_ups-3) x2-upsampling stages (transposed conv or
upsample+conv), a final x2 stage to 3 channels, optional sigmoid.

Divergence (documented): the reference passes `True` as LeakyReLU's
negative_slope (dcgan.py:10 — slope 1.0 == identity; evidently intended as
inplace=True with the default slope). We use the intended slope 0.01.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dip_tpu.models.blocks import Conv, ConvTranspose, TrainBatchNorm, upsample


class DCGAN(nn.Module):
    ndf: int = 32
    num_ups: int = 4
    need_sigmoid: bool = True
    need_bias: bool = True
    pad: str = "zero"
    upsample_mode: str = "nearest"
    need_convT: bool = True
    num_output_channels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = ConvTranspose(self.ndf, 3, 1, padding=0, bias=False)(x)
        h = TrainBatchNorm()(h)
        h = nn.leaky_relu(h, negative_slope=0.01)

        for _ in range(self.num_ups - 3):
            if self.need_convT:
                h = ConvTranspose(self.ndf, 4, 2, padding=1, bias=False)(h)
            else:
                h = upsample(h, 2, self.upsample_mode)
                h = Conv(self.ndf, 3, 1, bias=False, pad="zero")(h)
            h = TrainBatchNorm()(h)
            h = nn.leaky_relu(h, negative_slope=0.01)

        if self.need_convT:
            h = ConvTranspose(self.num_output_channels, 4, 2, padding=1, bias=False)(h)
        else:
            h = upsample(h, 2, "bilinear")
            h = Conv(self.num_output_channels, 3, 1, bias=False, pad="zero")(h)

        if self.need_sigmoid:
            h = nn.sigmoid(h)
        return h


def dcgan(inp: int = 2, **kwargs) -> DCGAN:
    del inp
    return DCGAN(**kwargs)
