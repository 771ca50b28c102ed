"""The skip net — DIP's workhorse encoder-decoder with per-scale skips.

Functional NHWC re-design of /root/reference/models/skip.py:5-100.  The
reference assembles the topology recursively out of nn.Sequential containers;
here the same dataflow is written as an explicit down pass + up pass, which
traces to an identical graph but reads (and jits) like a program rather than
a container tree:

  down pass, scale i:  skip_i = act(bn(conv1x1(x_i)))          (skip.py:57-60)
                       x_{i+1} = act(bn(conv(act(bn(conv_s2(x_i))))))
                                                               (skip.py:64-70)
  up pass, scale i:    u = upsample_2x(u)                      (skip.py:81)
                       u = bn(concat(skip_i, u))               (skip.py:51-55)
                       u = act(bn(conv_k(u)))                  (skip.py:83-85)
                       u = act(bn(conv1x1(u))) if need1x1_up   (skip.py:88-91)
  head:                sigmoid(conv1x1(u))                     (skip.py:96-98)

At the deepest scale the up pass consumes the encoder output directly
(skip.py:74-76).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from dip_tpu.models.blocks import (Conv, TrainBatchNorm, act, concat_cropped,
                                   crop_to_min, upsample)


def _per_scale(value, n):
    if isinstance(value, (list, tuple)):
        assert len(value) == n
        return list(value)
    return [value] * n


class Skip(nn.Module):
    """Encoder-decoder with skip connections (the DIP generator)."""

    num_output_channels: int = 3
    num_channels_down: Sequence[int] = (16, 32, 64, 128, 128)
    num_channels_up: Sequence[int] = (16, 32, 64, 128, 128)
    num_channels_skip: Sequence[int] = (4, 4, 4, 4, 4)
    filter_size_down: int | Sequence[int] = 3
    filter_size_up: int | Sequence[int] = 3
    filter_skip_size: int = 1
    need_sigmoid: bool = True
    need_bias: bool = True
    pad: str = "zero"
    upsample_mode: str | Sequence[str] = "nearest"
    downsample_mode: str | Sequence[str] = "stride"
    act_fun: str = "LeakyReLU"
    need1x1_up: bool = True
    # Virtual skip-concat: keep (skip, up) as separate tensors through the
    # post-concat BN and conv, computing with sliced full-width params —
    # numerically identical to materializing concat (BN stats are
    # per-channel; conv is linear in input channels), but avoids ever
    # building a 132-channel tensor whose lane padding (132 -> 256) costs
    # ~8 ms/iter of layout-copy HBM traffic at 512^2 on a v5e. Param tree is
    # unchanged. Set False to force the materialized concat.
    fuse_concat: bool = True
    # Fold the post-concat BN into the following conv as a per-channel
    # affine on the kernel (exact for reflect/replicate pad and 1x1 convs;
    # see Conv.__call__). Skips one full-res normalize write+read per
    # decoder scale. Param tree unchanged. Measured on v5e @512^2:
    # 20.98 -> 20.42 ms bf16, 30.08 -> 28.27 ms f32 (results/profile.jsonl
    # 'bf16_foldbn'/'foldbn'); exactness pinned by
    # tests/test_border_conv.py::test_skip_fold_bn_exact.
    fold_bn: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_scales = len(self.num_channels_down)
        assert len(self.num_channels_up) == len(self.num_channels_skip) == n_scales
        up_modes = _per_scale(self.upsample_mode, n_scales)
        down_modes = _per_scale(self.downsample_mode, n_scales)
        k_down = _per_scale(self.filter_size_down, n_scales)
        k_up = _per_scale(self.filter_size_up, n_scales)

        def cba(h, features, ksize, stride=1, dmode="stride"):
            h = Conv(features, ksize, stride, self.need_bias, self.pad, dmode)(h)
            h = TrainBatchNorm()(h)
            return act(h, self.act_fun)

        # --- encoder (down pass), collecting skip-branch outputs ------------
        skips: list[jnp.ndarray | None] = []
        for i in range(n_scales):
            if self.num_channels_skip[i] != 0:
                skips.append(cba(x, self.num_channels_skip[i], self.filter_skip_size))
            else:
                skips.append(None)
            x = cba(x, self.num_channels_down[i], k_down[i], stride=2, dmode=down_modes[i])
            x = cba(x, self.num_channels_down[i], k_down[i])

        # --- decoder (up pass) ----------------------------------------------
        from dip_tpu.ops import dispatch
        from dip_tpu.ops.up_conv import Up2, can_fuse_up2

        u = x
        for i in reversed(range(n_scales)):
            # Fused upsample2x->conv seam (ops/up_conv.py): the decoder conv
            # consumes the LR tensor directly through per-phase effective
            # kernels; the upsampled HR input (and its resize/pad ops, fwd
            # and bwd) never exist. Exact; gated on the dots lowering.
            fuse_up = (
                dispatch.up_conv_on(u.dtype)
                and can_fuse_up2(up_modes[i], k_up[i], 1, self.pad,
                                 u.shape[1], u.shape[2])
                and (skips[i] is None
                     or (self.fuse_concat and skips[i].shape[1:3]
                         == (2 * u.shape[1], 2 * u.shape[2])))
            )
            if fuse_up:
                uu = Up2(u, up_modes[i])
                u = [skips[i], uu] if skips[i] is not None else uu
            else:
                u = upsample(u, 2, up_modes[i])
                if skips[i] is not None:
                    if self.fuse_concat:
                        u = crop_to_min([skips[i], u])  # list: virtual concat
                    else:
                        u = concat_cropped([skips[i], u])
            foldable = self.pad in ("reflection", "replication") or k_up[i] == 1
            if self.fold_bn and foldable:
                u, s, t = TrainBatchNorm()(u, as_affine=True)
                h = Conv(self.num_channels_up[i], k_up[i], 1,
                         self.need_bias, self.pad)(u, s, t)
                h = TrainBatchNorm()(h)
                u = act(h, self.act_fun)
            else:
                u = TrainBatchNorm()(u)
                u = cba(u, self.num_channels_up[i], k_up[i])
            if self.need1x1_up:
                u = cba(u, self.num_channels_up[i], 1)

        u = Conv(self.num_output_channels, 1, 1, self.need_bias, self.pad)(u)
        if self.need_sigmoid:
            u = nn.sigmoid(u)
        return u


def skip(
    num_input_channels: int = 2,
    num_output_channels: int = 3,
    **kwargs,
) -> Skip:
    """Constructor mirroring the reference's signature (skip.py:5-11).
    `num_input_channels` is accepted for interface parity; in a functional
    design the input width is determined by the `z` tensor at init time."""
    del num_input_channels
    return Skip(num_output_channels=num_output_channels, **kwargs)
