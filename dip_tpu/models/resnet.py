"""ResNet generator (NHWC, flax.linen).

Re-design of /root/reference/models/resnet.py:44-97: stem conv+act, N
residual blocks of [conv3(no bias) - norm(affine) - act - conv3(no bias) -
norm(affine)] with a center-crop-aligned residual add, a conv3+norm neck,
and a conv3+sigmoid head.

Divergence (documented): the reference's get_net wiring for 'ResNet'
(models/__init__.py:11) passes `nn.BatchNorm2d` into the *activation* slot
and would crash; we implement the evidently intended configuration
(LeakyReLU activations, batch-norm normalization, residual adds on).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dip_tpu.models.blocks import Conv, act, norm


class _ResBlock(nn.Module):
    features: int
    norm_kind: str
    act_fun: str
    residual: bool

    @nn.compact
    def __call__(self, x):
        h = Conv(self.features, 3, 1, bias=False, pad="zero")(x)
        h = norm(h, self.norm_kind)
        h = act(h, self.act_fun)
        h = Conv(self.features, 3, 1, bias=False, pad="zero")(h)
        h = norm(h, self.norm_kind)
        if self.residual:
            return h + x
        return h


class ResNet(nn.Module):
    num_output_channels: int = 3
    num_blocks: int = 10
    num_channels: int = 16
    need_residual: bool = True
    act_fun: str = "LeakyReLU"
    need_sigmoid: bool = True
    norm_kind: str = "batch"
    pad: str = "reflection"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv(self.num_channels, 3, 1, bias=True, pad=self.pad)(x)
        h = act(h, self.act_fun)
        for _ in range(self.num_blocks):
            h = _ResBlock(self.num_channels, self.norm_kind, self.act_fun,
                          self.need_residual)(h)
        h = Conv(self.num_channels, 3, 1, bias=True, pad="zero")(h)
        h = norm(h, self.norm_kind)
        h = Conv(self.num_output_channels, 3, 1, bias=True, pad=self.pad)(h)
        if self.need_sigmoid:
            h = nn.sigmoid(h)
        return h
