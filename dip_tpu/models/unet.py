"""UNet generator (NHWC, flax.linen).

Re-design of /root/reference/models/unet.py:32-192: 4-down/4-up UNet whose
widths [64,128,256,512,1024] are divided by `feature_scale`, optional
`concat_x` injection of the avg-pooled input at every depth, optional
`more_layers` extra depth, and deconv/bilinear/nearest up paths.  Up-path
double convs carry no normalization, matching unetUp (unet.py:172,176).

Divergence from the reference (documented, intended behavior implemented):
the reference's more_layers>0 path crashes on an undefined `self.more`
attribute (unet.py:116-117); here extra depth works.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from dip_tpu.models.blocks import (
    Conv,
    ConvTranspose,
    concat_cropped,
    norm,
    upsample,
)
from dip_tpu.ops.resample import avg_pool, max_pool


class _DoubleConv(nn.Module):
    """conv3-norm-ReLU x2 (unetConv2, unet.py:130-150)."""

    features: int
    norm_kind: str | None
    bias: bool
    pad: str

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = Conv(self.features, 3, 1, self.bias, self.pad)(x)
            x = norm(x, self.norm_kind)
            x = nn.relu(x)
        return x


class _Up(nn.Module):
    """Upsample + fuse with the skip tensor (unetUp, unet.py:165-192)."""

    features: int
    upsample_mode: str
    bias: bool
    pad: str

    @nn.compact
    def __call__(self, x, skip_t):
        if self.upsample_mode == "deconv":
            up = ConvTranspose(self.features, 4, 2, padding=1)(x)
        elif self.upsample_mode in ("bilinear", "nearest"):
            up = upsample(x, 2, self.upsample_mode)
            up = Conv(self.features, 3, 1, self.bias, self.pad)(up)
        else:
            raise ValueError(f"unknown upsample_mode {self.upsample_mode!r}")
        cat = concat_cropped([up, skip_t])
        return _DoubleConv(self.features, None, self.bias, self.pad)(cat)


class UNet(nn.Module):
    num_output_channels: int = 3
    feature_scale: int = 4
    more_layers: int = 0
    concat_x: bool = False
    upsample_mode: str = "deconv"
    pad: str = "zero"
    norm_kind: str | None = "instance"
    need_sigmoid: bool = True
    need_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        filters = [f // self.feature_scale for f in (64, 128, 256, 512, 1024)]

        # pyramid of avg-pooled inputs for concat_x (unet.py:78-82)
        pooled = [x]
        for _ in range(4 + self.more_layers):
            pooled.append(avg_pool(pooled[-1], 2))

        def width(f):
            return f - in_ch if self.concat_x else f

        h = _DoubleConv(width(filters[0]), self.norm_kind, self.need_bias, self.pad)(x)
        if self.concat_x:
            h = jnp.concatenate([h, pooled[0]], axis=-1)

        feats = [h]
        for i in range(1, 5):
            d = max_pool(feats[-1], 2)
            d = _DoubleConv(width(filters[i]), self.norm_kind, self.need_bias, self.pad)(d)
            if self.concat_x:
                d = jnp.concatenate([d, pooled[i]], axis=-1)
            feats.append(d)

        u = feats[-1]
        if self.more_layers > 0:
            prevs = [u]
            for k in range(self.more_layers):
                d = max_pool(prevs[-1], 2)
                d = _DoubleConv(width(filters[4]), self.norm_kind, self.need_bias, self.pad)(d)
                if self.concat_x:
                    d = jnp.concatenate([d, pooled[5 + k]], axis=-1)
                prevs.append(d)
            u = prevs[-1]
            for k in reversed(range(self.more_layers)):
                # same_num_filt=True: deconv keeps the channel count
                if self.upsample_mode == "deconv":
                    up = ConvTranspose(filters[4], 4, 2, padding=1)(u)
                else:
                    up = upsample(u, 2, self.upsample_mode)
                    up = Conv(filters[4], 3, 1, self.need_bias, self.pad)(up)
                cat = concat_cropped([up, prevs[k]])
                u = _DoubleConv(filters[4], None, self.need_bias, self.pad)(cat)

        for i in reversed(range(4)):
            u = _Up(filters[i], self.upsample_mode, self.need_bias, self.pad)(u, feats[i])

        out = Conv(self.num_output_channels, 1, 1, self.need_bias, self.pad)(u)
        if self.need_sigmoid:
            out = nn.sigmoid(out)
        return out
