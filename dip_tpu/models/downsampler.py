"""Downsampler modules.

`Downsampler` wraps ops.resample.downsample (fixed, non-learned kernel —
the reference's default; /root/reference/models/downsampler.py:5-71).
`LearnableDownsampler` holds the kernel as a parameter initialized to the
same profile, supporting the reference's `opt_over='down'` mode
(utils/common_utils.py:44-46) where the degradation operator itself is
optimized.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from jax import lax

from dip_tpu.ops.pad import pad2d
from dip_tpu.ops.resample import downsample, resample_kernel_2d


class Downsampler(nn.Module):
    """Fixed antialiased downsampler (separable depthwise conv)."""

    factor: int
    kernel_type: str = "lanczos2"
    phase: float = 0.5
    preserve_size: bool = True

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return downsample(
            x,
            self.factor,
            kernel_type=self.kernel_type,
            phase=self.phase,
            preserve_size=self.preserve_size,
        )


class LearnableDownsampler(nn.Module):
    """Downsampler whose 2-D kernel is a learnable parameter (shared across
    channels), initialized to the reference profile."""

    factor: int
    kernel_type: str = "lanczos2"
    phase: float = 0.5
    preserve_size: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k2 = resample_kernel_2d(self.factor, self.kernel_type, self.phase)
        kernel = self.param(
            "kernel",
            lambda key, shape: jnp.asarray(k2, dtype=jnp.float32),
            k2.shape,
        )
        ksize = k2.shape[0]
        if self.preserve_size:
            p = (ksize - 1) // 2 if ksize % 2 == 1 else (ksize - self.factor) // 2
            x = pad2d(x, p, "replication")
        c = x.shape[-1]
        w = jnp.broadcast_to(kernel[:, :, None, None], (ksize, ksize, 1, c)).astype(x.dtype)
        return lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.factor, self.factor),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=lax.Precision.HIGHEST,
        )
