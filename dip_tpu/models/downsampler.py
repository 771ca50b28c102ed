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
        f = self.factor
        if self.preserve_size:
            p = (ksize - 1) // 2 if ksize % 2 == 1 else (ksize - f) // 2
            x = pad2d(x, p, "replication")
        n, h_in, w_in, c = x.shape
        h_out = (h_in - ksize) // f + 1
        w_out = (w_in - ksize) // f + 1
        # strided tap-sum: differentiable w.r.t. the learnable kernel and
        # free of feature-grouped convolutions (whose autodiff transpose
        # miscompiles on some TPU backends). K^2 static slices, all fused.
        acc = jnp.zeros((n, h_out, w_out, c), x.dtype)
        for i in range(ksize):
            for j in range(ksize):
                patch = lax.slice(
                    x,
                    (0, i, j, 0),
                    (n, i + (h_out - 1) * f + 1, j + (w_out - 1) * f + 1, c),
                    (1, f, f, 1),
                )
                acc = acc + kernel[i, j].astype(x.dtype) * patch
        return acc
