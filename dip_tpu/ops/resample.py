"""Anti-aliased resampling as separable banded-matrix contractions (NHWC).

TPU-first re-design of the reference Downsampler op
(/root/reference/models/downsampler.py:5-135).  The reference materializes a
dense 2-D kernel and runs a full C->C conv whose weight is block-diagonal
(one 2-D kernel per channel, zeros elsewhere).  Here we observe that every
kernel family it supports (lanczos, gauss, box) is *separable* — the 2-D
kernel is the outer product of a 1-D profile with itself, and normalization
factors through the outer product — so we lower to two strided 1-D
correlations expressed as banded-matrix einsums (plain MXU matmuls).  That
cuts FLOPs from O(K^2) to O(2K) per output pixel, and deliberately avoids
depthwise feature-grouped convolutions, which fall off the TPU fast path
and whose autodiff transpose miscompiles on some backends.

Kernel numerics match the reference bit-for-bit up to float assoc:
 - 'lanczos2': support 2, width 4f+1; 'lanczos3': support 3, width 6f+1
   (downsampler.py:14-22)
 - 'gauss12': width 7 sigma .5; 'gauss1sq2': width 9 sigma 1/sqrt(2)
   (downsampler.py:24-32)
 - phase 0.5 shrinks the kernel by 1 and samples at half-pixel offsets
   (downsampler.py:77-78,108-110)
 - kernel normalized to sum 1 (downsampler.py:133)
 - preserve_size replication-pads by (K-1)/2 (K odd) or (K-factor)/2 (K even)
   (downsampler.py:54-61)
"""

from __future__ import annotations

import os


import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dip_tpu.ops.pad import pad2d


# ---------------------------------------------------------------------------
# kernel construction (host-side numpy; runs once per config)
# ---------------------------------------------------------------------------

def _resolve_kernel_family(kernel_type: str, factor: int):
    """Map the named presets to (family, width, support, sigma)."""
    if kernel_type == "lanczos2":
        return "lanczos", 4 * factor + 1, 2, None
    if kernel_type == "lanczos3":
        return "lanczos", 6 * factor + 1, 3, None
    if kernel_type == "gauss12":
        return "gauss", 7, None, 0.5
    if kernel_type == "gauss1sq2":
        return "gauss", 9, None, 1.0 / np.sqrt(2)
    if kernel_type in ("lanczos", "gauss", "box"):
        return kernel_type, None, None, None
    raise ValueError(f"unknown kernel type {kernel_type!r}")


def resample_kernel_1d(
    factor: int,
    kernel_type: str = "lanczos2",
    phase: float = 0.0,
    kernel_width: int | None = None,
    support: int | None = None,
    sigma: float | None = None,
) -> np.ndarray:
    """Build the (unnormalized-then-normalized) 1-D resampling profile.

    The reference's 2-D kernel equals ``np.outer(k1, k1)`` of this profile
    after normalization (lanczos/gauss values are products of per-axis
    factors; box is constant).
    """
    assert phase in (0, 0.5), "phase must be 0 or 0.5"
    family, w, sup, sig = _resolve_kernel_family(kernel_type, factor)
    kernel_width = kernel_width if w is None else w
    support = support if sup is None else sup
    sigma = sigma if sig is None else sig
    if kernel_width is None:
        raise ValueError("kernel_width required for generic kernel types")

    if phase == 0.5 and family != "box":
        size = kernel_width - 1
    else:
        size = kernel_width

    i = np.arange(1, size + 1, dtype=np.float64)
    center = (kernel_width + 1) / 2.0

    if family == "box":
        assert phase == 0.5, "box filter is always half-phased"
        k = np.full(size, 1.0 / kernel_width)
    elif family == "gauss":
        assert sigma, "sigma not specified"
        assert phase != 0.5, "phase 1/2 for gauss not implemented"
        # NOTE: the reference halves distances (di = (i - center)/2,
        # downsampler.py:97-98) — an idiosyncrasy we preserve for parity.
        d = (i - center) / 2.0
        k = np.exp(-(d * d) / (2 * sigma * sigma)) / np.sqrt(2.0 * np.pi * sigma * sigma)
    elif family == "lanczos":
        assert support, "support not specified"
        if phase == 0.5:
            d = np.abs(i + 0.5 - center) / factor
        else:
            d = np.abs(i - center) / factor
        k = np.ones(size)
        nz = d != 0
        dnz = d[nz]
        k[nz] = (
            support
            * np.sin(np.pi * dnz)
            * np.sin(np.pi * dnz / support)
            / (np.pi * np.pi * dnz * dnz)
        )
    else:  # pragma: no cover
        raise ValueError(family)

    k = k / k.sum()
    return k.astype(np.float64)


def resample_kernel_2d(factor: int, kernel_type: str = "lanczos2", phase: float = 0.0,
                       kernel_width: int | None = None, support: int | None = None,
                       sigma: float | None = None) -> np.ndarray:
    """Dense 2-D kernel (outer product of the 1-D profile). For tests/UI."""
    k1 = resample_kernel_1d(factor, kernel_type, phase, kernel_width, support, sigma)
    return np.outer(k1, k1)


# ---------------------------------------------------------------------------
# separable apply as banded-matrix contractions (MXU-native)
# ---------------------------------------------------------------------------
#
# A strided 1-D correlation is a banded matrix: S[o, i] = k[i - o*f] for
# i in [o*f, o*f+K). Downsampling is then y = S_h · X · S_w^T per channel —
# two einsums that XLA lowers to plain MXU matmuls. This is preferred over
# depthwise (feature-grouped) convolutions on TPU: grouped convs fall off the
# MXU fast path, and their autodiff transpose miscompiles on some backends.

def _band_matrix(k: np.ndarray, n_in: int, n_out: int, stride: int) -> np.ndarray:
    s = np.zeros((n_out, n_in), dtype=np.float32)
    ksize = k.shape[0]
    for o in range(n_out):
        s[o, o * stride : o * stride + ksize] = k
    return s


def _separable_matmul(x: jnp.ndarray, k: jnp.ndarray | np.ndarray,
                      factor: int) -> jnp.ndarray:
    """Apply the 1-D profile along H then W with stride `factor` (NHWC)."""
    n, h_in, w_in, c = x.shape
    k_np = np.asarray(k, dtype=np.float32)
    ksize = k_np.shape[0]
    h_out = (h_in - ksize) // factor + 1
    w_out = (w_in - ksize) // factor + 1
    s_h = jnp.asarray(_band_matrix(k_np, h_in, h_out, factor), dtype=x.dtype)
    s_w = jnp.asarray(_band_matrix(k_np, w_in, w_out, factor), dtype=x.dtype)
    # HIGHEST precision: this op sits inside the SR loss graph and its
    # accuracy bounds achievable PSNR.
    y = jnp.einsum("oh,nhwc->nowc", s_h, x, precision=lax.Precision.HIGHEST)
    return jnp.einsum("pw,nowc->nopc", s_w, y, precision=lax.Precision.HIGHEST)


def downsample(
    x: jnp.ndarray,
    factor: int,
    kernel_type: str = "lanczos2",
    phase: float = 0.5,
    preserve_size: bool = False,
    kernel_width: int | None = None,
    support: int | None = None,
    sigma: float | None = None,
) -> jnp.ndarray:
    """Anti-aliased downsample of NHWC `x` by integer `factor`.

    Drop-in equivalent of the reference Downsampler forward
    (downsampler.py:65-71): optional replication pad, then a stride-`factor`
    convolution with the normalized kernel — here run separably.
    Differentiable; used inside the SR task's autodiff graph.
    """
    k1 = resample_kernel_1d(factor, kernel_type, phase, kernel_width,
                            support, sigma)
    ksize = k1.shape[0]
    if preserve_size:
        if ksize % 2 == 1:
            p = (ksize - 1) // 2
        else:
            p = (ksize - factor) // 2
        x = pad2d(x, p, "replication")
    return _separable_matmul(x, k1, factor)


def upsample(x: jnp.ndarray, scale: int = 2, mode: str = "nearest") -> jnp.ndarray:
    """x2 (or xN) spatial upsampling of NHWC tensors.

    'nearest' duplicates pixels; 'bilinear' uses half-pixel centers, which
    matches torch ``nn.Upsample(align_corners=False)`` — the mode the
    reference uses everywhere (models/skip.py:81).
    """
    n, h, w, c = x.shape
    if mode == "nearest":
        # exact duplication — cheaper than jax.image.resize and identical
        return jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, scale, w, scale, c)
        ).reshape(n, h * scale, w * scale, c)
    if mode == "bilinear":
        # measured and rejected as default: 16.59 vs 15.87 ms bf16 @512^2 —
        # XLA's banded-matmul resize fuses better than the interleave
        from dip_tpu.ops import dispatch

        if scale == 2 and dispatch.up_shifts():
            return _up2_bilinear_shifts(x)
        return jax.image.resize(x, (n, h * scale, w * scale, c), method="bilinear")
    raise ValueError(f"unknown upsample mode {mode!r}")


def _up2_axis_shifts(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """2x bilinear upsample along one spatial axis by shifted adds.

    Half-pixel centers (torch nn.Upsample(align_corners=False), which
    jax.image.resize('bilinear') matches): out[2i] = .25 x[i-1] + .75 x[i],
    out[2i+1] = .75 x[i] + .25 x[i+1], edges clamped. Expressed as two
    elementwise combines + an interleave instead of the banded matmul
    jax.image.resize lowers to: on TPU the matmul form drags transposed
    layouts through the MXU for what is really a memory-bound VPU op
    (measured in docs/PERF.md)."""
    lo = jnp.concatenate([lax.slice_in_dim(x, 0, 1, axis=axis),
                          lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
                         axis=axis)
    hi = jnp.concatenate([lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
                          lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                           axis=axis)],
                         axis=axis)
    even = 0.25 * lo + 0.75 * x
    odd = 0.75 * x + 0.25 * hi
    y = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return y.reshape(shape)


def _up2_bilinear_shifts(x: jnp.ndarray) -> jnp.ndarray:
    return _up2_axis_shifts(_up2_axis_shifts(x, 1), 2)


def avg_pool(x: jnp.ndarray, window: int, stride: int | None = None) -> jnp.ndarray:
    stride = window if stride is None else stride
    y = lax.reduce_window(
        x, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), "VALID"
    )
    return y / (window * window)


def max_pool(x: jnp.ndarray, window: int, stride: int | None = None) -> jnp.ndarray:
    stride = window if stride is None else stride
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1), (1, stride, stride, 1), "VALID"
    )
