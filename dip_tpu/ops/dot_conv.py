"""Convolution expressed as shifted-slice matmuls (dots) instead of the XLA
convolution op.

Motivation (xplane trace, bf16 512^2 step, docs/PERF.md): the convolution
ops themselves are <1 ms/iter, but XLA:TPU picks convolution-specific
operand layouts and inserts ~6 ms/iter of layout-change copies around them,
and its weight-gradient emission for the hot 3x3x128x128 conv runs through a
transposed-copy chain (~1.8 ms/iter for that one wgrad fusion).

A k x k conv is a sum over its k^2 taps of a plain [N*Ho*Wo, C] x [C, F]
matmul on a shifted window:

    conv(x, W)[n, y, x', f] = sum_{dy, dx} x[n, y*s+dy, x'*s+dx, :] @ W[dy, dx]

Expressed this way, forward, data-grad and weight-grad all lower to
dot_general with natural row-major layouts — the MXU shapes are (HW, C) x
(C, F) fwd, (HW, F) x (F, C) dgrad, and (C, HW) x (HW, F) wgrad, with no
convolution-op layout constraints. Same FLOPs, same math (fp reassociation
only). This mirrors how this package already lowers resampling (banded
einsums, ops/resample.py) after this backend's grouped-conv emitter proved
buggy in scanned programs.

Enabled per-process with DIP_CONV_DOTS=1 (measured via
tools/profile_step.py 'bf16_dots' variants before any default flip).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv2d_dots(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
                padding="VALID") -> jnp.ndarray:
    """NHWC x HWIO -> NHWC conv as a sum of per-tap matmuls.

    `padding` is 'VALID' or a pair-of-pairs ((ph0, ph1), (pw0, pw1)) of
    zero padding, as in lax.conv_general_dilated.
    """
    n, h, w, c = x.shape
    kh, kw, c2, f = kernel.shape
    assert c == c2, (x.shape, kernel.shape)
    if padding == "VALID":
        (ph0, ph1), (pw0, pw1) = (0, 0), (0, 0)
    else:
        (ph0, ph1), (pw0, pw1) = padding
    if ph0 or ph1 or pw0 or pw1:
        x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
        h, w = h + ph0 + ph1, w + pw0 + pw1
    ho = (h - kh) // stride + 1
    wo = (w - kw) // stride + 1

    if kh == kw == 1:
        xs = x[:, ::stride, ::stride, :]
        return jnp.einsum("nhwc,cf->nhwf", xs, kernel[0, 0])

    # NOTE: a phase-decomposed stride-2 form (split x into stride^2 phase
    # planes so each tap becomes a unit slice — 4 strided slices instead of
    # 9) is numerically correct (it passed the CPU exactness test) but
    # reproducibly faults this TPU backend at 512^2 ("TPU device error —
    # often a kernel fault"), so the naive strided-tap form stays.
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            xs = lax.slice(
                x,
                (0, dy, dx, 0),
                (n, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            term = jnp.einsum("nhwc,cf->nhwf", xs, kernel[dy, dx])
            acc = term if acc is None else acc + term
    return acc
