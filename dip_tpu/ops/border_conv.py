"""Reflect/edge-padded 3x3 convolution without materializing the pad.

The reference pads before every conv (models/common.py:99-124), and the skip
net calls this ~17 times per forward. Materializing the (H+2, W+2) padded
tensor at 512^2x128 costs a full HBM round-trip per conv plus the layout
copies XLA inserts around the pad/slice pair — measured at ~3 ms of the
~35 ms DIP iteration on a v5e.

Convolution is linear in its input, so

    conv_valid(pad_reflect(x), W) == conv_zero(x, W) + border corrections,

where conv_zero keeps the zero-padding *inside* the XLA conv op (free: the
conv emitter handles edge windows without building a padded tensor) and the
corrections are 1-pixel-wide strip convolutions — the contribution of the
ghost rows/columns the reflect/edge pad would have supplied. Ghost corners
are assigned to the row strips (which get horizontally ghost-padded); the
column strips are zero-extended vertically so nothing is double-counted.

Only the 3x3 / pad-1 case (stride 1, or stride 2 with even H, W) is handled
— that covers every conv in the DIP recipes; callers fall back to
ops.pad.pad2d otherwise. Exactness vs the materialized pad is pinned in
tests/test_border_conv.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def can_borderfix(ks: int, stride: int, h: int, w: int, mode: str) -> bool:
    if mode not in ("reflection", "replication", "reflect", "edge"):
        return False
    if ks != 3:
        return False
    if stride == 1:
        return h >= 3 and w >= 3
    if stride == 2:
        return h % 2 == 0 and w % 2 == 0 and h >= 4 and w >= 4
    return False


def _ghost_row(x: jnp.ndarray, side: str, reflect: bool) -> jnp.ndarray:
    """The row the pad would place just outside `side` ('top'/'bottom')."""
    h = x.shape[1]
    if side == "top":
        i = 1 if reflect else 0
    else:
        i = h - 2 if reflect else h - 1
    return x[:, i : i + 1]


def _hpad_strip(s: jnp.ndarray, reflect: bool, right: bool = True) -> jnp.ndarray:
    """Extend a (1, 1, W, C) strip with its own horizontal ghost columns."""
    w = s.shape[2]
    left = s[:, :, 1:2] if reflect else s[:, :, 0:1]
    parts = [left, s]
    if right:
        parts.append(s[:, :, w - 2 : w - 1] if reflect else s[:, :, w - 1 : w])
    return jnp.concatenate(parts, axis=2)


def conv2d_borderfix(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                     mode: str) -> jnp.ndarray:
    """3x3 NHWC conv with virtual reflect/edge padding of 1 pixel.

    Equivalent to ``conv_valid(pad2d(x, 1, mode), kernel, stride)`` for
    ``mode in ('reflection', 'replication')`` without building the padded
    tensor. No bias (callers add it once).
    """
    reflect = mode in ("reflection", "reflect")
    n, h, w, c = x.shape
    s = stride

    from dip_tpu.ops.pallas_wgrad import conv2d_fast

    if s == 1:
        y = conv2d_fast(x, kernel, 1, ((1, 1), (1, 1)))
    else:
        # even H/W: the high edge never leaves the input, pad low only
        y = conv2d_fast(x, kernel, s, ((1, 0), (1, 0)))

    # Strip corrections are expressed as shifted-slice einsums rather than
    # degenerate-shape convolutions: 1-wide convs trip a CHECK in the TPU
    # conv emitter (zero-extent bitcast), and a [L, C] x [C, F] matmul is the
    # natural lowering anyway.
    n_out = y.shape[1]
    w_out = y.shape[2]

    def strip_corr(strip, krow, length):
        """sum_t strip[:, :, t::s][:length] . krow[t]  (strip: (1,1,L,C),
        krow: (3, C, F)) -> (1, 1, length, F)."""
        corr = None
        for t in range(3):
            seg = lax.slice_in_dim(strip, t, t + s * (length - 1) + 1, s, 2)
            term = jnp.einsum("nhwc,cf->nhwf", seg, krow[t])
            corr = term if corr is None else corr + term
        return corr

    # --- top row correction (owns the corners via horizontal ghost pad) ----
    strip = _hpad_strip(_ghost_row(x, "top", reflect), reflect, right=(s == 1))
    corr = strip_corr(strip, kernel[0], w_out)
    y = y.at[:, 0:1].add(corr)

    # --- left column correction (zero-extended vertically: corners counted)
    gcol = x[:, :, 1:2] if reflect else x[:, :, 0:1]
    vpad = [(0, 0), (1, 1 if s == 1 else 0), (0, 0), (0, 0)]
    col = jnp.pad(gcol, vpad).transpose(0, 2, 1, 3)          # (1, 1, L, C)
    corr = strip_corr(col, kernel[:, 0], n_out)
    y = y.at[:, :, 0:1].add(corr.transpose(0, 2, 1, 3))

    if s == 1:
        # --- bottom row ----------------------------------------------------
        strip = _hpad_strip(_ghost_row(x, "bottom", reflect), reflect)
        corr = strip_corr(strip, kernel[2], w_out)
        y = y.at[:, h - 1 : h].add(corr)
        # --- right column --------------------------------------------------
        gcol = x[:, :, w - 2 : w - 1] if reflect else x[:, :, w - 1 : w]
        col = jnp.pad(gcol, [(0, 0), (1, 1), (0, 0), (0, 0)])
        col = col.transpose(0, 2, 1, 3)
        corr = strip_corr(col, kernel[:, 2], n_out)
        y = y.at[:, :, w - 1 : w].add(corr.transpose(0, 2, 1, 3))

    return y
