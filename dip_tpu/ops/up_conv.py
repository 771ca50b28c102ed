"""Fused 2x-upsample -> 3x3 conv for the skip-net decoder seam.

The decoder's hottest pattern is `conv3x3(pad(upsample2x(u)))`
(/root/reference/models/skip.py:81-85). Materializing the upsampled
128-channel tensor at full resolution costs an HBM write+read per scale, the
banded-matmul lowering of the bilinear resize drags transposed layouts
through the MXU in forward AND backward (~2.5 ms/iter of the 13.9 ms bf16
512^2 step, docs/PERF.md "remaining structure"), and the following conv pads
the HR tensor again.

Both ops are linear, so they compose into ONE operator evaluated directly on
the low-resolution input via phase decomposition: for output phase
(py, px) in {0,1}^2,

    conv3x3(up2(x))[2i+py, 2j+px] = sum_{d,e in 0..2} x[i-1+d, j-1+e] @ E[py,px,d,e]

where the effective per-phase kernels E mix the conv kernel W with the
upsampler's interpolation weights: E[py,px,d,e] = sum_{k,l} B[py,d,k] *
B[px,e,l] * W[k,l]  (B encodes half-pixel bilinear: out[2i] = .25 x[i-1] +
.75 x[i], out[2i+1] = .75 x[i] + .25 x[i+1] — torch nn.Upsample(
align_corners=False), what ops/resample.upsample implements; or nearest).
E is a (3,3,C,4F) tensor computed from W each iteration (tiny, and linear,
so the weight gradient flows through it onto W with natural MXU shapes).

The fused form is 9 shifted-tap [N*h*w, C] @ [C, 4F] matmuls on the
LR tensor — same FLOPs as the unfused conv (9 taps at HR on C -> F equals
36 taps at LR folded to 4F outputs), but the HR input tensor, the resize's
banded matmuls/transposes, and the HR pad never exist, in forward or
backward.

Boundary semantics are preserved exactly:
 - up2's edge clamp == evaluating the interior phase formulas on an
   edge-replicated LR input (pad 1, mode='edge').
 - the conv's REPLICATION pad at HR is then exact with no further work;
   its REFLECTION pad differs from the phase form only on the outermost
   HR row/col of each side, by the rank-1 operator identity
   T_h(x)T_w - P_h(x)P_w = (T_h - P_h)(x)T_w + P_h(x)(T_w - P_w), where
   (T - P) deposits 0.25*(x[1]-x[0]) (resp. 0.25*(x[-2]-x[-1])) on the
   first (last) HR line through kernel row/col 0 (resp. 2). Those are four
   1-line strip corrections (the proven ops/border_conv.py pattern).
 - 'nearest' upsampling needs no corrections at all (its clamp/reflect
   interactions coincide with the replicate-padded phase form).

Exactness vs the unfused path (forward and gradients, both modes, both pad
modes, odd/even sizes) is pinned in tests/test_up_conv.py.

Dispatched via ops/dispatch.up_conv ('auto' = on for both trace dtypes
since wave 7; DIP_UP_CONV / FitConfig.up_conv), created by the Skip
decoder as an `Up2` virtual part so BatchNorm/Conv never materialize the
upsampled tensor (models/blocks.py). The 36-tap emission has two forms
(ops/dispatch.up_conv_impl): 'dots' — 9 shifted-tap matmuls, best on the
bf16 dots lowering — and 'conv' — ONE lax.conv_general_dilated with the
(3,3,C,4F) effective kernel, which keeps the tap accumulation on-chip and
wins on the f32 conv-op lowering (42.91 vs 40.3 it/s seam-off @512^2).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
from jax import lax

from dip_tpu.ops import dispatch
from dip_tpu.ops.dot_conv import _tap_dot


@dataclasses.dataclass
class Up2:
    """A not-yet-materialized 2x upsample of `x` (a virtual tensor part).

    TrainBatchNorm computes its HR moments directly from `x`
    (up2_moments); Conv consumes it with the fused phase kernels
    (up2_conv3x3); materialize() is the fallback.
    """

    x: jnp.ndarray
    mode: str  # 'bilinear' | 'nearest'

    @property
    def shape(self):
        n, h, w, c = self.x.shape
        return (n, 2 * h, 2 * w, c)

    @property
    def dtype(self):
        return self.x.dtype

    def materialize(self) -> jnp.ndarray:
        from dip_tpu.ops.resample import upsample

        return upsample(self.x, 2, self.mode)

    def affine(self, s: jnp.ndarray, t: jnp.ndarray) -> "Up2":
        """Per-channel affine maps commute with upsampling (interpolation
        weights are convex: rows of B sum to 1), so normalize the LR tensor."""
        return Up2(self.x * s.astype(self.x.dtype) + t.astype(self.x.dtype),
                   self.mode)


# 1-D phase mixing matrices B[p, d, k]: output phase p's dependence of
# LR tap d (on the edge-replicated input) on conv kernel index k.
# Derived from out[2i+p] = sum_dk x[i-1+d] B[p,d,k] W[k]; see module doc.
_B_BILINEAR = np.array(
    [
        [[0.75, 0.25, 0.00],
         [0.25, 0.75, 0.75],
         [0.00, 0.00, 0.25]],
        [[0.25, 0.00, 0.00],
         [0.75, 0.75, 0.25],
         [0.00, 0.25, 0.75]],
    ],
    dtype=np.float32,
)
_B_NEAREST = np.array(
    [
        [[1.0, 0.0, 0.0],
         [0.0, 1.0, 1.0],
         [0.0, 0.0, 0.0]],
        [[0.0, 0.0, 0.0],
         [1.0, 1.0, 0.0],
         [0.0, 0.0, 1.0]],
    ],
    dtype=np.float32,
)


def _bmat(mode: str) -> np.ndarray:
    if mode == "bilinear":
        return _B_BILINEAR
    if mode == "nearest":
        return _B_NEAREST
    raise ValueError(f"unsupported upsample mode for fusion: {mode!r}")


def can_fuse_up2(mode: str, ksize: int, stride: int, pad: str, h: int,
                 w: int) -> bool:
    return (mode in ("bilinear", "nearest") and ksize == 3 and stride == 1
            and pad in ("reflection", "replication", "reflect", "edge")
            and h >= 2 and w >= 2)


import functools


@functools.lru_cache(maxsize=None)
def _up2_matrix(L: int) -> np.ndarray:
    """Clamped half-pixel bilinear 2x upsampling as a (2L, L) matrix."""
    U = np.zeros((2 * L, L), np.float32)
    for i in range(L):
        U[2 * i, i] += 0.75
        U[2 * i, max(i - 1, 0)] += 0.25
        U[2 * i + 1, i] += 0.75
        U[2 * i + 1, min(i + 1, L - 1)] += 0.25
    return U


@functools.lru_cache(maxsize=None)
def _t_band(L: int) -> np.ndarray:
    """(3, 2L, L): exact 1-axis operators T^(e) = tap e of the reflect-pad
    conv after clamped up2 — the true boundary behavior as a banded matrix
    (host-side, becomes a trace constant)."""
    U = _up2_matrix(L)
    out = np.zeros((3, 2 * L, L), np.float32)
    for e in range(3):
        for o in range(2 * L):
            m = o + e - 1
            if m < 0:
                m = -m
            if m >= 2 * L:
                m = 2 * (2 * L - 1) - m
            out[e, o] = U[m]
    return out


@functools.lru_cache(maxsize=None)
def _p_band(L: int) -> np.ndarray:
    """(3, 2L, L): the replicate-padded phase operators P^(e) the main grid
    actually computes (identical to _t_band except on the outermost HR line
    of each side — their difference IS the correction)."""
    B = _B_BILINEAR
    out = np.zeros((3, 2 * L, L), np.float32)
    for e in range(3):
        for i in range(L):
            for p in range(2):
                for d in range(3):
                    j = min(max(i - 1 + d, 0), L - 1)
                    out[e, 2 * i + p, j] += B[p][d, e]
    return out


def _add_reflect_corrections(z: jnp.ndarray, x: jnp.ndarray,
                             kernel: jnp.ndarray) -> jnp.ndarray:
    """Reflection-pad deltas on the outermost HR ring (see module doc).

    Each side's correction is a LINEAR operator on two LR boundary lines;
    both the true axis operator T and the phase-grid operator P are banded
    matrices built exactly in numpy (_t_band/_p_band), so the whole ring
    costs two 3-operand einsums + four line updates instead of ~40 strip
    ops per scale (measured: the strip form cost ~2 ms/step at 512^2 and
    erased the fusion's win)."""
    n, h, w, c = x.shape
    dt = z.dtype
    # (T_h - P_h) (x) T_w : the H-side deltas live on HR rows 0 / 2h-1 and
    # carry 0.25*(x[1]-x[0]) (resp. 0.25*(x[h-2]-x[h-1])) through kernel
    # row 0 (resp. 2); the W axis applies the FULL exact operator T_w.
    tb = jnp.asarray(_t_band(w), x.dtype)
    d_tb = 0.25 * jnp.concatenate(
        [x[:, 1:2] - x[:, 0:1], x[:, h - 2:h - 1] - x[:, h - 1:h]], axis=1)
    k_tb = jnp.stack([kernel[0], kernel[2]])            # (2, 3, C, F)
    corr = jnp.einsum("eol,nrlc,recf->nrof", tb, d_tb, k_tb)
    z = z.at[:, 0:1].add(corr[:, 0:1].astype(dt))
    z = z.at[:, 2 * h - 1:2 * h].add(corr[:, 1:2].astype(dt))
    # P_h (x) (T_w - P_w) : W-side deltas on HR cols 0 / 2w-1 through kernel
    # cols 0 / 2, with the REPLICATE phase operator P_h along H (the exact
    # T_w on the rows above already owns the corners).
    pb = jnp.asarray(_p_band(h), x.dtype)
    d_lr = 0.25 * jnp.concatenate(
        [x[:, :, 1:2] - x[:, :, 0:1], x[:, :, w - 2:w - 1] - x[:, :, w - 1:w]],
        axis=2).transpose(0, 2, 1, 3)                   # (N, 2, h, C)
    k_lr = jnp.stack([kernel[:, 0], kernel[:, 2]])      # (2, 3, C, F)
    corr = jnp.einsum("eol,nrlc,recf->nrof", pb, d_lr, k_lr)
    corr = corr.transpose(0, 2, 1, 3)                   # (N, 2h, 2, F)
    z = z.at[:, :, 0:1].add(corr[:, :, 0:1].astype(dt))
    z = z.at[:, :, 2 * w - 1:2 * w].add(corr[:, :, 1:2].astype(dt))
    return z


def up2_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                up_mode: str = "bilinear",
                pad_mode: str = "reflection",
                carry: jnp.ndarray | None = None) -> jnp.ndarray:
    """conv_valid(pad1_{pad_mode}(upsample(x, 2, up_mode)), kernel), fused.

    x: (N, h, w, C), kernel: (3, 3, C, F) -> (N, 2h, 2w, F). No bias
    (callers add it once, as with the other conv lowerings).

    `carry` (same shape/dtype as the output) is added to the result —
    inside the Pallas kernel's epilogue when that path is taken
    (dispatch.seam_carry; the decoder's skip-branch result then never
    costs a separate full-HR add pass), as a plain add otherwise.
    """
    n, h, w, c = x.shape
    kh, kw, c2, f = kernel.shape
    assert kh == kw == 3 and c2 == c, (x.shape, kernel.shape)
    B = _bmat(up_mode)
    bj = jnp.asarray(B, kernel.dtype)
    # effective phase kernels, phases folded onto the output dim: (3,3,C,4F)
    e = jnp.einsum("pdk,qel,klcf->decpqf", bj, bj, kernel)
    e = e.reshape(3, 3, c, 4 * f)
    # edge pad as explicit concats (jnp.pad mode='edge' lowers through
    # gather/select fusions whose VJP cost ~0.5 ms/step at 512^2)
    xp = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
    xp = jnp.concatenate([xp[:, :, :1], xp, xp[:, :, -1:]], axis=2)
    impl = dispatch.up_conv_impl(x.dtype)
    if impl == "pallas":
        from dip_tpu.ops import pallas_up_conv

        if pallas_up_conv.seam_ok(n, h, w, c, f, x.dtype.itemsize):
            # VMEM-resident 9-tap accumulation + in-kernel phase->HR
            # interleave (one LR read, one HR write; f32 accumulator).
            if carry is not None:
                z = pallas_up_conv.up2_conv3x3_pallas_carry(xp, e, carry)
                carry = None
            else:
                z = pallas_up_conv.up2_conv3x3_pallas(xp, e)
            if up_mode == "bilinear" and pad_mode in ("reflection",
                                                      "reflect"):
                z = _add_reflect_corrections(z, x, kernel)
            return z
        impl = "dots"  # shape outside the kernel envelope
    if impl == "conv":
        # ONE convolution op over the padded LR tensor with the (3,3,C,4F)
        # effective kernel: the 9-tap accumulation happens inside the conv
        # emitter (VMEM/registers), so HBM sees one input read + one output
        # write instead of 9 round-trips of the 4F accumulator (the trace
        # showed ~212 us/tap at the top seam = accumulator-bound, ~1.7
        # ms/iter bf16 @512^2 across the 9 taps).
        acc = lax.conv_general_dilated(
            xp, e, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    elif impl == "im2col":
        # materialize the 9 shifted taps ONCE along channels and contract
        # in ONE [N*h*w, 9C] @ [9C, 4F] dot: ~0.5 GB/step less HBM traffic
        # than 9 accumulator round-trips at the top seam (the 9C column
        # tensor is 9x the input but ~2.2x smaller than the taps' combined
        # read+write of the 4F accumulator), and the dot keeps natural
        # dot_general layouts (unlike the 'conv' emission).
        cols = jnp.concatenate(
            [lax.slice(xp, (0, d, g, 0), (n, d + h, g + w, c))
             for d in range(3) for g in range(3)], axis=-1)
        acc = _tap_dot(cols, e.reshape(9 * c, 4 * f))
    else:
        acc = None
        for d in range(3):
            for g in range(3):
                xs = lax.slice(xp, (0, d, g, 0), (n, d + h, g + w, c))
                term = _tap_dot(xs, e[d, g])
                acc = term if acc is None else acc + term
    z = acc.astype(x.dtype).reshape(n, h, w, 2, 2, f)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, f)
    if carry is not None:
        z = z + carry
    if up_mode == "bilinear" and pad_mode in ("reflection", "reflect"):
        z = _add_reflect_corrections(z, x, kernel)
    return z


def up2_moments(x: jnp.ndarray, up_mode: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-channel (mean, var) of upsample(x, 2, up_mode) over
    (N, H, W), computed on the LR tensor.

    nearest: duplication changes neither moment. bilinear: every LR pixel's
    interpolation weights sum to 2 per axis (clamping included), so the mean
    is mean(x) exactly; the second moment is a banded quadratic form
    sum_{q,q'} (G_h (x) G_w)[q,q'] x_q x_q' with G = U^T U separable,
    G[i,i] = 1.25 (1.625 at the two edges), G[i,i+1] = 0.375 uniformly —
    five LR product-reduces instead of touching the HR tensor.
    """
    if up_mode == "nearest":
        return jnp.mean(x, axis=(0, 1, 2)), jnp.var(x, axis=(0, 1, 2))
    if up_mode != "bilinear":
        raise ValueError(f"unsupported upsample mode for moments: {up_mode!r}")
    n, h, w, c = x.shape
    assert h >= 2 and w >= 2
    # products in the compute dtype (same rounding class as jnp.var on the
    # HR tensor, which also squares in-dtype); reductions accumulate f32
    f32 = jnp.float32
    mean = jnp.mean(x, axis=(0, 1, 2), dtype=f32)
    g0h = np.full(h, 1.25, np.float32)
    g0h[0] = g0h[-1] = 1.625
    g0w = np.full(w, 1.25, np.float32)
    g0w[0] = g0w[-1] = 1.625
    g0h = jnp.asarray(g0h, x.dtype)
    g0w = jnp.asarray(g0w, x.dtype)
    s0 = jnp.einsum("nhwc,h,w->c", x * x, g0h, g0w,
                    preferred_element_type=f32)
    # neighbor terms: band weight 0.375, doubled for (q,q') + (q',q)
    sh = 0.75 * jnp.einsum("nhwc,w->c", x[:, :-1] * x[:, 1:], g0w,
                           preferred_element_type=f32)
    sw = 0.75 * jnp.einsum("nhwc,h->c", x[:, :, :-1] * x[:, :, 1:], g0h,
                           preferred_element_type=f32)
    # diagonal terms: 2 * 0.375^2 each direction
    sd = 0.28125 * (
        jnp.sum(x[:, :-1, :-1] * x[:, 1:, 1:], axis=(0, 1, 2), dtype=f32)
        + jnp.sum(x[:, 1:, :-1] * x[:, :-1, 1:], axis=(0, 1, 2), dtype=f32)
    )
    second = (s0 + sh + sw + sd) / (n * 4 * h * w)
    var = second - mean * mean
    return mean.astype(x.dtype), var.astype(x.dtype)
