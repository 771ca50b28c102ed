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

Enabled via dispatch.conv_impl ('dots' or 'auto'+bf16; DIP_CONV_DOTS env /
FitConfig.conv_impl — see ops/dispatch.py), measured via
tools/profile_step.py 'bf16_dots' variants before any default flip.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from dip_tpu.ops import dispatch


def _tap_dot(xs: jnp.ndarray, k2d: jnp.ndarray) -> jnp.ndarray:
    """One tap's [N,Ho,Wo,C] @ [C,F] contraction.

    bf16 taps: each einsum's internal MXU accumulation is f32, but the
    cross-tap sum in the callers runs in the tap OUTPUT dtype. Keeping that
    bf16 (the default) was re-measured deliberately: requesting
    preferred_element_type=f32 so the 9-tap sum accumulates in f32 (like
    the XLA conv op does for its whole window) costs 13.9 -> 17.7 ms/step
    bf16 @512^2 (73.6 -> 56.7 it/s) because the step is HBM-bound and the
    f32 intermediates double the tap-sum traffic. Quality parity of bf16
    tap-sums is validated on the real-image recipes (RESULTS.md); opt in
    to f32 tap accumulation with dispatch.dots_acc_f32 when fidelity
    matters more than speed.

    dispatch.dots_f32_bf16mul makes f32 taps multiply in bf16 and
    accumulate in f32 (mimicking the XLA convolution op's default f32
    handling, which is single-pass bf16 — vs multi-pass bf16 emulation for
    f32 dots). Measured: 39.4 -> 31.3 ms f32 @512^2, still behind the
    28.3 ms f32 conv-op path, so it is opt-in and f32 stays on conv ops."""
    if xs.dtype == jnp.bfloat16:
        if dispatch.dots_acc_f32():
            return jnp.einsum("nhwc,cf->nhwf", xs, k2d,
                              preferred_element_type=jnp.float32)
        return jnp.einsum("nhwc,cf->nhwf", xs, k2d)
    if xs.dtype == jnp.float32 and dispatch.dots_f32_bf16mul():
        return jnp.einsum("nhwc,cf->nhwf", xs.astype(jnp.bfloat16),
                          k2d.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum("nhwc,cf->nhwf", xs, k2d)


def _conv_s2d(x: jnp.ndarray, kernel: jnp.ndarray, ho: int,
              wo: int) -> jnp.ndarray:
    """Stride-2 conv on a thin-channel input via space-to-depth.

    Strided tap slices on a narrow-channel tensor are pathologically slow
    here (~0.27 ms each at 512^2/32ch; the z input conv needs 9). Instead:
    one 2x2 space-to-depth rearrangement to (H/2, W/2, 4C), then the conv
    becomes a *stride-1* ceil(k/2)-tap conv over full-lane-width channels:

        x[2y+dy, 2x+dx, ci] == s2d(x)[y + dy//2, x + dx//2, (dy%2, dx%2, ci)]

    with the kernel re-indexed accordingly (missing taps are dropped, not
    zero-padded: for k=3 the (1,1) s2d-tap only needs the dy,dx=2 entries).
    """
    n, h, w, c = x.shape
    kh, kw, _, f = kernel.shape
    # pad to even spatial dims; the extra row/col is never read because the
    # output extent is fixed to (ho, wo)
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        h, w = h + h % 2, w + w % 2
    s2 = x.reshape(n, h // 2, 2, w // 2, 2, c)
    spk = dispatch.s2d_packed()
    if spk in ("pallas", "auto"):
        from dip_tpu.ops import pallas_s2d

        if pallas_s2d.pack_ok(n, h, w, c):
            spk = "pallas"
        else:
            spk = "xla" if spk == "pallas" else "off"
    if spk != "off":
        # Packed form (dispatch.s2d_packed): materialize s2d ONCE as a 4-D
        # (N, H/2, W/2, 4C) tensor with channel order (row-parity,
        # col-parity, ci) — via the one-pass Pallas kernel (ops/pallas_s2d)
        # or one XLA transpose — and contract with the remapped kernel
        # E[qy, qx, (p, q, ci), f] = K[2qy+p, 2qx+q, ci, f] (out-of-range
        # source taps are zeros) in ceil(k/2)^2 full-lane tap dots.  The
        # k^2 narrow slices of the 6-D view above cost ~0.4 ms/iter of
        # layout copies at 512^2/32ch (r5 bf16 trace); here every sliced
        # operand is 4C (=128 for the z input conv) lanes wide.  The extra
        # zero rows in E waste (4 ceil(k/2)^2 / k^2 - 1) of the tap FLOPs —
        # negligible at this conv's size vs the copy traffic saved.
        if spk == "pallas":
            from dip_tpu.ops import pallas_s2d

            sp = pallas_s2d.s2d_pack(x)
        else:
            sp = s2.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, h // 2, w // 2, 4 * c)
        qk = -(-kh // 2)
        kp = jnp.pad(kernel, ((0, 2 * qk - kh), (0, 2 * qk - kw),
                              (0, 0), (0, 0)))
        # kp[2qy+p, 2qx+q] -> E[qy, qx, (p, q, ci), f]
        e = kp.reshape(qk, 2, qk, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
        e = e.reshape(qk, qk, 4 * c, f)
        acc = None
        for qy in range(qk):
            for qx in range(qk):
                xs = lax.slice(sp, (0, qy, qx, 0),
                               (n, qy + ho, qx + wo, 4 * c))
                term = _tap_dot(xs, e[qy, qx])
                acc = term if acc is None else acc + term
        return acc.astype(x.dtype)
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            qy, qx = dy // 2, dx // 2
            xs = lax.slice(s2, (0, qy, dy % 2, qx, dx % 2, 0),
                           (n, qy + ho, dy % 2 + 1, qx + wo, dx % 2 + 1, c))
            xs = xs.reshape(n, ho, wo, c)
            term = _tap_dot(xs, kernel[dy, dx])
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


def conv2d_dots(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
                padding="VALID") -> jnp.ndarray:
    """NHWC x HWIO -> NHWC conv as a sum of per-tap matmuls.

    `padding` is 'VALID' or a pair-of-pairs ((ph0, ph1), (pw0, pw1)) of
    zero padding, as in lax.conv_general_dilated.
    """
    kh, kw = kernel.shape[:2]
    if (stride == 1 and kh > 1 and dispatch.dots_vjp()
            and padding != "VALID"
            and kh - 1 >= max(padding[0]) and kw - 1 >= max(padding[1])):
        return _conv2d_dots_cv(padding, x, kernel)
    return _conv2d_dots_impl(x, kernel, stride, padding)


def _conv2d_dots_impl(x: jnp.ndarray, kernel: jnp.ndarray, stride: int = 1,
                      padding="VALID") -> jnp.ndarray:
    n, h, w, c = x.shape
    kh, kw, c2, f = kernel.shape
    assert c == c2, (x.shape, kernel.shape)
    if padding == "VALID":
        (ph0, ph1), (pw0, pw1) = (0, 0), (0, 0)
    else:
        (ph0, ph1), (pw0, pw1) = padding
    # wave 11: thin-channel stride-1 3x3 convs — the decoder's HR skip
    # branch (num_channels_skip=4 at every scale of the flagship,
    # /root/reference/models/skip.py:46,57-60) is pathological as tap
    # dots: each of the 9 taps re-reads and re-writes the full F-wide
    # HBM accumulator (the one top-scale instance cost ~1.0 ms/iter of
    # the 10.3 ms bf16 512^2 step in the r5 wave-10 trace — 7 full
    # 64 MB add fusions).  Both alternative emissions keep the 9-tap
    # accumulation on-chip: 'conv' hands the op to the XLA convolution
    # emitter (internal VMEM im2col; no HBM accumulator traffic);
    # 'im2col' builds the narrow (N,Ho,Wo,9C) column tensor once and
    # contracts it in ONE dot.  dispatch.thin_conv selects.
    thin3 = stride == 1 and kh == kw == 3 and c <= 16
    tc = dispatch.thin_conv() if thin3 else "dots"
    if tc == "auto":
        # measured @512^2x50 on v5e (r5 wave 11, results/profile.jsonl):
        # im2col 9.26 ms bf16 / 14.80 f32 vs dots 10.27 / 20.95 and the
        # conv op 12.98 / 17.84 (its layout copies regress the dots
        # program, as wave 7 found for the seam) — im2col both dtypes
        tc = "im2col"
    if tc == "conv":
        return lax.conv_general_dilated(
            x, kernel, (1, 1), ((ph0, ph1), (pw0, pw1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)
    if ph0 or ph1 or pw0 or pw1:
        x = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
        h, w = h + ph0 + ph1, w + pw0 + pw1
    ho = (h - kh) // stride + 1
    wo = (w - kw) // stride + 1

    if tc == "im2col":
        cols = jnp.concatenate(
            [x[:, dy:dy + ho, dx:dx + wo, :]
             for dy in range(3) for dx in range(3)], axis=-1)
        # kernel (3,3,C,F) flattens to (9C, F) in the same (dy, dx, ci)
        # order the column blocks are concatenated in
        return _tap_dot(cols, kernel.reshape(9 * c, f)).astype(x.dtype)

    if kh == kw == 1:
        xs = x[:, ::stride, ::stride, :]
        return _tap_dot(xs, kernel[0, 0]).astype(x.dtype)

    # NOTE: a phase-decomposed stride-2 form (split x into stride^2 phase
    # planes so each tap becomes a unit slice — 4 strided slices instead of
    # 9) is numerically correct (it passed the CPU exactness test) but
    # reproducibly faults this TPU backend at 512^2 ("TPU device error —
    # often a kernel fault"), so the naive strided-tap form stays.
    if stride == 2 and dispatch.conv_s2d() and (
            c <= 64 or dispatch.conv_s2d_wide()):
        return _conv_s2d(x, kernel, ho, wo)
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            xs = lax.slice(
                x,
                (0, dy, dx, 0),
                (n, dy + (ho - 1) * stride + 1, dx + (wo - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            term = _tap_dot(xs, kernel[dy, dx])
            acc = term if acc is None else acc + term
    return acc.astype(x.dtype)


# -- hand-written VJP for the stride-1 dots conv -----------------------------
#
# Autodiff of the tap form gives each tap slice a pad-into-zeros VJP; the
# data gradient then materializes k^2 padded scatter buffers that XLA fuses
# into a chain costing ~1 ms/iter of the bf16 512^2 step (docs/PERF.md
# "remaining structure": pad/slice VJP chains). But the SUM of those
# shifted pads IS a convolution: dx = conv(dy, flip(W)^T) with padding
# (k-1-p) — one pad of dy, k^2 shifted matmuls, one output buffer. The
# weight gradient is the natural per-tap einsum on the SAME padded input
# the forward already built. Gated via dispatch.dots_vjp
# (DIP_DOTS_VJP / FitConfig.dots_vjp) until measured on hardware.

import functools
import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _conv2d_dots_cv(padding, x, kernel):
    return _conv2d_dots_impl(x, kernel, 1, padding)


def _cv_fwd(padding, x, kernel):
    return _conv2d_dots_impl(x, kernel, 1, padding), (x, kernel)


def _cv_bwd(padding, res, g):
    x, kernel = res
    kh, kw, c, f = kernel.shape
    (ph0, ph1), (pw0, pw1) = padding
    # dx = conv(g, W flipped spatially, transposed in/out), pad (k-1-p)
    k_t = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _conv2d_dots_impl(
        g, k_t, 1,
        ((kh - 1 - ph0, kh - 1 - ph1), (kw - 1 - pw0, kw - 1 - pw1)))
    # dW[dy,dx] = x_tap^T @ g on the padded input (same taps as forward)
    n, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    ho = h + ph0 + ph1 - kh + 1
    wo = w + pw0 + pw1 - kw + 1
    rows = []
    for dy in range(kh):
        row = []
        for dx_ in range(kw):
            xs = lax.slice(xp, (0, dy, dx_, 0),
                           (n, dy + ho, dx_ + wo, c))
            row.append(jnp.einsum("nhwc,nhwf->cf", xs, g))
        rows.append(jnp.stack(row))
    dk = jnp.stack(rows).astype(kernel.dtype)
    return dx.astype(x.dtype), dk


_conv2d_dots_cv.defvjp(_cv_fwd, _cv_bwd)
