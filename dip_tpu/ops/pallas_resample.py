"""Pallas TPU kernel: fused separable antialiased downsampling.

The XLA path (ops/resample.py) lowers to two depthwise convolutions with an
HBM round-trip for the H-pass intermediate.  This kernel fuses both passes:
each program DMAs the K input rows it needs from VMEM, reduces along H with
the 1-D profile, then computes the strided W-reduction — one read of x, one
write of y, no intermediate.

Layout: the kernel operates channel-planar (NC, H, W) so the image width
rides the 128-wide lane dimension (NHWC would waste 125/128 lanes at C=3).
Entry/exit transposes are fused by XLA into neighbors.

Why convolutions in the generator are NOT Pallas: they are dense MXU matmuls
that XLA already schedules optimally; the downsampler is the one hot op
whose reference form (a 99%-zeros dense conv, models/downsampler.py:44-50)
deserves a custom kernel.

Numerics match ops/resample.py exactly (same 1-D profile, fp32 accumulate);
`downsample_fused` golden-tests against it in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dip_tpu.ops.pad import pad2d
from dip_tpu.ops.resample import downsample as downsample_xla
from dip_tpu.ops.resample import resample_kernel_1d

try:  # pallas is part of jax, but keep the import soft for safety
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False


def _kernel_body(ktaps: int, factor: int, w_out: int, rows_per_prog: int,
                 k_ref, x_ref, sw_ref, o_ref):
    """Compute `rows_per_prog` output rows for one (plane, row-block).

    One aligned VMEM load per program (base = rb*rows_per_prog*factor, a
    multiple of 8 by construction — Mosaic requires provably 8-aligned
    sublane bases), then static in-block taps for the H-pass (VPU) and one
    banded-matrix matmul for the strided W-pass (MXU; Mosaic has no strided
    vector slices, and the matmul is the MXU-native form anyway).
    """
    c = pl.program_id(0)
    rb = pl.program_id(1)
    f = factor
    blk_h = (rows_per_prog - 1) * f + ktaps
    base = rb * (rows_per_prog * f)
    blk = x_ref[c, pl.ds(base, blk_h), :]  # (blk_h, W_in), aligned base
    tmp_rows = []
    for r in range(rows_per_prog):
        tmp = jnp.zeros((blk.shape[-1],), jnp.float32)
        for i in range(ktaps):
            tmp = tmp + k_ref[i] * blk[r * f + i, :].astype(jnp.float32)
        tmp_rows.append(tmp)
    tmp_blk = jnp.stack(tmp_rows, axis=0)  # (rows_per_prog, W_in)
    # HIGHEST precision: parity with the XLA path (PSNR-critical op)
    acc = jnp.dot(tmp_blk, sw_ref[:, :], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    o_ref[c, pl.ds(rb * rows_per_prog, rows_per_prog), :] = acc.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def downsample_fused(
    x: jnp.ndarray,
    factor: int,
    kernel_type: str = "lanczos2",
    phase: float = 0.5,
    preserve_size: bool = True,
    rows_per_prog: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused Pallas downsample of NHWC `x`. Semantics == ops.resample.downsample.

    Differentiable via custom VJP: the adjoint of y = S_h X S_w^T is
    dX = S_h^T g S_w (transposed banded matmuls, run as XLA einsums), plus
    the replication-pad adjoint (edge-gradient accumulation) when
    preserve_size is on — so the kernel drops into training losses.
    """
    if not HAVE_PALLAS:
        return downsample_xla(x, factor, kernel_type, phase, preserve_size)

    k1 = np.asarray(resample_kernel_1d(factor, kernel_type, phase),
                    dtype=np.float32)
    ktaps = k1.shape[0]
    x_padded = x
    if preserve_size:
        p = (ktaps - 1) // 2 if ktaps % 2 == 1 else (ktaps - factor) // 2
        x_padded = pad2d(x, p, "replication")

    n, h_in, w_in, c = x_padded.shape
    h_out = (h_in - ktaps) // factor + 1
    w_out = (w_in - ktaps) // factor + 1

    # rows_per_prog fixed at 8: the per-program input base rb*rpp*f and
    # output base rb*rpp must be provably 8-aligned for Mosaic vector loads.
    rpp = 8
    if h_out % rpp or interpret is False and w_out < 8:
        # odd geometry: fall back to the XLA banded-matmul path
        return downsample_xla(x, factor, kernel_type, phase, preserve_size)

    # channel-planar: (N*C, H_in, W_in) so W rides the lane dimension
    xp = x_padded.transpose(0, 3, 1, 2).reshape(n * c, h_in, w_in)

    from dip_tpu.ops.resample import _band_matrix

    s_wt = jnp.asarray(_band_matrix(k1, w_in, w_out, factor).T)  # (W_in, W_out)

    body = functools.partial(_kernel_body, ktaps, factor, w_out, rpp)
    out = pl.pallas_call(
        body,
        grid=(n * c, h_out // rpp),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # 1-D profile taps
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full input planes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # banded W matrix
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * c, h_out, w_out), x.dtype),
        interpret=interpret,
    )(jnp.asarray(k1), xp, s_wt)

    return out.reshape(n, c, h_out, w_out).transpose(0, 2, 3, 1)


def _fused_fwd(x, factor, kernel_type, phase, preserve_size, rows_per_prog,
               interpret):
    y = downsample_fused(x, factor, kernel_type, phase, preserve_size,
                         rows_per_prog, interpret)
    return y, x.shape


def _fused_bwd(factor, kernel_type, phase, preserve_size, rows_per_prog,
               interpret, x_shape, g):
    # downsampling is linear in x, so its VJP is point-independent: reuse the
    # XLA banded-matmul path's exact adjoint (transposed banded matmuls plus
    # the replication-pad gradient fold), derived by autodiff.
    x0 = jnp.zeros(x_shape, g.dtype)
    _, vjp = jax.vjp(
        lambda x: downsample_xla(x, factor, kernel_type, phase, preserve_size),
        x0,
    )
    return vjp(g)


downsample_fused.defvjp(_fused_fwd, _fused_bwd)
