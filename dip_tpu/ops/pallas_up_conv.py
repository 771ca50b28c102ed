"""Pallas TPU kernel for the fused 2x-upsample -> 3x3 conv decoder seam.

The XLA emissions of the seam (ops/up_conv.py) leave real money on the
table at the top decoder scale (LR 256^2, C=128 -> 4F=512 @ 512^2 input):

 - 'dots' (9 shifted-tap matmuls): each tap re-reads and re-writes the
   full 4F accumulator in HBM (~212 us/tap measured) — ~1.5 ms/iter bf16,
   plus ~0.7 ms of reshape/transpose/copy turning the phase-major
   [h, w, 2, 2, F] accumulator into the interleaved HR tensor;
 - 'conv' (one XLA conv op): on-chip accumulation but convolution-op
   layouts regress the surrounding dots program (measured, PERF.md wave 7);
 - 'im2col': one dot, but the 9C column tensor still costs ~3x the input
   in traffic (measured a wash).

This kernel does what none of the XLA forms can express at once: the 9-tap
accumulation lives in a f32 VMEM scratch (zero HBM accumulator traffic),
and the phase->HR interleave happens in registers on the way out, so HBM
sees exactly one read of the LR input and one write of the HR output.
Speed-of-light for the top seam is ~0.39 ms of MXU time + ~0.1 ms of HBM
time per direction, vs the ~2.2 ms the XLA forms spend.

Shapes and tiling
-----------------
Forward: xp (N, h+2, w+2, C) [the edge-padded LR input from up_conv.py],
e (3, 3, C, 4F) [the phase-folded effective kernel] -> z (N, 2h, 2w, F).
The grid walks row tiles of TH LR rows. The 2-row halo every tile needs is
expressed WITHOUT overlapping block specs (Pallas blocks are start =
index * block_shape) by passing xp twice: a (TH, w+2, C) main block at row
tile i and a (2, w+2, C) halo block at rows (i+1)*TH — the halo of the
last tile is exactly xp's 2 trailing pad rows, so the grid covers the
array with no remainder. Per tile, the 9 taps are static slices of the
assembled (TH+2, w+2, C) VMEM tile feeding [TH*w, C] @ [C, 4F] MXU dots
with f32 accumulation (NB: the XLA dots path accumulates cross-tap in
bf16 for bandwidth reasons — in VMEM the f32 accumulator is free, so the
kernel is numerically STRONGER than the shipped dots form), and the
result is interleaved to (2*TH, 2w, F) in-kernel.

Backward (custom_vjp): the HR cotangent dz is de-interleaved to phase
form (N, h, w, 4F) ONCE in XLA-land (one transpose-copy ~0.2 ms at the
flagship that usually fuses upstream), then both kernels consume
phase-major tiles directly. Wave-9.5 rationale: the first version
de-interleaved per-tile in VMEM, which (a) spent VPU shuffle time in the
hot kernel and (b) doubled the tile working set — the r5 trace showed
dgrad at 39% MFU vs wgrad's 74%, and the 8-row dgrad tile overflowed
VMEM by 128 KB. Phase-major tiles halve the footprint, so the bwd tiles
double (table below). dgrad consumes dz_phase zero-padded by 2 phase
rows/cols (one XLA pad; keeps every tile's tap window in-bounds) and
emits dxp via the transposed taps dxp[r,s] = sum_{d,g} dacc[r-d, s-g] @
e[d,g]^T; wgrad accumulates de[d,g] = xs^T @ dacc across row tiles in a
persistent f32 VMEM scratch (TPU grids run sequentially) and writes it
on the last step.

Dispatched via ops/dispatch.up_conv_impl == 'pallas'
(DIP_UP_CONV_IMPL=pallas / FitConfig.up_conv_impl). up_conv.py falls back
to the 'dots' form when the shape is outside the kernel's envelope
(h % TH != 0, or the per-tile accumulator would overflow VMEM).
Exactness vs the unfused reference path is pinned in tests/test_up_conv.py
(interpret mode on CPU); parity on the TPU itself is asserted by
tools/pallas_seam_check.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile sizes, per kernel and element size.  The v5e scoped-VMEM stack
# is 16 MB; measured at the flagship top seam (LR 256^2, C=128, 4F=512):
#  - fwd bf16 fits at 8 LR rows; f32 doubles every tile buffer and needs 4
#    (8 overflowed by 10.4 MB);
#  - bwd kernels consume PHASE-MAJOR dz (the de-interleave happens once
#    in XLA — see module docstring), so they carry no in-VMEM shuffle
#    temps.  wgrad fits 8 rows bf16.  dgrad stays at 4: its tile set
#    (main+halo blocks double-buffered + the concat temp + live tap
#    slice, all at 4F width) measured 19.38 MB at 8 rows inside the full
#    train step — 3.4 MB over the 16 MB scoped-VMEM limit (the win at 4
#    comes from deleting the per-tile de-interleave shuffle, not the
#    tile size).
# Tiles must stay even: each halo block is addressed at (i+1)*(tile//2)
# block granularity for dgrad's 2-phase-row halo.  seam_ok requires
# h % 8 == 0 so every tile size in this table divides the row count.
_TH = 8  # bf16 forward


def _tiles(itemsize: int) -> tuple[int, int, int]:
    """(fwd, dgrad, wgrad) row tiles for an element size in bytes.

    f32 runs MIXED: tiles are f32 only where HBM I/O is f32 (fwd input/
    output, dgrad output, wgrad xp/output) — the MXU operands are cast to
    bf16 in-kernel (see _mx) and dz reaches the backward kernels already
    in bf16, so dgrad/wgrad fit the same 8-row tiles as the bf16 path;
    only the forward (f32 out block + f32 acc) stays at 4."""
    return (8, 8, 8) if itemsize == 2 else (4, 8, 8)

# Scoped-VMEM budget: v5e allows 16 MiB of stack per kernel. _est_bytes
# itemizes each kernel's tile set (double-buffered in/out blocks + scratch
# + the big in-kernel temps); Mosaic's real allocation runs ~20% above the
# model (dot operand staging). Two measured anchors calibrate the cutoff:
#  - flagship top seam (w=256): max estimate 13.01 MiB (bf16 fwd),
#    compiles and runs on v5e — the shipped default;
#  - fleet 448x704 image (top seam w=352, f32): wgrad estimated 14.32,
#    actual 17.19 MiB -> scoped-VMEM compile failure (round-5 fleet eval).
# 13.5 MiB on the ESTIMATE separates them; anything above falls back to
# the 'dots' emission in up_conv.py, which is correct at every shape.
_VMEM_EST_MAX = int(13.5 * 2 ** 20)


def _est_bytes(w: int, c: int, f: int, isz: int) -> int:
    """Max over the 3 kernels of the per-tile scoped-VMEM estimate."""
    tf, td, tw = _tiles(isz)
    e_blk = 9 * c * 4 * f * 2  # effective kernel, bf16 in both modes
    fwd = (2 * (tf + 2) * (w + 2) * c * isz      # xp main+halo blocks (2x)
           + e_blk
           + 2 * (2 * tf) * (2 * w) * f * isz    # out blocks (2x)
           + (tf + 2) * (w + 2) * c * 2          # xt concat temp (bf16)
           + tf * w * 4 * f * 4                  # f32 accumulator
           + tf * w * 4 * f * isz)               # interleave temp
    dgr = (2 * (td + 2) * (w + 4) * 4 * f * 2    # dz blocks, bf16 always
           + e_blk
           + 2 * td * (w + 2) * c * isz          # out blocks (2x)
           + td * (w + 2) * c * 4                # f32 accumulator
           + td * (w + 4) * c * 4)               # live dot piece
    wgr = (2 * (tw + 2) * (w + 2) * c * isz      # xp main+halo blocks (2x)
           + 2 * tw * w * 4 * f * 2              # dz blocks, bf16 (2x)
           + 9 * c * 4 * f * 4                   # persistent f32 scratch
           + 9 * c * 4 * f * isz                 # out block
           + (tw + 2) * (w + 2) * c * 2)         # xt concat temp (bf16)
    return max(fwd, dgr, wgr)


def seam_ok(n: int, h: int, w: int, c: int, f: int, itemsize: int) -> bool:
    """Whether the Pallas seam kernel supports this shape/dtype.

    C and F must be lane-width multiples: the kernels' phase split/merge
    reshapes ((TH*w, 4F) <-> (TH, w, 2, 2, F)) are shape casts on the
    minor dimension, which Mosaic only lowers when the minor dim stays
    128-aligned (measured: f=64 fails 'infer-vector-layout: unsupported
    shape cast' on v5e). The flagship skip-128 decoder is C=F=128 at
    every seam; narrower seams fall back to the 'dots' emission.  Wide
    rows are bounded by the scoped-VMEM budget (_est_bytes above).
    """
    if h % _TH or h < _TH:
        return False
    if c % 128 or f % 128:
        return False
    return _est_bytes(w, c, f, itemsize) <= _VMEM_EST_MAX


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _mx(a: jnp.ndarray) -> jnp.ndarray:
    """MXU operand precision: f32 operands are cast to bf16 before the
    dots (accumulation stays f32 in VMEM).  This is the same numeric
    class as the shipped f32 path's XLA convolutions/dots, which run
    DEFAULT precision (single bf16 pass, f32 accumulation) — the wave-9
    full-f32 kernel (f32 multi-pass MXU work on halved tiles) measured
    39.3 it/s vs the XLA forms' 43.9 and was rejected; this mixed form
    replaces it."""
    return a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a


# -- forward -----------------------------------------------------------------


def _fwd_kernel(xm_ref, xh_ref, e_ref, *rest, th, w, c, f):
    cr_ref, out_ref = rest if len(rest) == 2 else (None, rest[0])
    xt = _mx(jnp.concatenate([xm_ref[0], xh_ref[0]], axis=0))  # (th+2,w+2,C)
    acc = jnp.zeros((th * w, 4 * f), jnp.float32)
    for d in range(3):
        for g in range(3):
            xs = xt[d:d + th, g:g + w, :].reshape(th * w, c)
            acc = acc + jnp.dot(xs, e_ref[d, g],
                                preferred_element_type=jnp.float32)
    z = acc.reshape(th, w, 2, 2, f).astype(out_ref.dtype)
    # phase -> HR interleave in VMEM: out[2r+p, 2s+q, :] = z[r, s, p, q, :]
    z = z.transpose(0, 2, 1, 3, 4).reshape(2 * th, 2 * w, f)
    if cr_ref is not None:
        # carry-in (the skip-branch conv result): the epilogue add runs in
        # the OUTPUT dtype, matching the XLA emission it replaces (IEEE
        # addition is bitwise commutative, so operand order is free)
        z = z + cr_ref[0]
    out_ref[0] = z


def _fwd_tile(itemsize: int, w: int, c: int, f: int, carry: bool) -> int:
    """Forward row tile, shrunk (h % 8 == 0 via seam_ok, so halving stays
    aligned) until the per-tile VMEM estimate — including the carry
    blocks when present — fits the scoped budget."""
    th = _tiles(itemsize)[0]
    while th > 2:
        est = (2 * (th + 2) * (w + 2) * c * itemsize
               + 9 * c * 4 * f * 2
               + (2 + 2 * bool(carry)) * (2 * th) * (2 * w) * f * itemsize
               + (th + 2) * (w + 2) * c * 2
               + th * w * 4 * f * 4
               + th * w * 4 * f * itemsize)
        if est <= _VMEM_EST_MAX:
            return th
        th //= 2
    return th


def _fwd(xp: jnp.ndarray, e: jnp.ndarray,
         carry: jnp.ndarray | None = None) -> jnp.ndarray:
    n, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    f = e.shape[-1] // 4
    th = _fwd_tile(xp.dtype.itemsize, w, c, f, carry is not None)
    e = _mx(e)  # MXU operands are bf16 either way; halves the e block
    grid = (n, h // th)
    kern = functools.partial(_fwd_kernel, th=th, w=w, c=c, f=f)
    out_spec = pl.BlockSpec((1, 2 * th, 2 * w, f), lambda b, i: (b, i, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, th, w + 2, c), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, w + 2, c),
                     lambda b, i: (b, (i + 1) * (th // 2), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, c, 4 * f), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (xp, xp, e)
    if carry is not None:
        in_specs.append(out_spec)
        args = args + (carry,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, f), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * c * 4 * f,
            bytes_accessed=(xp.size + e.size
                            + (1 + bool(carry is not None)) * n * 4 * h * w
                            * f) * xp.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(*args)


# -- backward: data gradient --------------------------------------------------


def _dgrad_kernel(dm_ref, dh_ref, e_ref, out_ref, *, td, w, c, f):
    # Phase-major cotangent window: main (td, w+4, 4F) + halo (2, w+4, 4F);
    # window row j = phase row (i*td + j - 2) of the 0..h-1 dacc domain
    # (zero outside).  Wave-9.7 structure: tap (d, g) needs window rows
    # (2-d .. 2-d+td-1) at cols (2-g .. 2-g+w+1).  Slicing ROWS of the
    # blocks is a contiguous fold (free shape cast); the g-shift moves to
    # the OUTPUT side as a narrow (C-wide) slice-add on the f32
    # accumulator.  vs the wave-9.5 form (concat main+halo, then 9 wide
    # 4F slices): no (td+2)-row concat temp and no wide slice copies, so
    # the VMEM budget fits td=8 (wave 9.5 measured 19.4 MB at td=8; this
    # form frees the ~2.7 MB concat + ~2.1 MB live wide-slice temps).
    main = dm_ref[0]
    halo = dh_ref[0]
    acc = jnp.zeros((td, w + 2, c), jnp.float32)
    for d in range(3):
        for g in range(3):
            et = e_ref[d, g].T  # (4F, C)
            # main rows 2-d .. td-1 -> out rows 0 .. td-3+d (may be empty
            # when td == 2, the f32 tile); halo rows 0 .. 1-d -> out rows
            # td-2+d .. td-1.  Together the pieces tile the td out rows.
            m = td - 2 + d
            pieces = []
            if m > 0:
                part = jnp.dot(main[2 - d:].reshape(m * (w + 4), 4 * f), et,
                               preferred_element_type=jnp.float32)
                pieces.append(part.reshape(m, w + 4, c))
            if d < 2:
                hs = halo[0:2 - d].reshape((2 - d) * (w + 4), 4 * f)
                hp = jnp.dot(hs, et, preferred_element_type=jnp.float32)
                pieces.append(hp.reshape(2 - d, w + 4, c))
            part = (pieces[0] if len(pieces) == 1
                    else jnp.concatenate(pieces, axis=0))
            acc = acc + part[:, 2 - g:2 - g + w + 2]
    out_ref[0] = acc.astype(out_ref.dtype)


def _dgrad(dzq: jnp.ndarray, e: jnp.ndarray, xp_shape,
           out_dtype) -> jnp.ndarray:
    """dzq: phase-major cotangent (N, h, w, 4F) -> dxp (N, h+2, w+2, C).
    dzq arrives in MXU precision (bf16 in both modes — see _vjp_bwd);
    out_dtype follows xp (f32 in the mixed f32 mode)."""
    n, hp, wp, c = xp_shape
    h, w = hp - 2, wp - 2
    f = e.shape[-1] // 4
    e = _mx(e)
    # dxp has h+2 rows; produce ceil((h+2)/TD)*TD rows tiled by TD and let
    # the caller slice. dacc needs phase rows -2..rows_out-1 relative to
    # its 0..h-1 domain -> zero-pad dzq by 2 rows top, rows_out-h bottom,
    # 2 cols each side (ONE cheap XLA pad; keeps every tile's window
    # in-bounds).
    td = _tiles(dzq.dtype.itemsize)[1]
    rows_out = -(-(h + 2) // td) * td
    dzp = jnp.pad(dzq, ((0, 0), (2, rows_out - h), (2, 2), (0, 0)))
    grid = (n, rows_out // td)
    kern = functools.partial(_dgrad_kernel, td=td, w=w, c=c, f=f)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, td, w + 4, 4 * f),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, w + 4, 4 * f),
                         lambda b, i: (b, (i + 1) * (td // 2), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, 4 * f), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, td, w + 2, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows_out, w + 2, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * rows_out * (w + 2) * 9 * c * 4 * f,
            bytes_accessed=(dzp.size + e.size + n * rows_out * (w + 2) * c)
            * dzq.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(dzp, dzp, e)
    return out[:, :h + 2]


# -- backward: effective-kernel gradient --------------------------------------


def _wgrad_kernel(xm_ref, xh_ref, dz_ref, out_ref, acc_ref, *, tw, w, c, f):
    b, i = pl.program_id(0), pl.program_id(1)
    first = jnp.logical_and(b == 0, i == 0)
    last = jnp.logical_and(b == pl.num_programs(0) - 1,
                           i == pl.num_programs(1) - 1)

    @pl.when(first)
    def _():
        acc_ref[...] = jnp.zeros((9, c, 4 * f), jnp.float32)

    xt = _mx(jnp.concatenate([xm_ref[0], xh_ref[0]], axis=0))  # (tw+2,w+2,C)
    dac = dz_ref[0].reshape(tw * w, 4 * f)  # phase-major (tw, w, 4F) tile
    for d in range(3):
        for g in range(3):
            xs = xt[d:d + tw, g:g + w, :].reshape(tw * w, c)
            acc_ref[3 * d + g] += jax.lax.dot_general(
                xs, dac, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(last)
    def _():
        out_ref[...] = acc_ref[...].reshape(3, 3, c, 4 * f).astype(
            out_ref.dtype)


def _wgrad(xp: jnp.ndarray, dzq: jnp.ndarray) -> jnp.ndarray:
    """xp (N,h+2,w+2,C), dzq phase-major (N,h,w,4F) -> de (3,3,C,4F)."""
    n, hp, wp, c = xp.shape
    h, w = hp - 2, wp - 2
    f = dzq.shape[-1] // 4
    tw = _tiles(xp.dtype.itemsize)[2]
    grid = (n, h // tw)
    kern = functools.partial(_wgrad_kernel, tw=tw, w=w, c=c, f=f)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tw, w + 2, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, w + 2, c),
                         lambda b, i: (b, (i + 1) * (tw // 2), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw, w, 4 * f), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, c, 4 * f), lambda b, i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 3, c, 4 * f), xp.dtype),
        scratch_shapes=[pltpu.VMEM((9, c, 4 * f), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * c * 4 * f,
            bytes_accessed=(xp.size + dzq.size + 9 * c * 4 * f)
            * xp.dtype.itemsize,
            transcendentals=0),
        interpret=_interpret(),
    )(xp, xp, dzq)


# -- custom_vjp wrapper --------------------------------------------------------


@jax.custom_vjp
def up2_conv3x3_pallas(xp: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """Fused seam on the edge-padded LR input: xp (N,h+2,w+2,C),
    e (3,3,C,4F) -> interleaved HR (N,2h,2w,F)."""
    return _fwd(xp, e)


def _vjp_fwd(xp, e):
    return _fwd(xp, e), (xp, e)


def _vjp_bwd(res, dz):
    xp, e = res
    n, hh, ww, f = dz.shape
    # HR -> phase-major ONCE; both kernels then stream natural-layout
    # (.., w, 4F) slabs.  dz goes to MXU precision (bf16) here — in the
    # mixed f32 mode this halves the backward kernels' input DMA.  The
    # transform IS the packed space-to-depth permutation (same
    # (row-parity, col-parity, c) channel order), and XLA's emission of
    # it ran 2.4x over roofline in the r5 wave-11 trace (reshape.14476 +
    # copy_bitcast 0.32 ms/iter for a 134 MB round trip at the flagship),
    # so inside its envelope it goes through the one-pass Pallas pack
    # kernel (ops/pallas_s2d, cast fused); dispatch.seam_dz selects.
    from dip_tpu.ops import dispatch as _dispatch

    sdz = _dispatch.seam_dz()
    if sdz in ("pallas", "auto"):
        from dip_tpu.ops import pallas_s2d

        if not pallas_s2d.pack_ok(n, hh, ww, f):
            sdz = "xla"
    if sdz in ("pallas", "auto"):
        from dip_tpu.ops import pallas_s2d

        dzq = pallas_s2d.s2d_pack(dz, jnp.bfloat16)
    else:
        dzq = dz.astype(jnp.bfloat16).reshape(n, hh // 2, 2, ww // 2, 2, f)
        dzq = dzq.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, hh // 2, ww // 2, 4 * f)
    dxp = _dgrad(dzq, e, xp.shape, xp.dtype)
    de = _wgrad(xp, dzq).astype(e.dtype)
    return dxp, de


up2_conv3x3_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@jax.custom_vjp
def up2_conv3x3_pallas_carry(xp: jnp.ndarray, e: jnp.ndarray,
                             carry: jnp.ndarray) -> jnp.ndarray:
    """Fused seam + carry-in: returns up2_conv3x3_pallas(xp, e) + carry
    with the add in the kernel epilogue (VMEM), so the XLA full-HR add of
    the decoder's skip-branch result never runs as a separate pass.
    carry must match the output shape/dtype (N, 2h, 2w, F)."""
    return _fwd(xp, e, carry)


def _vjp_fwd_carry(xp, e, carry):
    return _fwd(xp, e, carry), (xp, e)


def _vjp_bwd_carry(res, dz):
    dxp, de = _vjp_bwd(res, dz)
    return dxp, de, dz  # d(carry) = identity


up2_conv3x3_pallas_carry.defvjp(_vjp_fwd_carry, _vjp_bwd_carry)
