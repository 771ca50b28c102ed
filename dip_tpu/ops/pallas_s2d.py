"""Pallas TPU kernel for the packed space-to-depth input transform.

The z input conv (thin-channel stride-2, e.g. 32ch at 512^2 —
`denoising.ipynb` cell 8's input_depth=32 net input) lowers through
space-to-depth (ops/dot_conv._conv_s2d).  The r5 bf16 trace showed the
XLA emission of that transform costing ~0.42 ms/iter of pure data
movement at the flagship: the 6-D s2d reshape materializes
([1,514,514,32] -> [1,257,2,257,2,32], 0.19 ms), then two layout copies
(0.23 ms) reposition it for the tap slices — three HBM round trips of a
17 MB tensor whose roofline is one (~0.04 ms).  Expressing the pack as a
single XLA transpose to 4-D (dispatch.s2d_packed='xla') measured WORSE
(10.80 vs 10.60 ms/iter bf16 — the transpose costs more than the narrow
slices it replaces; docs/PERF.md wave 9.7).

This kernel does the pack in one pass: HBM sees one read of the padded
input and one write of the packed (N, H/2, W/2, 4C) tensor; the
row/column phase interleave happens as VMEM shuffles inside the kernel.

VERDICT (r5, measured @512^2x50 on v5e): bf16 10.60 ms/iter vs 10.80 for
the XLA-transpose pack and 10.27 for the default 6-D-view tap path; f32
21.46 vs 20.95.  The one-pass pack wins over the XLA pack but the packed
consumer still loses to the 6-D view's narrow slices (which overlap with
MXU work, while the packed form serializes an extra tensor write).
REJECTED as a default — kept as a tested opt-in (DIP_S2D_PACKED=pallas /
FitConfig.s2d_packed), exact in interpret mode and on TPU.
Channel order matches dot_conv's packed tap-dot path: (row-parity p,
col-parity q, ci), i.e. out[n, y, x, (p*2 + q)*C + ci] = x[n, 2y+p,
2x+q, ci].

The transform is a permutation, so the custom VJP is its exact inverse
(one XLA de-interleave, only traced when the input is differentiated —
z is not a trainable parameter in the flagship 'net' fits, so the
backward is DCE'd there; it exists for opt_over='input' runs).

Reference anchor: the stride-2 encoder convs of the skip net,
/root/reference/models/skip.py:64-70, consuming the noise input of
/root/reference/utils/common_utils.py:127-153.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# out-rows per grid step; Pallas masks the ragged tail block (H/2 is odd
# for the flagship's padded 514 -> 257)
_TR = 8


def _tile_rows(itemsize: int, w2: int, c: int) -> int:
    """Dtype-aware row tile: the C minor dim lane-pads to 128, so the
    in+out VMEM footprint is 2 * tr * 2 * w2 * 2 * max(c, 128) * itemsize;
    halve tr until it fits the 16 MiB scoped-VMEM budget (f32 at the
    flagship's w2=257 OOMed the full 8-row tile: 16.06 MiB > 16)."""
    tr = _TR
    while tr > 1 and 16 * tr * w2 * max(c, 128) * itemsize > 13 * 2**20:
        tr //= 2
    return tr


def pack_ok(n: int, h: int, w: int, c: int) -> bool:
    """Kernel envelope: even spatial dims and a full-lane packed width.

    4C must be a 128-lane multiple for the in-kernel (.., 2, 2, C) ->
    (.., 4C) minor fold to stay a supported Mosaic shape cast; narrower
    inputs fall back to the 6-D-view path in dot_conv."""
    return h % 2 == 0 and w % 2 == 0 and (4 * c) % 128 == 0 and h >= 2 * _TR


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _pack_kernel(x_ref, out_ref, *, tr, w2, c):
    # x block: (1, tr, 2, w2, 2, C) — a free 6-D view of (2*tr, W, C) rows.
    # Pure dimension transpose (tr, 2, w2, 2, C) -> (tr, w2, 2, 2, C);
    # the caller's 5-D out block merges to (.., 4C) as a free XLA view.
    # (Two rejected Mosaic lowerings: the direct (.., 2, 2, C) -> (.., 4C)
    # minor fold at C=32 fails 'infer-vector-layout: unsupported shape
    # cast'; four strided ref loads + lane concat fails 'result/input
    # offset mismatch on non-concat dimension'.)
    out_ref[0] = x_ref[0].transpose(0, 2, 1, 3, 4).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def s2d_pack(xp: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """(N, H, W, C), H/W even -> packed s2d (N, H/2, W/2, 4C) with channel
    order (row-parity, col-parity, ci).  `out_dtype` fuses a dtype cast
    into the single pass (used by the seam backward's f32 -> bf16 dz)."""
    n, h, w, c = xp.shape
    h2, w2 = h // 2, w // 2
    out_dtype = xp.dtype if out_dtype is None else jnp.dtype(out_dtype)
    x6 = xp.reshape(n, h2, 2, w2, 2, c)  # pure view: no data movement
    tr = _tile_rows(max(xp.dtype.itemsize, out_dtype.itemsize), w2, c)
    grid = (n, -(-h2 // tr))
    kern = functools.partial(_pack_kernel, tr=tr, w2=w2, c=c)
    out6 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, 2, w2, 2, c), lambda b, i: (b, i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, w2, 2, 2, c),
                               lambda b, i: (b, i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, 2, 2, c), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=xp.size * (xp.dtype.itemsize
                                      + out_dtype.itemsize),
            transcendentals=0),
        interpret=_interpret(),
    )(x6)
    return out6.reshape(n, h2, w2, 4 * c)  # contiguous merge: free view


def _vjp_fwd(xp, out_dtype):
    # residual: shape + a zero-size dtype prototype (dtype objects are not
    # pytree leaves)
    return s2d_pack(xp, out_dtype), (xp.shape, jnp.zeros((0,), xp.dtype))


def _vjp_bwd(out_dtype, res, dsp):
    (n, h, w, c), proto = res
    # exact inverse of the permutation (XLA; only live for opt_input fits)
    dxp = dsp.reshape(n, h // 2, w // 2, 2, 2, c)
    dxp = dxp.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, c)
    return (dxp.astype(proto.dtype),)


s2d_pack.defvjp(_vjp_fwd, _vjp_bwd)
