"""Pallas TPU kernels for convolution weight gradients (the DIP hot path).

Profiling the flagship 512^2 DIP step (tools/xplane_stats.py) shows XLA's
conv weight-gradient fusions are the largest single sink after layout
copies: ~4.2 ms of the ~21 ms bf16 iteration, running at <25% MXU
efficiency because the wgrad contraction (K = H*W spatial reduction) gets
emitted with layout-change copies and, for thin input channels (the 4-ch
skip branch, the 1x1 taps), nearly idle MXU tiles.

These kernels compute

    dW[kh, kw, ci, co] = sum_{h,w} x[h+kh-1, w+kw-1, ci] * g[h, w, co]

(zero out-of-bounds x, i.e. the weight gradient of a stride-1, pad-1 3x3
conv) and the 1x1 analogue as explicit MXU contractions:

 - the grid walks row-blocks of x and g with NO halo DMA: the dh = +-1
   cross-block terms use the previous block's last x/g rows, carried in a
   persistent VMEM scratch across the (sequential on TPU) grid steps;
 - column shifts are roll+mask inside VMEM — K stays a dense TH*W;
 - accumulation is f32 in VMEM, written out once on the last step.

conv3x3_s1p1 / conv1x1 wrap the forward conv in a jax.custom_vjp whose
backward uses these kernels (data-grad stays on XLA's efficient dgrad
path). Numerics vs XLA wgrad are pinned in tests/test_pallas_wgrad.py.

MEASURED VERDICT (v5e, flagship 512^2 step, 2026-08-16): the kernels beat
XLA's standalone wgrad emission in isolation — custom-call self-times of
0.36 ms vs 0.71 ms for the 512^2 1x1x128x128, and 0.11 ms vs ~0.4 ms for
the 256^2 3x3x128x128 — but enabling them SLOWS the whole step (f32
30.0 -> 37-41 ms) because the custom_vjp boundary stops XLA from fusing
the weight gradient into the Adam update and from overlapping its DMA
inside the scanned while-loop; the apparent slowness of XLA's wgrad
fusions in traces is overlap-hidden time, not critical path. Hence
DIP_PALLAS_WGRAD defaults to '0' (off): a validated alternative, not the
product path. Set '1'/'1x1'/'3x3' to re-enable for experiments.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DN = ("NHWC", "HWIO", "NHWC")


def _mode() -> str:
    """dispatch.pallas_wgrad_mode (DIP_PALLAS_WGRAD env at import):
    '0' off | '1'/'all' both | '1x1' | '3x3'."""
    from dip_tpu.ops import dispatch

    return dispatch.pallas_wgrad_mode()


def _enabled(kind: str) -> bool:
    m = _mode()
    if m == "0" or jax.default_backend() != "tpu":
        return False
    return m in ("1", "all", kind)


def _pick_th(h: int, w: int = 0, ci: int = 0, co: int = 0,
             itemsize: int = 4) -> int | None:
    """Largest row-tile that divides H and fits the ~16MB scoped VMEM:
    double-buffered input blocks plus shifted/reshaped temporaries cost
    roughly 3x the block bytes; leave generous headroom."""
    budget = 10 * 1024 * 1024
    for th in (32, 16, 8):
        if h % th != 0:
            continue
        need = 3 * th * w * (ci + co) * itemsize + 9 * ci * co * 4
        if w == 0 or need <= budget:
            return th
    return None


# ---------------------------------------------------------------------------
# 3x3 stride-1 pad-1 weight gradient
# ---------------------------------------------------------------------------

def _wgrad3x3_kernel(x_ref, g_ref, out_ref, acc, xlast, glast):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    th = x_ref.shape[0]
    w = x_ref.shape[1]
    ci = x_ref.shape[2]
    co = g_ref.shape[2]

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        xlast[...] = jnp.zeros_like(xlast)
        glast[...] = jnp.zeros_like(glast)

    x_blk = x_ref[...]
    g_blk = g_ref[...]
    col = lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)

    def shifted(xs, b):
        """xs with columns moved so row w holds x[w + b]; OOB -> 0."""
        if b == 0:
            return xs
        rolled = pltpu.roll(xs, shift=(-b) % w, axis=1)  # roll needs >= 0
        if b == -1:
            return jnp.where(col == 0, jnp.zeros_like(rolled), rolled)
        return jnp.where(col == w - 1, jnp.zeros_like(rolled), rolled)

    def contract(xs, gs):
        k = xs.shape[0] * xs.shape[1]
        return lax.dot_general(
            xs.reshape(k, ci), gs.reshape(k, co),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # rows paired as x[h + a] * g[h]; boundary pairs use the carried rows
    for a in (-1, 0, 1):
        if a == -1:
            pairs = [(x_blk[: th - 1], g_blk[1:]),
                     (xlast[...], g_blk[:1])]
        elif a == 0:
            pairs = [(x_blk, g_blk)]
        else:
            pairs = [(x_blk[1:], g_blk[: th - 1]),
                     (x_blk[:1], glast[...])]
        for b in (-1, 0, 1):
            idx = (a + 1) * 3 + (b + 1)
            total = acc[idx]
            for xs, gs in pairs:
                total = total + contract(shifted(xs, b), gs)
            acc[idx] = total

    xlast[...] = x_blk[th - 1 :]
    glast[...] = g_blk[th - 1 :]

    @pl.when(i == n_i - 1)
    def _():
        out_ref[...] = acc[...]


def wgrad3x3_s1(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dW (3,3,Ci,Co) of a stride-1 pad-1 3x3 conv. x,g: (H,W,C) no batch."""
    h, w, ci = x.shape
    co = g.shape[2]
    th = _pick_th(h, w, ci, co, x.dtype.itemsize)
    assert th is not None
    out = pl.pallas_call(
        _wgrad3x3_kernel,
        grid=(h // th,),
        in_specs=[
            pl.BlockSpec((th, w, ci), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w, co), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, ci, co), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9, ci, co), jnp.float32),
            pltpu.VMEM((1, w, ci), x.dtype),
            pltpu.VMEM((1, w, co), g.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * h * w * ci * co,
            bytes_accessed=x.size * x.dtype.itemsize
            + g.size * g.dtype.itemsize + 9 * ci * co * 4,
            transcendentals=0,
        ),
    )(x, g)
    return out.reshape(3, 3, ci, co)


# ---------------------------------------------------------------------------
# 1x1 weight gradient (plain K-chunked GEMM over H*W)
# ---------------------------------------------------------------------------

def _wgrad1x1_kernel(x_ref, g_ref, out_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += lax.dot_general(
        x_ref[...], g_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc[...]


def wgrad1x1(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """dW (1,1,Ci,Co) of a 1x1 conv. x,g: (H,W,C) no batch."""
    h, w, ci = x.shape
    co = g.shape[2]
    k = h * w
    tk = 2048 if k % 2048 == 0 else (1024 if k % 1024 == 0 else None)
    assert tk is not None
    x2 = x.reshape(k, ci)
    g2 = g.reshape(k, co)
    out = pl.pallas_call(
        _wgrad1x1_kernel,
        grid=(k // tk,),
        in_specs=[
            pl.BlockSpec((tk, ci), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, co), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ci, co), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ci, co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ci, co), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * k * ci * co,
            bytes_accessed=x2.size * x2.dtype.itemsize
            + g2.size * g2.dtype.itemsize + ci * co * 4,
            transcendentals=0,
        ),
    )(x2, g2)
    return out.reshape(1, 1, ci, co)


# ---------------------------------------------------------------------------
# custom-VJP conv wrappers (forward + data-grad on XLA, weight-grad here)
# ---------------------------------------------------------------------------

def _can_use_3x3(x, kernel, stride):
    return (_enabled("3x3") and stride == 1 and x.shape[0] == 1
            and kernel.shape[:2] == (3, 3)
            and _pick_th(x.shape[1], x.shape[2], x.shape[3],
                         kernel.shape[3], x.dtype.itemsize) is not None
            and x.dtype in (jnp.float32, jnp.bfloat16))


def _can_use_1x1(x, kernel, stride):
    k = x.shape[1] * x.shape[2]
    return (_enabled("1x1") and stride == 1 and x.shape[0] == 1
            and kernel.shape[:2] == (1, 1)
            and (k % 2048 == 0 or k % 1024 == 0)
            and x.dtype in (jnp.float32, jnp.bfloat16))


@jax.custom_vjp
def _conv3x3_s1p1(x, kernel):
    return lax.conv_general_dilated(x, kernel, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=_DN)


def _conv3x3_fwd(x, kernel):
    return _conv3x3_s1p1(x, kernel), (x, kernel)


def _conv3x3_bwd(res, g):
    x, kernel = res
    # data grad: correlate g with the spatially-flipped, io-swapped kernel —
    # a plain stride-1 pad-1 conv, which XLA's emitter handles well
    k_rot = jnp.flip(kernel, (0, 1)).swapaxes(2, 3)
    dx = lax.conv_general_dilated(g, k_rot.astype(g.dtype), (1, 1),
                                  ((1, 1), (1, 1)), dimension_numbers=_DN)
    dw = wgrad3x3_s1(x[0], g[0]).astype(kernel.dtype)
    return dx.astype(x.dtype), dw


_conv3x3_s1p1.defvjp(_conv3x3_fwd, _conv3x3_bwd)


@jax.custom_vjp
def _conv1x1(x, kernel):
    return lax.conv_general_dilated(x, kernel, (1, 1), ((0, 0), (0, 0)),
                                    dimension_numbers=_DN)


def _conv1x1_fwd(x, kernel):
    return _conv1x1(x, kernel), (x, kernel)


def _conv1x1_bwd(res, g):
    x, kernel = res
    dx = lax.conv_general_dilated(g, kernel.swapaxes(2, 3).astype(g.dtype),
                                  (1, 1), ((0, 0), (0, 0)),
                                  dimension_numbers=_DN)
    dw = wgrad1x1(x[0], g[0]).astype(kernel.dtype)
    return dx.astype(x.dtype), dw


_conv1x1.defvjp(_conv1x1_fwd, _conv1x1_bwd)


def conv2d_fast(x: jnp.ndarray, kernel: jnp.ndarray, stride: int,
                padding) -> jnp.ndarray:
    """Dispatch a NHWC conv to the custom-wgrad path when it qualifies.

    `padding` as in lax.conv_general_dilated (pair-of-pairs or 'VALID').
    Only the stride-1 pad-1 3x3 and pad-0 1x1 forms have Pallas backward
    kernels; everything else is the plain XLA op.
    """
    # conv-as-shifted-matmuls (ops/dot_conv.py): measured 19.98 -> 15.81 ms
    # for the bf16 512^2 flagship step (+26%) by avoiding the layout copies
    # XLA inserts around convolution ops. f32 initially regressed on dots
    # (28.3 -> 39.4 ms, round 2) and stayed on conv ops through wave 9;
    # wave 10 re-measured f32 dots under everything that landed since
    # (sumsq moments, s2d-wide, the mixed-precision Pallas seam) at 20.95
    # vs 22.78 ms — 'auto' is now dots for BOTH dtypes
    # (dispatch._dots_lowering). DIP_CONV_DOTS: unset = auto, "1" =
    # always, "0" = never.
    # (Measured: restricting dots to stride-1 and keeping XLA convs for the
    # stride-2 encoder layers is SLOWER — 17.58 vs 15.81 ms — because the
    # conv ops reintroduce their layout copies; all-dots wins.)
    from dip_tpu.ops import dispatch

    if dispatch.dots_lowering(x.dtype):
        from dip_tpu.ops.dot_conv import conv2d_dots

        return conv2d_dots(x, kernel, stride, padding)
    impl = dispatch.conv_impl()
    # f32 experiment (dispatch.s2d_f32): the thin-channel stride-2 input
    # conv alone through the space-to-depth dots form, conv ops elsewhere
    if (stride == 2 and x.shape[-1] <= 64 and impl != "conv"
            and dispatch.s2d_f32()):
        from dip_tpu.ops.dot_conv import conv2d_dots

        return conv2d_dots(x, kernel, stride, padding)
    if padding == ((1, 1), (1, 1)) and _can_use_3x3(x, kernel, stride):
        return _conv3x3_s1p1(x, kernel)
    if (padding in ("VALID", ((0, 0), (0, 0)))
            and _can_use_1x1(x, kernel, stride)):
        return _conv1x1(x, kernel)
    return lax.conv_general_dilated(x, kernel, (stride, stride), padding,
                                    dimension_numbers=_DN)
