"""Trace-time dispatch flags for the conv/resample lowering choices.

The hot-path lowering decisions (conv-as-dots vs XLA convolution ops,
space-to-depth for the stride-2 input conv, the f32-dots bf16-multiply
experiment, Pallas wgrad kernels, shifted-adds bilinear upsampling) used to
be read straight from `os.environ` inside jitted model code.  That is a
trap: the env is consulted at TRACE time, so mutating it after a program is
compiled and cached silently has no effect in-process (stale dispatch).

This module makes the state explicit:

 - flags initialize from the same `DIP_*` env vars ONCE at import (so the
   documented `DIP_CONV_DOTS=1 python ...` workflow still works);
 - `set_flags()` / `override()` mutate them explicitly, for tools and tests
   that compare variants in one process (each variant must build a fresh
   jitted callable — a cached executable is never retraced);
 - `FitConfig.conv_impl` threads the product-facing choice through the
   Engine: it is applied (trace-time) around every model trace the Engine
   performs, so an Engine's compiled programs always reflect its own config
   regardless of global flag churn in between.

Flag reference (env var -> flag, default):

 - DIP_CONV_DOTS    -> conv_impl: 'auto' (dots for bf16, conv ops for f32 —
                       the measured-best split, docs/PERF.md), '1'/'dots',
                       '0'/'conv'.
 - DIP_CONV_S2D     -> conv_s2d: space-to-depth stride-2 thin-channel conv,
                       on unless '0'.
 - DIP_CONV_S2D_WIDE -> conv_s2d_wide: extends space-to-depth to ALL
                       stride-2 convs (not just thin-channel inputs): the
                       encoder's 128-ch stride-2 convs trade 9 strided tap
                       slices for one s2d rearrange + unit slices at 4x
                       lane width. Default ON since the r4 wave-5 sweep
                       (82.58 vs 80.64 it/s bf16 @512^2, and 84.52 combined
                       with bn_moments='sumsq'); '0' disables. Only
                       consulted on the dots lowering path (bf16), so the
                       f32 conv-op path is unaffected.
 - DIP_DOTS_F32_BF16MUL -> dots_f32_bf16mul: bf16-multiply f32-accumulate
                       taps for f32 dots ('1' only; measured slower than
                       the f32 conv-op path, kept as an experiment).
 - DIP_S2D_F32      -> s2d_f32: '1' routes thin-channel stride-2 convs
                       through the space-to-depth dots form even on the
                       f32 conv-op path (the one dots rewrite VERDICT r2
                       flagged as untried for f32). Perf experiment
                       (tools/profile_step.py 'f32_s2d').
 - DIP_DOTS_VJP     -> dots_vjp: '1' installs the hand-written VJP for
                       stride-1 dots convs (dot_conv._conv2d_dots_cv):
                       data-grad as ONE flipped-kernel dots conv of dy
                       instead of k^2 scatter-pad chains. Perf experiment
                       (tools/profile_step.py 'bf16_dotsvjp').
 - DIP_DOTS_ACC_F32 -> dots_acc_f32: f32 cross-tap accumulation for bf16
                       dots ('1' only; measured 13.9 -> 17.7 ms/step bf16
                       @512^2 — the f32 tap intermediates double the
                       HBM-bound tap-sum traffic — so bf16 tap sums stay
                       the default; quality parity validated on the
                       real-image recipes).
 - DIP_PALLAS_WGRAD -> pallas_wgrad: '0' (default) | '1'/'all' | '1x1' |
                       '3x3' (measured slower end-to-end, ops/pallas_wgrad).
 - DIP_UP_SHIFTS    -> up_shifts: shifted-adds bilinear upsample ('1' only;
                       measured slower than the banded-matmul resize).
 - DIP_UP_CONV      -> up_conv: fused upsample2x->conv3x3 decoder seam
                       (ops/up_conv.py). 'auto' (default: ON for both trace
                       dtypes since the r4 wave-7 sweep — as 9 tap matmuls
                       on the bf16 dots lowering, as ONE conv op on the f32
                       conv-op lowering), '1'/'on', '0'/'off'.
 - DIP_UP_CONV_IMPL -> up_conv_impl: how the fused seam's 36 LR taps are
                       emitted. 'dots' (9 shifted-tap matmuls summed in
                       HBM — each tap re-reads/re-writes the full 4F
                       accumulator, ~144 MB/tap at the top seam) |
                       'conv' (ONE lax.conv_general_dilated with the
                       (3,3,C,4F) effective kernel: tap accumulation stays
                       in VMEM/registers, HBM traffic drops to one input
                       read + one output write) | 'im2col' (materialize
                       the 9 taps once along channels, ONE [NHW,9C]@[9C,4F]
                       dot — less traffic than 9 accumulator round-trips,
                       natural dot layouts) | 'pallas' (VMEM-resident tap
                       accumulation + in-kernel phase->HR interleave,
                       ops/pallas_up_conv.py; falls back to dots outside
                       the kernel's shape envelope). 'auto' (default)
                       follows the conv lowering for the trace dtype:
                       'dots' on the bf16 dots path, 'im2col' on the f32
                       conv-op path — the measured-best split of the r4
                       wave-7/8 sweeps (bf16: 85.3-85.9 dots ~= 85.6
                       im2col > 80.0 conv; f32: 43.7 im2col > 42.8-42.9
                       conv > 40.3 seam-off > 39.5 dots, it/s @512^2,
                       results/profile.jsonl).
 - DIP_BN_MOMENTS   -> bn_moments: 'sumsq' (default since the r4 wave-6
                       sweep: single-read sum/sum-of-squares einsums with
                       f32 accumulation, var = E[x^2]-E[x]^2; XLA fuses
                       both reduces into one pass over x — 81.87 vs 80.64
                       it/s bf16 and 40.05 vs 35.85 it/s f32 @512^2) |
                       'twopass' (jnp.mean + jnp.var — the variance pass
                       re-reads x after the mean is known).
"""

from __future__ import annotations

import contextlib
import os

_VALID_CONV_IMPL = ("auto", "dots", "conv")


def _conv_impl_from_env() -> str:
    v = os.environ.get("DIP_CONV_DOTS", "")
    return {"1": "dots", "0": "conv"}.get(v, "auto")


_flags = {
    "conv_impl": _conv_impl_from_env(),
    "conv_s2d": os.environ.get("DIP_CONV_S2D", "") != "0",
    "conv_s2d_wide": os.environ.get("DIP_CONV_S2D_WIDE", "") != "0",
    "dots_f32_bf16mul": os.environ.get("DIP_DOTS_F32_BF16MUL", "") == "1",
    "dots_acc_f32": os.environ.get("DIP_DOTS_ACC_F32", "") == "1",
    "dots_vjp": os.environ.get("DIP_DOTS_VJP", "") == "1",
    "s2d_f32": os.environ.get("DIP_S2D_F32", "") == "1",
    "s2d_packed": {"1": "xla", "xla": "xla", "pallas": "pallas",
                   "auto": "auto"}.get(
        os.environ.get("DIP_S2D_PACKED", ""), "off"),
    "thin_conv": {"dots": "dots", "im2col": "im2col", "conv": "conv",
                  "auto": "auto"}.get(
        os.environ.get("DIP_THIN_CONV", ""), "auto"),
    "seam_dz": {"xla": "xla", "pallas": "pallas", "auto": "auto"}.get(
        os.environ.get("DIP_SEAM_DZ", ""), "xla"),
    "seam_carry": os.environ.get("DIP_SEAM_CARRY", "") == "1",
    "pallas_wgrad": os.environ.get("DIP_PALLAS_WGRAD", "0"),
    "up_shifts": os.environ.get("DIP_UP_SHIFTS", "") == "1",
    "up_conv": {"1": "on", "on": "on", "0": "off", "off": "off"}.get(
        os.environ.get("DIP_UP_CONV", ""), "auto"),
    "bn_moments": ("twopass"
                   if os.environ.get("DIP_BN_MOMENTS", "") == "twopass"
                   else "sumsq"),
    "up_conv_impl": {"conv": "conv", "dots": "dots", "im2col": "im2col",
                     "pallas": "pallas"}.get(
        os.environ.get("DIP_UP_CONV_IMPL", ""), "auto"),
}


def flags() -> dict:
    """Snapshot of the current dispatch flags."""
    return dict(_flags)


def set_flags(**kwargs) -> dict:
    """Set dispatch flags; returns the PREVIOUS values of the changed keys.

    Takes effect at the next trace — already-compiled programs keep the
    lowering they were traced with.
    """
    prev = {}
    for k, v in kwargs.items():
        if v is None:
            continue
        if k not in _flags:
            raise KeyError(f"unknown dispatch flag {k!r}")
        if k == "conv_impl" and v not in _VALID_CONV_IMPL:
            raise ValueError(f"conv_impl must be one of {_VALID_CONV_IMPL}")
        if k == "up_conv" and v not in ("auto", "on", "off"):
            raise ValueError("up_conv must be 'auto', 'on' or 'off'")
        if k == "bn_moments" and v not in ("twopass", "sumsq"):
            raise ValueError("bn_moments must be 'twopass' or 'sumsq'")
        if k == "up_conv_impl" and v not in ("auto", "dots", "conv",
                                             "im2col", "pallas"):
            raise ValueError("up_conv_impl must be 'auto', 'dots', 'conv', "
                             "'im2col' or 'pallas'")
        if k == "thin_conv" and v not in ("auto", "dots", "conv", "im2col"):
            raise ValueError(
                "thin_conv must be 'auto', 'dots', 'conv' or 'im2col'")
        if k == "seam_dz" and v not in ("auto", "xla", "pallas"):
            raise ValueError("seam_dz must be 'auto', 'xla' or 'pallas'")
        prev[k] = _flags[k]
        _flags[k] = v
    return prev


@contextlib.contextmanager
def override(**kwargs):
    """Temporarily set flags (the Engine wraps each model trace in this)."""
    prev = set_flags(**kwargs)
    try:
        yield
    finally:
        _flags.update(prev)


def conv_impl() -> str:
    return _flags["conv_impl"]


def conv_s2d() -> bool:
    return _flags["conv_s2d"]


def conv_s2d_wide() -> bool:
    return _flags["conv_s2d_wide"]


def dots_f32_bf16mul() -> bool:
    return _flags["dots_f32_bf16mul"]


def dots_acc_f32() -> bool:
    return _flags["dots_acc_f32"]


def dots_vjp() -> bool:
    return _flags["dots_vjp"]


def s2d_f32() -> bool:
    return _flags["s2d_f32"]


def s2d_packed() -> str:
    """Packed space-to-depth stride-2 conv (dot_conv._conv_s2d): materialize
    s2d ONCE as a 4-D (N, H/2, W/2, 4C) tensor and contract with a
    (2, 2, 4C, F) remapped kernel in ceil(k/2)^2 full-lane-width tap dots —
    instead of k^2 narrow slices of a 6-D view, whose layout copies cost
    ~0.4 ms/iter bf16 at 512^2 on the 32-ch z input conv (r5 trace).

    'off'    = the 6-D-view tap path;
    'xla'    = pack via one XLA transpose (measured WORSE: 10.80 vs 10.60
               ms/iter bf16 @512^2 — the transpose costs more than the
               narrow slices it replaces);
    'pallas' = pack via the one-pass Pallas kernel (ops/pallas_s2d);
    'auto'   = 'pallas' inside pallas_s2d.pack_ok, else the 6-D path.
    DIP_S2D_PACKED / FitConfig.s2d_packed."""
    return _flags["s2d_packed"]


def seam_dz() -> str:
    """Emission of the Pallas seam backward's HR -> phase-major dz
    transform (pallas_up_conv._vjp_bwd): 'xla' (reshape/transpose chain)
    | 'pallas' / 'auto' (the one-pass ops/pallas_s2d pack kernel with a
    fused bf16 cast, falling back to 'xla' outside pack_ok).  Bit-exact
    either way — pure data movement.  DIP_SEAM_DZ / FitConfig.seam_dz."""
    return _flags["seam_dz"]


def seam_carry() -> bool:
    """Fold the decoder's accumulated non-seam conv parts (the skip
    branch) into the Pallas seam kernel's epilogue add (blocks.Conv ->
    up_conv.up2_conv3x3(carry=...)) instead of a separate full-HR XLA
    add.  DIP_SEAM_CARRY / FitConfig.seam_carry."""
    return _flags["seam_carry"]


def thin_conv() -> str:
    """Emission for thin-channel (C<=16) stride-1 3x3 convs on the dots
    lowering — the decoder's HR skip-branch convs (C=4), whose 9-tap dots
    form re-reads/re-writes the full F-wide HBM accumulator per tap
    (~1.0 ms/iter at the flagship top scale, r5 wave-10 trace).

    'dots'   = the generic tap-dot form;
    'conv'   = ONE XLA convolution op (on-chip im2col/accumulation);
    'im2col' = one narrow (N,Ho,Wo,9C) column tensor + ONE dot;
    'auto'   = the measured policy in dot_conv._conv2d_dots_impl.
    DIP_THIN_CONV / FitConfig.thin_conv."""
    return _flags["thin_conv"]


def pallas_wgrad_mode() -> str:
    return _flags["pallas_wgrad"]


def up_shifts() -> bool:
    return _flags["up_shifts"]


def bn_moments() -> str:
    return _flags["bn_moments"]


def _dots_lowering(dtype) -> bool:
    """Whether the dots conv lowering is active for this trace dtype.

    'auto' = dots for BOTH dtypes since wave 10 (round 5): f32 re-measured
    on the full dots lowering at 20.95 ms/iter @512^2 vs 22.78 for the
    conv-op lowering (results/profile.jsonl 'f32_dotsfull' vs
    'f32_bnsumsq').  The round-2 rejection of f32 dots predated sumsq
    moments, s2d-wide, and the Pallas seam; on TPU f32 dot_generals run
    DEFAULT precision (one bf16 pass, f32 accumulation) exactly like the
    conv ops they replace, and the dots form avoids the conv emitter's
    layout copies (9.9 ms/iter of the 22.2 ms f32 step in the r5 trace)."""
    impl = _flags["conv_impl"]
    return impl == "dots" or (impl == "auto"
                              and str(dtype) in ("bfloat16", "float32"))


def dots_lowering(dtype) -> bool:
    """Public alias: whether convs lower to dots for this trace dtype
    (consulted by pallas_wgrad.conv2d_fast and the seam dispatch)."""
    return _dots_lowering(dtype)


def up_conv_impl(dtype) -> str:
    """How the fused seam emits its taps for this trace dtype. 'auto':

    - dots lowering (both dtypes since wave 10): the Pallas fused kernel
      (ops/pallas_up_conv) — VMEM-resident 9-tap accumulation +
      in-register phase interleave. bf16 measured wave 9 @512^2: 93.92
      it/s vs 85.62 'dots' (TPU parity asserted by
      tools/pallas_seam_check.py; shapes outside seam_ok fall back to
      'dots' inside up_conv.py). f32 runs the kernels MIXED (bf16 MXU
      operands, f32 accumulation — pallas_up_conv._mx), numerically
      identical on TPU to the f32 dots emission it replaces.
    - conv-op lowering (forced conv_impl='conv'): one im2col dot (43.71
      vs 42.8 'conv' vs 40.3 seam-off, two wave-8 sweeps); the Pallas
      seam loses there (24.84 vs 22.78 ms mixed, wave 10 — the
      surrounding conv-op layouts dominate)."""
    v = _flags["up_conv_impl"]
    if v != "auto":
        return v
    return "pallas" if _dots_lowering(dtype) else "im2col"


def up_conv_on(dtype) -> bool:
    """Whether the fused upsample2x->conv3x3 seam is active for this trace
    dtype. 'auto' = on for both lowerings since wave 7: the dots form wins
    on the bf16 dots path (wave 4), and the single-conv-op form wins on the
    f32 conv-op path (42.91 vs 40.3 it/s @512^2, results/profile.jsonl)."""
    v = _flags["up_conv"]
    if v == "on":
        return True
    if v == "off":
        return False
    return _dots_lowering(dtype) or str(dtype) == "float32"
