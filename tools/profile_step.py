"""Ablation profile of the 512^2 flagship fit step.

Times scanned-chunk variants of the denoising step to attribute the iteration
budget: full step, no-metrics, no-jitter/EMA, forward-only, forward+grad,
upsample modes, and bf16 compute. Ablation timing is the robust way to
profile through the tunneled backend (trace files need TensorBoard; sporadic
RPC stalls corrupt single measurements — every number is best-of-3).

    python tools/profile_step.py [--size 512] [--iters 50]

Appends a JSON line per variant to results/profile.jsonl.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

OUTDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "results")


def _target(size):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    clean = np.stack([np.sin(xx / 23) * 0.5 + 0.5,
                      np.cos(yy / 17) * 0.5 + 0.5,
                      (xx + yy) / (2 * size)], axis=-1)
    return np.clip(clean + rng.normal(scale=0.1, size=clean.shape), 0, 1)


def time_variant(name, size, iters, *, upsample="bilinear", metrics=True,
                 jitter=True, ema=True, compute_dtype=None, grad=True,
                 optimizer="adam", pad="reflection", skip_ch=4,
                 fold_bn=False, rng_impl=None, unroll=1, dots=None,
                 pack=None, upc=None, s2dwide=None, dvjp=None, s2df32=None,
                 bnm=None, upci=None, s2dpk=None, thin=None, seamdz=None,
                 seamcr=None):
    import jax
    import jax.numpy as jnp

    from dip_tpu.fit.engine import Engine, FitConfig, default_metrics
    from dip_tpu.models import Skip
    from dip_tpu.ops.losses import mse
    from dip_tpu.utils.noise import get_noise

    target = jnp.asarray(_target(size)[None])
    model = Skip(num_channels_down=[128] * 5, num_channels_up=[128] * 5,
                 num_channels_skip=[skip_ch] * 5, upsample_mode=upsample,
                 pad=pad, fold_bn=fold_bn)
    # dots: None = auto (the product default: bf16 only), True/False force —
    # threaded through FitConfig.conv_impl so each variant's fresh Engine
    # traces with its own lowering (env mutation would be stale in-process)
    conv_impl = {None: "auto", True: "dots", False: "conv"}[dots]
    cfg = FitConfig(num_iter=iters, lr=0.01, optimizer=optimizer,
                    reg_noise_std=(1.0 / 30 if jitter else 0.0),
                    exp_weight=(0.99 if ema else None),
                    compute_dtype=compute_dtype, log_every=iters,
                    rng_impl=rng_impl, scan_unroll=unroll,
                    pack_small_threshold=pack, conv_impl=conv_impl,
                    up_conv=upc, conv_s2d_wide=s2dwide, dots_vjp=dvjp,
                    s2d_f32=s2df32, bn_moments=bnm, up_conv_impl=upci,
                    s2d_packed=s2dpk, thin_conv=thin, seam_dz=seamdz,
                    seam_carry=seamcr)
    eng = Engine(model, lambda p, o, a: mse(o, a), cfg,
                 default_metrics(target) if metrics else None)
    z = get_noise(jax.random.key(1), 32, "noise", (size, size))
    state = eng.init_state(jax.random.key(0), z)

    if grad:
        def chunk_fn(s):
            return eng.run_chunk(s, target, iters)
    else:
        # forward-only scan: same shapes/rng traffic, no backward
        def chunk_fn(s):
            def body(c, _):
                key, k_jit, k_gen = jax.random.split(c.key, 3)
                zu = c.z + cfg.reg_noise_std * jax.random.normal(
                    k_jit, c.z.shape, c.z.dtype)
                out = eng._forward(c.params, zu, k_gen, None)
                return c._replace(key=key), jnp.mean(out)
            return jax.lax.scan(body, s, None, length=iters)

    chunk = jax.jit(chunk_fn)
    t0 = time.perf_counter()
    state2, _ = chunk(state)  # compile + warm
    jax.block_until_ready(jax.tree_util.tree_leaves(state2)[0])
    compile_s = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chunk(state)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        dt = min(dt, time.perf_counter() - t0)
    ips = iters / dt
    rec = {"variant": name, "size": size, "iters": iters,
           "it_per_s": round(ips, 2), "ms_per_iter": round(1000 * dt / iters, 2),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    os.makedirs(OUTDIR, exist_ok=True)
    with open(os.path.join(OUTDIR, "profile.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


VARIANTS = {
    "full": {},
    "no_metrics": {"metrics": False},
    "no_jitter_no_ema": {"jitter": False, "ema": False},
    "fwd_grad_only": {"metrics": False, "jitter": False, "ema": False},
    "fwd_only": {"grad": False, "metrics": False, "ema": False},
    "nearest_up": {"upsample": "nearest"},
    "bf16_full": {"compute_dtype": "bfloat16"},
    "bf16_nearest": {"compute_dtype": "bfloat16", "upsample": "nearest"},
    # copy-attribution ablations (trace shows layout copies ~48% of step)
    "zero_pad": {"pad": "zero"},
    "skip0": {"skip_ch": 0},
    "zero_pad_skip0": {"pad": "zero", "skip_ch": 0},
    "sgd": {"optimizer": "sgd"},
    "bf16_zero_pad": {"compute_dtype": "bfloat16", "pad": "zero"},
    "bf16_zero_pad_skip0": {"compute_dtype": "bfloat16", "pad": "zero",
                            "skip_ch": 0},
    # round-2b experiments: BN->conv fold, TPU-fast RBG PRNG, scan unroll
    "bf16_foldbn": {"compute_dtype": "bfloat16", "fold_bn": True},
    "bf16_rbg": {"compute_dtype": "bfloat16", "rng_impl": "rbg"},
    "bf16_unroll2": {"compute_dtype": "bfloat16", "unroll": 2},
    "bf16_fold_rbg": {"compute_dtype": "bfloat16", "fold_bn": True,
                      "rng_impl": "rbg"},
    "bf16_fold_rbg_unroll2": {"compute_dtype": "bfloat16", "fold_bn": True,
                              "rng_impl": "rbg", "unroll": 2},
    "foldbn": {"fold_bn": True},
    "rbg": {"rng_impl": "rbg"},
    # conv-as-shifted-matmuls (ops/dot_conv.py): no conv-op layout copies
    "bf16_dots": {"compute_dtype": "bfloat16", "fold_bn": True,
                  "rng_impl": "rbg", "dots": True},
    "dots": {"fold_bn": True, "rng_impl": "rbg", "dots": True},
    # current defaults, for a like-for-like baseline row
    "bf16_defaults": {"compute_dtype": "bfloat16", "fold_bn": True,
                      "rng_impl": "rbg", "dots": False},
    # auto dispatch (product default): dots for bf16 compute
    "bf16_auto": {"compute_dtype": "bfloat16", "fold_bn": True,
                  "rng_impl": "rbg"},
    # auto dispatch, f32 product default
    "f32_auto": {"fold_bn": True, "rng_impl": "rbg"},
    # pack small optimizer leaves into one fused update (fit/packed.py)
    "bf16_pack": {"compute_dtype": "bfloat16", "fold_bn": True,
                  "rng_impl": "rbg", "pack": 1 << 15},
    # fused upsample2x->conv3x3 decoder seam (ops/up_conv.py)
    "bf16_upconv_off": {"compute_dtype": "bfloat16", "fold_bn": True,
                        "rng_impl": "rbg", "upc": "off"},
    "bf16_upconv_on": {"compute_dtype": "bfloat16", "fold_bn": True,
                       "rng_impl": "rbg", "upc": "on"},
    # f32: conv ops everywhere except the fused seam (which is dots-based)
    "f32_upconv_on": {"fold_bn": True, "rng_impl": "rbg", "upc": "on"},
    "f32_upconv_off": {"fold_bn": True, "rng_impl": "rbg", "upc": "off"},
    # space-to-depth for ALL stride-2 convs (128-ch encoder convs too)
    "bf16_s2dwide": {"compute_dtype": "bfloat16", "fold_bn": True,
                     "rng_impl": "rbg", "s2dwide": True},
    # hand-written dgrad-as-conv VJP for stride-1 dots convs
    "bf16_dotsvjp": {"compute_dtype": "bfloat16", "fold_bn": True,
                     "rng_impl": "rbg", "dvjp": True},
    "bf16_s2dw_dvjp": {"compute_dtype": "bfloat16", "fold_bn": True,
                       "rng_impl": "rbg", "s2dwide": True, "dvjp": True},
    # f32: space-to-depth for just the input conv, conv ops elsewhere
    "f32_s2d": {"fold_bn": True, "rng_impl": "rbg", "s2df32": True},
    # single-read fused sum/sumsq BN statistics (DIP_BN_MOMENTS='sumsq')
    "bf16_bnsumsq": {"compute_dtype": "bfloat16", "fold_bn": True,
                     "rng_impl": "rbg", "bnm": "sumsq"},
    "f32_bnsumsq": {"fold_bn": True, "rng_impl": "rbg", "bnm": "sumsq"},
    # wave-6 combined winners (each measured a win alone in the r4 sweep)
    "bf16_w6": {"compute_dtype": "bfloat16", "fold_bn": True,
                "rng_impl": "rbg", "s2dwide": True, "bnm": "sumsq"},
    "f32_bnsumsq_upc": {"fold_bn": True, "rng_impl": "rbg", "bnm": "sumsq",
                        "upc": "on"},
    # wave-7 candidates on top of the shipped w6 defaults (s2dwide+sumsq
    # are now the process defaults, so plain pack/unroll rows measure the
    # lever ON TOP of them; the round-2b rows predate the dots lowering)
    "f32_pack": {"fold_bn": True, "rng_impl": "rbg", "pack": 1 << 15},
    "f32_unroll2": {"fold_bn": True, "rng_impl": "rbg", "unroll": 2},
    # nearest upsampling needs NO boundary corrections: isolates their cost
    "bf16_near_upc_on": {"compute_dtype": "bfloat16", "fold_bn": True,
                         "rng_impl": "rbg", "upsample": "nearest",
                         "upc": "on"},
    # wave-7a: fused seam as ONE conv op (tap accumulation on-chip) — the
    # r4 trace showed the 9-tap HBM accumulator costing ~1.7 ms/iter bf16
    "bf16_upcc": {"compute_dtype": "bfloat16", "fold_bn": True,
                  "rng_impl": "rbg", "upci": "conv"},
    # f32 has no fused seam by default (dots taps were a wash); the
    # conv-impl seam is a different trade — measure it forced on
    "f32_upcc": {"fold_bn": True, "rng_impl": "rbg", "upc": "on",
                 "upci": "conv"},
    # wave-8a: seam taps materialized once (im2col) + ONE dot — trades 9
    # 4F-accumulator HBM round-trips for one 9C column tensor (~2.6x less
    # traffic at the top seam) while keeping dot_general layouts
    "bf16_upci": {"compute_dtype": "bfloat16", "fold_bn": True,
                  "rng_impl": "rbg", "upci": "im2col"},
    "f32_upci": {"fold_bn": True, "rng_impl": "rbg", "upc": "on",
                 "upci": "im2col"},
    # wave-8b: Pallas seam kernel — VMEM tap accumulation + in-kernel
    # phase->HR interleave, custom_vjp with Pallas dgrad/wgrad
    "bf16_upcp": {"compute_dtype": "bfloat16", "fold_bn": True,
                  "rng_impl": "rbg", "upci": "pallas"},
    "f32_upcp": {"fold_bn": True, "rng_impl": "rbg", "upc": "on",
                 "upci": "pallas"},
    "bf16_near_upc_off": {"compute_dtype": "bfloat16", "fold_bn": True,
                          "rng_impl": "rbg", "upsample": "nearest",
                          "upc": "off"},
    # round-5: packed s2d for the thin-channel z input conv — one 4-D s2d
    # transpose + 4 full-lane tap dots instead of 9 narrow 6-D-view slices
    # (the r5 trace showed ~0.4 ms/iter of layout copies in that chain)
    "bf16_s2dpk": {"compute_dtype": "bfloat16", "fold_bn": True,
                   "rng_impl": "rbg", "s2dpk": "xla"},
    "f32_s2dpk": {"fold_bn": True, "rng_impl": "rbg", "bnm": "sumsq",
                  "s2df32": True, "s2dpk": "xla"},
    # round-5: same packed consumer, pack produced by the one-pass Pallas
    # kernel (ops/pallas_s2d) — one HBM round trip instead of XLA's three
    "bf16_s2dpp": {"compute_dtype": "bfloat16", "fold_bn": True,
                   "rng_impl": "rbg", "s2dpk": "pallas"},
    "f32_s2dpp": {"fold_bn": True, "rng_impl": "rbg", "s2dpk": "pallas"},
    # wave 11: thin-channel (C=4 skip branch) stride-1 3x3 conv emission —
    # one XLA conv op / one im2col dot instead of 9 HBM-accumulated taps
    "bf16_thinconv": {"compute_dtype": "bfloat16", "fold_bn": True,
                      "rng_impl": "rbg", "thin": "conv"},
    "bf16_thinim2col": {"compute_dtype": "bfloat16", "fold_bn": True,
                        "rng_impl": "rbg", "thin": "im2col"},
    "f32_thinconv": {"fold_bn": True, "rng_impl": "rbg", "thin": "conv"},
    "f32_thinim2col": {"fold_bn": True, "rng_impl": "rbg",
                       "thin": "im2col"},
    # wave 12a: seam backward dz transform through the one-pass Pallas
    # pack kernel (bit-exact data movement; XLA chain ran 2.4x roofline)
    "bf16_seamdz": {"compute_dtype": "bfloat16", "fold_bn": True,
                    "rng_impl": "rbg", "seamdz": "pallas"},
    "f32_seamdz": {"fold_bn": True, "rng_impl": "rbg", "seamdz": "pallas"},
    # wave 12b: skip-branch result folded into the seam kernel's epilogue
    # add (carry-in operand; halves the fwd row tile for VMEM)
    "bf16_seamcr": {"compute_dtype": "bfloat16", "fold_bn": True,
                    "rng_impl": "rbg", "seamcr": True},
    "f32_seamcr": {"fold_bn": True, "rng_impl": "rbg", "seamcr": True},
    # both wave-12 levers together
    "bf16_w12": {"compute_dtype": "bfloat16", "fold_bn": True,
                 "rng_impl": "rbg", "seamdz": "pallas", "seamcr": True},
    "f32_w12": {"fold_bn": True, "rng_impl": "rbg", "seamdz": "pallas",
                "seamcr": True},
    # round-5: f32 on the FULL dots lowering, re-measured under everything
    # that landed since the round-2 rejection (sumsq moments, s2d-wide,
    # border-fix, and — via auto dispatch on the dots lowering — the
    # mixed-precision Pallas seam). On TPU, f32 dot_generals run DEFAULT
    # precision (single bf16 pass, f32 acc) just like the conv ops, so
    # this trades the conv emitter's layout copies (9.9 ms/iter of the
    # 22.2 ms f32 step, r5 trace) for dots-form matmuls.
    "f32_dotsfull": {"fold_bn": True, "rng_impl": "rbg", "dots": True},
    # round-5: attribute the LBFGS recipe's 0.98 it/s (VERDICT r4 weak 3) —
    # scanned optax.lbfgs step (zoom linesearch re-evals inside) vs the Adam
    # step under the same f32 defaults; compile_s answers the
    # recompile-per-chunk hypothesis
    "f32_lbfgs": {"fold_bn": True, "rng_impl": "rbg", "bnm": "sumsq",
                  "optimizer": "lbfgs"},
}


def main(argv=None):
    from dip_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--only", default=None)
    args = p.parse_args(argv)
    names = args.only.split(",") if args.only else list(VARIANTS)
    for name in names:
        time_variant(name, args.size, args.iters, **VARIANTS[name])


if __name__ == "__main__":
    main()
