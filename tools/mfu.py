"""FLOPs-per-step and MFU/roofline accounting for the flagship DIP step.

The north-star perf target (BASELINE.md: >=20x a reference-era GPU) needs a
tracked denominator: how many FLOPs one optimization step of the flagship
workload (skip-128x5 generator, 512^2, input_depth 32 — denoising.ipynb
cells 6-10, /root/reference/models/skip.py:81-91) actually performs, and
what fraction of the chip's peak that implies at the measured step time.

FLOPs come from XLA's own cost model (`compiled.cost_analysis()['flops']`)
on the exact jitted chunk program bench.py times, divided by the scan
length. That counts the program XLA runs — fwd + bwd + Adam + EMA/metrics,
after all our lowering rewrites — not a hand-derived conv formula. The CPU
and TPU backends see the same HLO math, so this runs anywhere:

    python tools/mfu.py [--size 512] [--dtype bfloat16] [--ms 12.32]

With --ms (a measured step time from results/profile.jsonl or bench.py) it
prints achieved TFLOP/s and MFU vs the v5e peak. Peak: TPU v5e = 197
TFLOP/s bf16. There is no separate f32 MXU rate on v5e — XLA executes f32
convs as bf16(x3-pass) MXU work at DEFAULT precision — so f32 MFU is
reported against the same 197 denominator with that caveat (the honest
statement is "fraction of the chip", not "fraction of an f32 unit that
does not exist").

Note the step is HBM-bound, not MXU-bound (docs/PERF.md): MFU here is a
progress meter against the north star, not the binding roofline. The
bytes-side roofline is in the PERF.md trace tables.
"""

from __future__ import annotations

import argparse
import json

V5E_PEAK_BF16_TFLOPS = 197.0


def flops_per_step(size: int = 512, dtype: str | None = "bfloat16",
                   length: int = 8) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dip_tpu.fit.engine import Engine, FitConfig, default_metrics
    from dip_tpu.models import Skip
    from dip_tpu.ops.losses import mse
    from dip_tpu.utils.noise import get_noise

    rng = np.random.default_rng(0)
    target = jnp.asarray(
        np.clip(rng.normal(0.5, 0.2, (1, size, size, 3)), 0, 1),
        dtype=jnp.float32)
    model = Skip(num_channels_down=[128] * 5, num_channels_up=[128] * 5,
                 num_channels_skip=[4] * 5, upsample_mode="bilinear",
                 pad="reflection")
    cfg = FitConfig(num_iter=length, lr=0.01, reg_noise_std=1.0 / 30,
                    exp_weight=0.99, log_every=length, compute_dtype=dtype)
    eng = Engine(model, lambda p, out, aux: mse(out, aux), cfg,
                 default_metrics(target))
    z = get_noise(jax.random.key(1), 32, "noise", (size, size))
    state = eng.init_state(jax.random.key(0), z)

    def total_flops(n):
        # lower WITHOUT donation (cost analysis doesn't need to execute)
        lowered = jax.jit(lambda s: eng.run_chunk(s, target, n)).lower(state)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost["flops"])

    # XLA's cost model counts a while-loop BODY ONCE — it does not multiply
    # by the trip count (verified: length 4 and length 8 both report 593
    # GFLOP total for this program). Detect which behavior this XLA has by
    # comparing two lengths; if the totals match, the total IS the per-step
    # cost (one body + the small out-of-loop prologue). The r4 MFU table
    # originally divided by the scan length and under-reported FLOPs (and
    # MFU) by ~8x.
    t_a, t_b = total_flops(length), total_flops(2 * length)
    if abs(t_b - t_a) < 0.01 * t_a:  # body counted once
        per_step = t_a
        counting = "body_once"
    else:
        per_step = (t_b - t_a) / length  # delta isolates the body cost
        counting = "per_trip"
    return {
        "size": size,
        "dtype": dtype or "float32",
        "scan_length": length,
        "cost_model_counting": counting,
        "flops_per_step": per_step,
        "gflops_per_step": round(per_step / 1e9, 2),
    }


def main(argv=None):
    from dip_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--dtype", default="bfloat16",
                   help="bfloat16 | f32 (compute dtype of the step)")
    p.add_argument("--ms", type=float, default=None,
                   help="measured step time in ms -> prints TFLOP/s + MFU")
    args = p.parse_args(argv)
    dtype = None if args.dtype in ("f32", "float32", "none") else args.dtype
    rec = flops_per_step(size=args.size, dtype=dtype)
    if args.ms:
        tflops = rec["flops_per_step"] / (args.ms * 1e-3) / 1e12
        rec["measured_ms"] = args.ms
        rec["achieved_tflops"] = round(tflops, 2)
        rec["peak_tflops_bf16"] = V5E_PEAK_BF16_TFLOPS
        rec["mfu_pct"] = round(100 * tflops / V5E_PEAK_BF16_TFLOPS, 2)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    main()
