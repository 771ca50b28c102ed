#!/usr/bin/env python
"""Capture a jax.profiler device trace of the flagship 512^2 step and print
the op-level time breakdown (top-K HLO ops by self time).

Uses tensorboard_plugin_profile's xplane converters directly — no TensorBoard
UI needed. Output: a table of (op category, self time ms, % of step) that
tells us where the 37 ms f32 / 27 ms bf16 step actually goes.

Usage:
    python tools/profile_trace.py [--size 512] [--iters 30] [--dtype f32]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_chunk(size: int, iters: int, compute_dtype: str | None,
                up_conv: str | None = None):
    from dip_tpu.fit.engine import Engine, FitConfig, default_metrics
    from dip_tpu.models import Skip
    from dip_tpu.ops.losses import mse
    from dip_tpu.utils.noise import get_noise

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    clean = np.stack([np.sin(xx / 23) * 0.5 + 0.5,
                      np.cos(yy / 17) * 0.5 + 0.5,
                      (xx + yy) / (2 * size)], axis=-1)
    noisy = np.clip(clean + rng.normal(scale=25 / 255.0, size=clean.shape), 0, 1)
    target = jnp.asarray(noisy[None], dtype=jnp.float32)

    model = Skip(num_channels_down=[128] * 5, num_channels_up=[128] * 5,
                 num_channels_skip=[4] * 5, upsample_mode="bilinear",
                 pad="reflection")
    cfg = FitConfig(num_iter=iters, lr=0.01, reg_noise_std=1.0 / 30,
                    exp_weight=0.99, log_every=iters,
                    compute_dtype=compute_dtype, up_conv=up_conv)
    eng = Engine(model, lambda p, out, aux: mse(out, aux), cfg,
                 default_metrics(target))
    z = get_noise(jax.random.key(1), 32, "noise", (size, size))
    state = eng.init_state(jax.random.key(0), z)
    chunk = jax.jit(lambda s: eng.run_chunk(s, target, iters))
    return chunk, state


def parse_xplane(logdir: str, top_k: int = 40):
    """Aggregate the captured .xplane.pb into op-level stats. Uses the
    direct XSpace parser (tools/xplane_stats.py) — the
    tensorboard_plugin_profile converters are version-broken in this image
    (pywrap mismatch, then a protobuf descriptor mismatch under the
    pure-python workaround)."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("NO XPLANE CAPTURED", file=sys.stderr)
        return None
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane_stats import analyze

    report = analyze(logdir, top=top_k)
    return ("xplane_stats", report) if report else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default=None,
                    help="compute dtype (e.g. bfloat16); default f32")
    ap.add_argument("--logdir", default="/tmp/dip_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--upc", default=None,
                    help="up_conv dispatch: auto|on|off (default: config None)")
    args = ap.parse_args()

    chunk, state = build_chunk(args.size, args.iters, args.dtype, args.upc)
    # compile + warm outside the trace
    state2, _ = chunk(state)
    jax.block_until_ready(state2.params)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        state3, _ = chunk(state2)
        jax.block_until_ready(state3.params)

    res = parse_xplane(args.logdir, args.top)
    if res is None:
        sys.exit(1)
    tool, data = res
    out = f"/tmp/dip_trace_{tool}.json"
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    with open(out, "w") as f:
        f.write(data if isinstance(data, str) else json.dumps(data))
    print(f"tool={tool} -> {out}")


if __name__ == "__main__":
    main()
