"""Compare the Pallas fused downsampler vs the XLA banded-matmul path on TPU.

Times forward and forward+VJP at SR-recipe geometries and checks numerical
agreement on the compiled TPU kernel (not just interpret mode). Records to
results/pallas_compare.jsonl; the verdict (win/tie/lose per shape) goes into
PERF.md and decides the resample_impl default.

    python tools/pallas_compare.py
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

OUTDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "results")

SHAPES = [  # (H, W, C, factor) — zebra x4/x8 HR and the 512^2 flagship
    (384, 576, 3, 4),
    (384, 576, 3, 8),
    (512, 512, 3, 4),
    (1024, 1024, 3, 4),
]


def _time(fn, *args, reps=3):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
    return dt, out


def main():
    from dip_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from dip_tpu.ops.pallas_resample import downsample_fused
    from dip_tpu.ops.resample import downsample

    os.makedirs(OUTDIR, exist_ok=True)
    rng = np.random.default_rng(0)
    for h, w, c, f in SHAPES:
        x = jnp.asarray(rng.random((1, h, w, c)), jnp.float32)

        # scanned loops amortize dispatch: time 50 applications per call
        def loop(fn):
            def run(x0):
                def body(carry, _):
                    y = fn(carry)
                    return carry, jnp.mean(y)
                return jax.lax.scan(body, x0, None, length=50)[1]
            return jax.jit(run)

        xla_fwd = loop(lambda t: downsample(t, f, "lanczos2", 0.5, True))
        pls_fwd = loop(lambda t: downsample_fused(t, f, "lanczos2", 0.5, True))

        def grad_loop(fn):
            g = jax.grad(lambda t: jnp.sum(fn(t) ** 2))
            def run(x0):
                def body(carry, _):
                    return carry, jnp.mean(g(carry))
                return jax.lax.scan(body, x0, None, length=50)[1]
            return jax.jit(run)

        xla_g = grad_loop(lambda t: downsample(t, f, "lanczos2", 0.5, True))
        pls_g = grad_loop(lambda t: downsample_fused(t, f, "lanczos2", 0.5, True))

        t_xf, _ = _time(xla_fwd, x)
        t_pf, _ = _time(pls_fwd, x)
        t_xg, _ = _time(xla_g, x)
        t_pg, _ = _time(pls_g, x)

        # compiled-path numerics
        y_x = downsample(x, f, "lanczos2", 0.5, True)
        y_p = downsample_fused(x, f, "lanczos2", 0.5, True)
        err = float(jnp.max(jnp.abs(y_x - y_p)))

        rec = {"shape": f"{h}x{w}x{c}", "factor": f,
               "xla_fwd_us": round(t_xf / 50 * 1e6, 1),
               "pallas_fwd_us": round(t_pf / 50 * 1e6, 1),
               "xla_fwdbwd_us": round(t_xg / 50 * 1e6, 1),
               "pallas_fwdbwd_us": round(t_pg / 50 * 1e6, 1),
               "fwd_speedup": round(t_xf / t_pf, 2),
               "fwdbwd_speedup": round(t_xg / t_pg, 2),
               "max_abs_err": err}
        print(json.dumps(rec), flush=True)
        with open(os.path.join(OUTDIR, "pallas_compare.jsonl"), "a") as fo:
            fo.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
