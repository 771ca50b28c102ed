#!/usr/bin/env python
"""Driver benchmark entry: one JSON line with DIP iters/sec at 512^2.

Runs the flagship denoising fit loop (skip-128x5, input_depth 32, jitter +
EMA + on-device PSNR) for a timed chunk on the available accelerator.

    python bench.py [size] [iters] [batch] [dtype]

Defaults: 512 100 1 bfloat16. The mixed-precision path is the headline:
quality parity with f32 is validated on the real-image notebook recipes
(RESULTS.md — kate 38.92 dB, zebra x4 PSNR-Y 25.92, barbara 32.57 dB, all
at or above the f32 rows). Pass `f32` for the full-precision row. `batch`
> 1 on a single chip pipelines independent fits through FitQueue; on a
multi-chip mesh it shard_maps one image per device.
"""

import sys

sys.path.insert(0, ".")

from dip_tpu.bench import run_bench

if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    dtype = sys.argv[4] if len(sys.argv) > 4 else "bfloat16"
    if dtype in ("f32", "float32", "none"):
        dtype = None
    run_bench(size=size, iters=iters, batch=batch, print_json=True,
              compute_dtype=dtype)
