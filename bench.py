#!/usr/bin/env python
"""Driver benchmark entry: one JSON line with DIP iters/sec at 512^2.

Runs the flagship denoising fit loop (skip-128x5, input_depth 32, jitter +
EMA + on-device PSNR) for a timed chunk on the available accelerator.

    python bench.py [size] [iters] [batch] [dtype]

With NO arguments it runs the full headline schema — b1 bf16 (the headline
metric), b1 f32, and the 8-image FitQueue aggregate — and prints them in
ONE JSON line (`value` = b1 bf16; extras `b1_f32`, `b8_queue_aggregate`).
With arguments it runs exactly one row. The mixed-precision path is the
headline: quality parity with f32 is validated on the real-image notebook
recipes (RESULTS.md). Pass `f32` for the full-precision row. `batch` > 1
on a single chip pipelines independent fits through FitQueue; on a
multi-chip mesh it shard_maps one image per device.
"""

import sys

sys.path.insert(0, ".")

from dip_tpu.bench import run_bench, run_full

if __name__ == "__main__":
    if len(sys.argv) == 1:
        run_full()
    else:
        size = int(sys.argv[1])
        iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
        batch = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        dtype = sys.argv[4] if len(sys.argv) > 4 else "bfloat16"
        if dtype in ("f32", "float32", "none"):
            dtype = None
        run_bench(size=size, iters=iters, batch=batch, print_json=True,
                  compute_dtype=dtype)
