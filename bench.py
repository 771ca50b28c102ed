#!/usr/bin/env python
"""Driver benchmark entry: one JSON line with DIP iters/sec at 512^2.

Runs the flagship denoising fit loop (skip-128x5, input_depth 32, jitter +
EMA + on-device PSNR) for a timed chunk on the available accelerator.
"""

import sys

sys.path.insert(0, ".")

from dip_tpu.bench import run_bench

if __name__ == "__main__":
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    run_bench(size=size, iters=iters, batch=1, print_json=True)
