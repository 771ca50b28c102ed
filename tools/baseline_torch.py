"""Measure the PyTorch reference's actual optimization-loop throughput.

Round 1's bench divided by an *assumed* 10 it/s. This script replaces the
assumption with a measurement: it imports the reference library from
/root/reference (read-only; executed for measurement, never copied), builds
the exact denoising.ipynb configuration (cell 8: skip net 128x5/skip-4,
input_depth 32, 512x512), and times the cell-10 closure semantics
(input jitter -> forward -> MSE -> backward -> Adam step) on this host.

The reference targets a CUDA GPU; this host has none, so the number is a
CPU measurement and recorded as such. Usage:

    python tools/baseline_torch.py [--size 512] [--iters 20] [--device cpu]

Prints one JSON line {"torch_it_per_s": ..., "device": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REFERENCE = "/root/reference"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--device", default="cpu")
    args = p.parse_args(argv)

    import numpy as np
    import torch

    sys.path.insert(0, REFERENCE)
    from models import get_net  # reference models/__init__.py:8

    torch.manual_seed(0)
    dev = torch.device(args.device)
    input_depth = 32
    # denoising.ipynb cell 8 configuration
    net = get_net(input_depth, "skip", "reflection",
                  skip_n33d=128, skip_n33u=128, skip_n11=4,
                  num_scales=5, upsample_mode="bilinear").to(dev)
    net_input = (torch.rand(1, input_depth, args.size, args.size,
                            device=dev) * 0.1).detach()
    noise = net_input.clone()
    net_input_saved = net_input.clone()
    target = torch.rand(1, 3, args.size, args.size, device=dev)
    mse = torch.nn.MSELoss()
    optimizer = torch.optim.Adam(net.parameters(), lr=0.01)
    reg_noise_std = 1.0 / 30.0

    def closure():
        inp = net_input_saved + noise.normal_() * reg_noise_std
        out = net(inp)
        loss = mse(out, target)
        loss.backward()
        return loss

    for _ in range(args.warmup):
        optimizer.zero_grad()
        closure()
        optimizer.step()

    t0 = time.time()
    for _ in range(args.iters):
        optimizer.zero_grad()
        loss = closure()
        optimizer.step()
    dt = time.time() - t0

    n_params = sum(int(np.prod(p.shape)) for p in net.parameters())
    print(json.dumps({
        "torch_it_per_s": round(args.iters / dt, 3),
        "sec_per_iter": round(dt / args.iters, 3),
        "device": str(dev),
        "size": args.size,
        "iters": args.iters,
        "loss_final": round(float(loss.detach()), 6),
        "n_params": n_params,
        "torch_version": torch.__version__,
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
