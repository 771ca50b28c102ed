"""Batched multi-image fitting across a TPU mesh — the capability the
reference lacks entirely (one image per GPU process).

Fits N independent denoising problems concurrently: vmap over images,
shard_map over the device mesh. On a v5e-8 with --batch 8, wall-clock per
image is ~1/8 of sequential.

Usage:
    python examples/fit_batch.py --batch 8 --size 256 --num-iter 500
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from dip_tpu.data.synthetic import SYNTHETIC_SET, synthetic_image
from dip_tpu.fit.engine import FitConfig
from dip_tpu.models import Skip
from dip_tpu.ops.losses import mse, psnr
from dip_tpu.parallel.batch import BatchEngine
from dip_tpu.parallel.mesh import make_mesh
from dip_tpu.tasks.denoise import get_noisy_image
from dip_tpu.utils.image_io import save_image
from dip_tpu.utils.noise import get_noise


def main():
    from dip_tpu.utils.platform import apply_platform_env

    apply_platform_env()  # honor DIP_PLATFORM=cpu for mesh experiments
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--num-iter", type=int, default=500)
    ap.add_argument("--sigma", type=float, default=25.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    mesh = make_mesh() if (n_dev > 1 and args.batch % n_dev == 0) else None
    print(f"devices: {n_dev}, mesh: {'data:' + str(n_dev) if mesh else 'none'}")

    rng = np.random.default_rng(args.seed)
    imgs = np.stack([
        synthetic_image(SYNTHETIC_SET[i % len(SYNTHETIC_SET)], args.size)
        for i in range(args.batch)
    ])
    noisy = np.stack([get_noisy_image(im, args.sigma / 255, rng) for im in imgs])
    targets = jnp.asarray(noisy[:, None])  # (B, 1, H, W, C)
    gts = jnp.asarray(imgs[:, None])

    model = Skip(num_channels_down=[128] * 5, num_channels_up=[128] * 5,
                 num_channels_skip=[4] * 5, upsample_mode="bilinear",
                 pad="reflection")
    cfg = FitConfig(num_iter=args.num_iter, lr=0.01, reg_noise_std=1 / 30,
                    exp_weight=0.99, log_every=100)
    eng = BatchEngine(
        model, lambda p, o, a: mse(o, a), cfg,
        metrics_fn=lambda o, e, a: {"psnr_track": psnr(o, a)}, mesh=mesh,
    )

    keys = jax.random.split(jax.random.key(args.seed), args.batch)
    zs = jax.vmap(lambda k: get_noise(k, 32, "noise", (args.size, args.size)))(keys)
    state = eng.init_state(keys, zs)

    t0 = time.time()
    state, hist = eng.run(state, targets,
                          callback=lambda it, h, s: print(
                              f"iter {it:5d}  mean loss {h['loss'][-1].mean():.6f}",
                              flush=True))
    dt = time.time() - t0
    outs = np.asarray(eng.render(state))
    for i in range(args.batch):
        p = float(psnr(jnp.asarray(outs[i]), gts[i]))
        print(f"image {i} ({SYNTHETIC_SET[i % len(SYNTHETIC_SET)]}): {p:.2f} dB vs GT")
        save_image(f"batch_out_{i}.png", np.clip(outs[i, 0], 0, 1))
    total = args.num_iter * args.batch
    print(f"{total} image-iters in {dt:.1f}s = {total / dt:.1f} it/s aggregate")


if __name__ == "__main__":
    main()
