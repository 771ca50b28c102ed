"""Sparse restoration: recover an image from a small random pixel fraction
(restoration.ipynb) — same masked-MSE machinery as inpainting with a
Bernoulli keep-mask.  Presets from cell 7: 'barbara' (50% pixels, 11000
iters, LR 1e-3) and 'kate' (2% pixels, 1000 iters, LR 1e-2).  Backtracking
tracks PSNR on the *observed* pixels (cell 9).
"""

from __future__ import annotations

import jax.numpy as jnp

from dip_tpu.fit.engine import FitConfig
from dip_tpu.models import Skip
from dip_tpu.ops.losses import masked_mse, psnr
from dip_tpu.tasks.base import TaskSpec
from dip_tpu.utils.masks import get_bernoulli_mask  # re-export convenience

__all__ = ["task", "get_bernoulli_mask"]


def task(
    img_nhwc,
    mask_nhwc,
    preset: str = "barbara",
    num_iter: int | None = None,
    gt=None,
) -> TaskSpec:
    img = jnp.asarray(img_nhwc)
    mask = jnp.asarray(mask_nhwc)
    gt_j = None if gt is None else jnp.asarray(gt)
    n_out = img.shape[-1]
    h, w = img.shape[1], img.shape[2]

    if preset == "barbara":
        lr, iters, jitter = 1e-3, 11000, 0.03
        model = Skip(
            num_output_channels=n_out,
            num_channels_down=[128] * 5,
            num_channels_up=[128] * 5,
            num_channels_skip=[4] * 5,
            upsample_mode="bilinear",
            pad="reflection",
        )
    elif preset == "kate":
        lr, iters, jitter = 1e-2, 1000, 0.0
        model = Skip(
            num_output_channels=n_out,
            num_channels_down=[16, 32, 64, 128, 128],
            num_channels_up=[16, 32, 64, 128, 128],
            num_channels_skip=[0] * 5,
            upsample_mode="bilinear",
            downsample_mode="avg",
            pad="reflection",
        )
    else:
        raise ValueError(f"unknown preset {preset!r}")
    if num_iter is not None:
        iters = num_iter

    def metrics_fn(out, ema, aux):
        m = {"psnr_track": psnr(out * aux["mask"], aux["img"] * aux["mask"])}
        if gt_j is not None:
            # vs clean ground truth (restoration.ipynb cell 9's `psrn`)
            m["psnr_full"] = psnr(out, gt_j)
        return m

    return TaskSpec(
        name=f"restore/{preset}",
        model=model,
        cfg=FitConfig(num_iter=iters, lr=lr, reg_noise_std=jitter,
                      backtrack=True),
        loss_fn=lambda p, out, aux: masked_mse(out, aux["img"], aux["mask"]),
        aux={"img": img, "mask": mask},
        metrics_fn=metrics_fn,
        input_depth=32,
        spatial_size=(h, w),
    )
