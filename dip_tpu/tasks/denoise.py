"""Blind denoising / JPEG-artifact removal.

Workload of denoising.ipynb: fit f_theta(z) to the noisy image under plain
MSE; the architecture's spectral bias denoises.  Presets are the notebook's
two configurations (cells 8, 10): 'f16' (sigma=25 recipe) and 'snail'
(blind de-JPEG).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dip_tpu.fit.engine import FitConfig
from dip_tpu.models import Skip
from dip_tpu.ops.losses import mse, psnr
from dip_tpu.tasks.base import TaskSpec


def get_noisy_image(img_hwc: np.ndarray, sigma: float,
                    rng: np.random.Generator | None = None) -> np.ndarray:
    """Add N(0, sigma) and clip to [0,1] (utils/denoising_utils.py:6-15).
    `sigma` in [0,1] units (pass 25/255 for the paper's sigma=25)."""
    rng = rng or np.random.default_rng(0)
    noisy = img_hwc + rng.normal(scale=sigma, size=img_hwc.shape)
    return np.clip(noisy, 0, 1).astype(np.float32)


def _metrics(gt: jnp.ndarray | None):
    def fn(out, ema, aux):
        m = {"psnr_track": psnr(out, aux["noisy"])}
        if gt is not None:
            m["psnr_gt"] = psnr(out, gt)
            m["psnr_gt_sm"] = psnr(ema, gt)
        return m
    return fn


def task(
    img_noisy_nhwc,
    preset: str = "f16",
    gt=None,
    num_iter: int | None = None,
    lr: float = 0.01,
    reg_noise_std: float | None = None,
    exp_weight: float = 0.99,
    input_depth: int | None = None,
) -> TaskSpec:
    """Build the denoising TaskSpec.

    preset 'f16': 3000 iters, input_depth 32, skip-128x5/skip-4,
    reg_noise 1/30, bilinear up, reflection pad, EMA 0.99, backtracking.
    preset 'snail': 2400 iters, input_depth 3, channels [8,16,32,64,128],
    skips [0,0,0,4,4].
    """
    img_noisy = jnp.asarray(img_noisy_nhwc)
    n_out = img_noisy.shape[-1]
    h, w = img_noisy.shape[1], img_noisy.shape[2]

    if preset == "f16":
        depth = 32 if input_depth is None else input_depth
        model = Skip(
            num_output_channels=n_out,
            num_channels_down=[128] * 5,
            num_channels_up=[128] * 5,
            num_channels_skip=[4] * 5,
            upsample_mode="bilinear",
            pad="reflection",
        )
        iters = 3000 if num_iter is None else num_iter
        jitter = 1.0 / 30 if reg_noise_std is None else reg_noise_std
    elif preset == "snail":
        depth = 3 if input_depth is None else input_depth
        model = Skip(
            num_output_channels=n_out,
            num_channels_down=[8, 16, 32, 64, 128],
            num_channels_up=[8, 16, 32, 64, 128],
            num_channels_skip=[0, 0, 0, 4, 4],
            upsample_mode="bilinear",
            pad="reflection",
        )
        iters = 2400 if num_iter is None else num_iter
        jitter = 1.0 / 30 if reg_noise_std is None else reg_noise_std
    else:
        raise ValueError(f"unknown preset {preset!r}")

    cfg = FitConfig(
        num_iter=iters,
        lr=lr,
        reg_noise_std=jitter,
        exp_weight=exp_weight,
        backtrack=True,
    )
    gt_j = None if gt is None else jnp.asarray(gt)
    return TaskSpec(
        name=f"denoise/{preset}",
        model=model,
        cfg=cfg,
        loss_fn=lambda p, out, aux: mse(out, aux["noisy"]),
        aux={"noisy": img_noisy},
        metrics_fn=_metrics(gt_j),
        input_depth=depth,
        spatial_size=(h, w),
    )
