"""Inpainting: masked-MSE fit (inpainting.ipynb).

Presets are the three notebook figures (cell 14): 'vase' (meshgrid input,
no-skip skip net), 'kate' (text inpainting — the README convergence smoke
test), 'library' (deep 6-scale net + weight jitter; also UNet/ResNet
variants).
"""

from __future__ import annotations

import jax.numpy as jnp

from dip_tpu.fit.engine import FitConfig
from dip_tpu.models import ResNet, Skip, UNet
from dip_tpu.ops.losses import masked_mse, psnr
from dip_tpu.tasks.base import TaskSpec


def _metrics(gt):
    def fn(out, ema, aux):
        m = {"psnr_track": psnr(out * aux["mask"], aux["img"] * aux["mask"])}
        if gt is not None:
            m["psnr_gt"] = psnr(out, gt)
        return m
    return fn


def task(
    img_nhwc,
    mask_nhwc,
    preset: str = "kate",
    gt=None,
    num_iter: int | None = None,
    net_type: str = "skip",
) -> TaskSpec:
    img = jnp.asarray(img_nhwc)
    mask = jnp.asarray(mask_nhwc)
    n_out = img.shape[-1]
    h, w = img.shape[1], img.shape[2]

    input_method, input_depth = "noise", 32
    param_noise = False
    lr, jitter = 0.01, 0.03

    if preset == "vase":
        input_method, input_depth = "meshgrid", 2
        iters = 5001 if num_iter is None else num_iter
        model = Skip(
            num_output_channels=n_out,
            num_channels_down=[128] * 5,
            num_channels_up=[128] * 5,
            num_channels_skip=[0] * 5,
            upsample_mode="nearest",
            pad="reflection",
        )
    elif preset == "kate":
        iters = 6001 if num_iter is None else num_iter
        model = Skip(
            num_output_channels=n_out,
            num_channels_down=[128] * 5,
            num_channels_up=[128] * 5,
            num_channels_skip=[128] * 5,
            upsample_mode="nearest",
            pad="reflection",
        )
    elif preset == "library":
        input_depth = 1
        iters = 3001 if num_iter is None else num_iter
        jitter = 0.0
        if net_type.startswith("skip"):
            depth = int(net_type[-1]) if net_type[-1].isdigit() else 6
            param_noise = True
            model = Skip(
                num_output_channels=n_out,
                num_channels_down=[16, 32, 64, 128, 128, 128][:depth],
                num_channels_up=[16, 32, 64, 128, 128, 128][:depth],
                num_channels_skip=[0] * depth,
                filter_size_down=5,
                filter_size_up=3,
                need1x1_up=False,
                upsample_mode="nearest",
                pad="reflection",
            )
        elif net_type == "UNet":
            lr = 1e-3
            model = UNet(num_output_channels=n_out, feature_scale=8,
                         more_layers=1, upsample_mode="deconv", pad="zero",
                         norm_kind="instance")
        elif net_type == "ResNet":
            lr = 1e-3
            model = ResNet(num_output_channels=n_out, num_blocks=8,
                           num_channels=32)
        else:
            raise ValueError(f"unknown net_type {net_type!r}")
    else:
        raise ValueError(f"unknown preset {preset!r}")

    cfg = FitConfig(num_iter=iters, lr=lr, reg_noise_std=jitter,
                    param_noise=param_noise)
    gt_j = None if gt is None else jnp.asarray(gt)
    return TaskSpec(
        name=f"inpaint/{preset}",
        model=model,
        cfg=cfg,
        loss_fn=lambda p, out, aux: masked_mse(out, aux["img"], aux["mask"]),
        aux={"img": img, "mask": mask},
        metrics_fn=_metrics(gt_j),
        input_depth=input_depth,
        input_method=input_method,
        spatial_size=(h, w),
    )
