"""Flash/no-flash reconstruction (flash-no-flash.ipynb).

The *flash* image is the network input (not noise); the loss pulls the
output toward the *no-flash* image, transferring its lighting while keeping
the flash image's detail.  Recipe from cells 7-8: 601 iters, LR 0.1, skip
net with mixed nearest/bilinear upsampling.
"""

from __future__ import annotations

import jax.numpy as jnp

from dip_tpu.fit.engine import FitConfig
from dip_tpu.models import Skip
from dip_tpu.ops.losses import mse, psnr
from dip_tpu.tasks.base import TaskSpec


def task(
    img_flash_nhwc,
    img_noflash_nhwc,
    num_iter: int = 601,
    lr: float = 0.1,
    reg_noise_std: float = 0.0,
) -> TaskSpec:
    flash = jnp.asarray(img_flash_nhwc)
    noflash = jnp.asarray(img_noflash_nhwc)
    n_out = noflash.shape[-1]

    model = Skip(
        num_output_channels=n_out,
        num_channels_down=[128] * 5,
        num_channels_up=[128] * 5,
        num_channels_skip=[4] * 5,
        upsample_mode=["nearest", "nearest", "bilinear", "bilinear", "bilinear"],
        pad="reflection",
    )

    return TaskSpec(
        name="flash_no_flash",
        model=model,
        cfg=FitConfig(num_iter=num_iter, lr=lr, reg_noise_std=reg_noise_std),
        loss_fn=lambda p, out, aux: mse(out, aux["noflash"]),
        aux={"noflash": noflash},
        metrics_fn=lambda out, ema, aux: {"psnr_track": psnr(out, aux["noflash"])},
        net_input=flash,
    )
