"""Low-level TPU-friendly ops: padding, resampling, losses, color."""

from dip_tpu.ops.pad import pad2d
from dip_tpu.ops.resample import (
    resample_kernel_1d,
    resample_kernel_2d,
    downsample,
    upsample,
    avg_pool,
    max_pool,
)
from dip_tpu.ops.losses import mse, masked_mse, tv_loss, psnr, psnr_y, gram_matrix
from dip_tpu.ops.color import rgb_to_ycbcr_y

__all__ = [
    "pad2d",
    "resample_kernel_1d",
    "resample_kernel_2d",
    "downsample",
    "upsample",
    "avg_pool",
    "max_pool",
    "mse",
    "masked_mse",
    "tv_loss",
    "psnr",
    "psnr_y",
    "gram_matrix",
    "rgb_to_ycbcr_y",
]
