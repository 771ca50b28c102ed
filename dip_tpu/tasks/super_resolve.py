"""Single-image super-resolution (super-resolution.ipynb).

The generator runs at HR resolution; the *differentiable* Lanczos
downsampler maps its output to LR where the MSE is taken (cells 8, 10).
Optional TV regularization on the HR output.  Presets: x4 (2000 iters,
jitter .03) and x8 (4000 iters, jitter .05) per cell 7.

Host-side data prep (load_LR_HR_imgs_sr / baselines) lives here too: the LR
observation is produced by PIL's Lanczos resize — deliberately a *different*
operator from the in-graph downsampler, as in the reference
(utils/sr_utils.py:54 vs models/downsampler.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageFilter

from dip_tpu.fit.engine import FitConfig
from dip_tpu.models import Skip
from dip_tpu.models.downsampler import LearnableDownsampler
from dip_tpu.ops.losses import mse, psnr, tv_loss
from dip_tpu.ops.resample import downsample
from dip_tpu.tasks.base import TaskSpec
from dip_tpu.utils.image_io import get_image, pil_to_np


def load_lr_hr(path: str, imsize=-1, factor: int = 4, enforce_div32: str | None = "CROP"):
    """Load + center-crop to /32 + produce the LR observation by PIL Lanczos
    (utils/sr_utils.py:18-66). Returns dict of PIL + HWC arrays."""
    img_orig_pil, img_orig_np = get_image(path, imsize)

    if enforce_div32 == "CROP":
        new_w = img_orig_pil.size[0] - img_orig_pil.size[0] % 32
        new_h = img_orig_pil.size[1] - img_orig_pil.size[1] % 32
        bbox = (
            (img_orig_pil.size[0] - new_w) // 2,
            (img_orig_pil.size[1] - new_h) // 2,
            (img_orig_pil.size[0] + new_w) // 2,
            (img_orig_pil.size[1] + new_h) // 2,
        )
        img_hr_pil = img_orig_pil.crop(bbox)
    else:
        img_hr_pil = img_orig_pil

    lr_size = (img_hr_pil.size[0] // factor, img_hr_pil.size[1] // factor)
    img_lr_pil = img_hr_pil.resize(lr_size, Image.LANCZOS)
    return {
        "orig_pil": img_orig_pil,
        "orig_np": img_orig_np,
        "HR_pil": img_hr_pil,
        "HR_np": pil_to_np(img_hr_pil),
        "LR_pil": img_lr_pil,
        "LR_np": pil_to_np(img_lr_pil),
    }


def get_baselines(img_lr_pil: Image.Image, img_hr_pil: Image.Image):
    """bicubic / unsharp-masked bicubic / nearest upsampling baselines
    (utils/sr_utils.py:69-80)."""
    bicubic = img_lr_pil.resize(img_hr_pil.size, Image.BICUBIC)
    nearest = img_lr_pil.resize(img_hr_pil.size, Image.NEAREST)
    sharp = bicubic.filter(ImageFilter.UnsharpMask())
    return pil_to_np(bicubic), pil_to_np(sharp), pil_to_np(nearest)


def put_in_center(img_hwc: np.ndarray, target_hw: tuple[int, int]) -> np.ndarray:
    """Zero-pad embed into a larger canvas (utils/sr_utils.py:3-15)."""
    h, w, c = img_hwc.shape
    out = np.zeros((target_hw[0], target_hw[1], c), img_hwc.dtype)
    y0 = (target_hw[0] - h) // 2
    x0 = (target_hw[1] - w) // 2
    out[y0 : y0 + h, x0 : x0 + w] = img_hwc
    return out


def task(
    img_lr_nhwc,
    factor: int = 4,
    hr_gt=None,
    kernel_type: str = "lanczos2",
    tv_weight: float = 0.0,
    num_iter: int | None = None,
    lr: float = 0.01,
    reg_noise_std: float | None = None,
    learnable_downsampler: bool = False,
    net: str = "skip",
    resample_impl: str = "xla",
) -> TaskSpec:
    """Build the SR TaskSpec. HR size = LR size * factor.

    net='identity' is sr_prior_effect.ipynb's degenerate mode: no generator,
    optimize HR pixels directly (OPT_OVER='input') — isolating how much of
    SR quality is the *architecture* prior vs. the TV/jitter machinery.
    """
    img_lr = jnp.asarray(img_lr_nhwc)
    n_out = img_lr.shape[-1]
    hr_h, hr_w = img_lr.shape[1] * factor, img_lr.shape[2] * factor

    if factor == 4:
        iters = 2000 if num_iter is None else num_iter
        jitter = 0.03 if reg_noise_std is None else reg_noise_std
    elif factor == 8:
        iters = 4000 if num_iter is None else num_iter
        jitter = 0.05 if reg_noise_std is None else reg_noise_std
    else:
        iters = 2000 if num_iter is None else num_iter
        jitter = 0.03 if reg_noise_std is None else reg_noise_std

    opt_input = False
    input_depth = 32
    if net == "skip":
        model = Skip(
            num_output_channels=n_out,
            num_channels_down=[128] * 5,
            num_channels_up=[128] * 5,
            num_channels_skip=[4] * 5,
            upsample_mode="bilinear",
            pad="reflection",
        )
    elif net == "identity":
        from dip_tpu.models import Identity

        model = Identity()
        opt_input = True
        input_depth = n_out
    else:
        raise ValueError(f"unknown net {net!r}")

    extra_params = None
    if learnable_downsampler:
        # opt_over='down' support: the kernel becomes a trainable leaf
        import jax as _jax

        down_mod = LearnableDownsampler(factor=factor, kernel_type=kernel_type)
        dummy = jnp.zeros((1, hr_h, hr_w, n_out))
        down_vars = down_mod.init(_jax.random.key(0), dummy)
        extra_params = {"down": down_vars["params"]}

        def degrade(p, out_hr):
            return down_mod.apply({"params": p["down"]}, out_hr)
    elif resample_impl == "pallas":
        # the fused Pallas kernel (ops/pallas_resample.py) — same numerics,
        # custom VJP; falls back to XLA on geometries it doesn't support
        from dip_tpu.ops.pallas_resample import downsample_fused

        def degrade(p, out_hr):
            return downsample_fused(out_hr, factor, kernel_type, 0.5, True)
    elif resample_impl == "xla":
        def degrade(p, out_hr):
            return downsample(out_hr, factor, kernel_type=kernel_type,
                              phase=0.5, preserve_size=True)
    else:
        raise ValueError(f"unknown resample_impl {resample_impl!r}")

    def loss_fn(p, out_hr, aux):
        out_lr = degrade(p, out_hr)
        total = mse(out_lr, aux["lr"])
        if tv_weight > 0:
            total = total + tv_weight * tv_loss(out_hr)
        return total

    hr_gt_j = None if hr_gt is None else jnp.asarray(hr_gt)

    def metrics_fn(out_hr, ema, aux):
        # metrics use the fixed reference downsampler so psnr_lr stays
        # comparable even when the degradation kernel is being learned
        out_lr = downsample(out_hr, factor, kernel_type=kernel_type,
                            phase=0.5, preserve_size=True)
        m = {"psnr_track": psnr(out_lr, aux["lr"]), "psnr_lr": psnr(out_lr, aux["lr"])}
        if hr_gt_j is not None:
            m["psnr_hr"] = psnr(out_hr, hr_gt_j)
        return m

    # reference parity: opt_over='net,down' optimizes the degradation kernel
    # jointly (get_params 'down', utils/common_utils.py:44-46)
    opt_over = "net" + (",input" if opt_input else "") + (
        ",down" if learnable_downsampler else "")
    return TaskSpec(
        name=f"sr/x{factor}" + ("" if net == "skip" else f"/{net}"),
        model=model,
        cfg=FitConfig(num_iter=iters, lr=lr, reg_noise_std=jitter,
                      backtrack=not opt_input, opt_input=opt_input,
                      opt_over=opt_over),
        loss_fn=loss_fn,
        aux={"lr": img_lr},
        metrics_fn=metrics_fn,
        input_depth=input_depth,
        spatial_size=(hr_h, hr_w),
        extra_params=extra_params,
    )
