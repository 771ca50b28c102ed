"""Task losses and image metrics, all pure jnp — safe inside jit/scan/vmap.

Mirrors the loss surface of the reference: plain MSE (denoising,
denoising.ipynb cell 10), masked MSE (inpainting.ipynb cell 17), TV loss
(/root/reference/utils/sr_utils.py:84-94), PSNR per-iteration logging
(skimage compare_psnr with data range 1), Y-channel PSNR for the SR eval
protocol (super-resolution_eval_script.py:4-13), and the Gram matrix for
style/texture matching (utils/matcher.py:33-38).
"""

from __future__ import annotations

import jax.numpy as jnp

from dip_tpu.ops.color import rgb_to_ycbcr_y


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    d = pred - target
    return jnp.mean(d * d)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MSE over masked pixels, normalized like the reference's
    ``mse(out * mask, img * mask)`` — i.e. by total pixel count, not by the
    mask population (inpainting.ipynb cell 17)."""
    d = (pred - target) * mask
    return jnp.mean(d * d)


def tv_loss(x: jnp.ndarray, beta: float = 0.5) -> jnp.ndarray:
    """Total variation: sum over ((dh)^2 + (dw)^2)^beta on the common valid
    region. NHWC port of utils/sr_utils.py:84-94 (which is NCHW)."""
    dh = x[:, :, 1:, :] - x[:, :, :-1, :]   # horizontal neighbor diff (W axis)
    dw = x[:, 1:, :, :] - x[:, :-1, :, :]   # vertical neighbor diff (H axis)
    dh2 = dh[:, :-1, :, :] ** 2
    dw2 = dw[:, :, :-1, :] ** 2
    return jnp.sum((dh2 + dw2) ** beta)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (scalar, on-device)."""
    err = mse(pred, target)
    return 10.0 * jnp.log10((data_range * data_range) / jnp.maximum(err, 1e-12))


def psnr_y(pred_rgb: jnp.ndarray, target_rgb: jnp.ndarray, crop: int = 0) -> jnp.ndarray:
    """PSNR on the studio-swing Y channel — the paper's SR table metric
    (super-resolution_eval_script.py:12-13). `crop` trims a border first."""
    if crop:
        pred_rgb = pred_rgb[..., crop:-crop, crop:-crop, :]
        target_rgb = target_rgb[..., crop:-crop, crop:-crop, :]
    return psnr(rgb_to_ycbcr_y(pred_rgb), rgb_to_ycbcr_y(target_rgb))


def gram_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """Normalized Gram matrix of NHWC features: (N, C, C) / (C*H*W).

    Matches utils/matcher.py:33-38 (bmm of flattened features / (ch*h*w)).
    The contraction is a single MXU matmul per image.
    """
    n, h, w, c = x.shape
    f = x.reshape(n, h * w, c)
    g = jnp.einsum("npc,npd->ncd", f, f, preferred_element_type=jnp.float32)
    return g / (c * h * w)
