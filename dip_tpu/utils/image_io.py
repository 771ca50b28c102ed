"""Image loading / conversion.

Host-side equivalents of /root/reference/utils/common_utils.py:13-27 (crop),
:94-114 (get_image), :155-195 (layout conversions).  The framework's device
layout is NHWC float32 in [0, 1]; the reference's CHW helpers are provided
for interop with its data conventions.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

# Pillow >= 10 removed the ANTIALIAS alias; LANCZOS is the same filter.
_ANTIALIAS = Image.LANCZOS


def load_image(path: str) -> Image.Image:
    return Image.open(path)


def save_image(path: str, img_np: np.ndarray) -> None:
    """Save an HWC (or HW / HW1) float [0,1] array as an image file."""
    np_to_pil(img_np).save(path)


def crop_image(img: Image.Image, d: int = 32) -> Image.Image:
    """Center-crop a PIL image so both dims are divisible by `d`
    (common_utils.py:13-27)."""
    new_w = img.size[0] - img.size[0] % d
    new_h = img.size[1] - img.size[1] % d
    bbox = (
        int((img.size[0] - new_w) / 2),
        int((img.size[1] - new_h) / 2),
        int((img.size[0] + new_w) / 2),
        int((img.size[1] + new_h) / 2),
    )
    return img.crop(bbox)


def get_image(path: str, imsize: int | tuple[int, int] = -1) -> tuple[Image.Image, np.ndarray]:
    """Load an image, optionally resize (bicubic up / Lanczos down like
    common_utils.py:94-114). Returns (PIL image, HWC float array)."""
    img = load_image(path)
    if isinstance(imsize, int):
        imsize = (imsize, imsize)
    if imsize[0] != -1 and img.size != imsize:
        if imsize[0] > img.size[0]:
            img = img.resize(imsize, Image.BICUBIC)
        else:
            img = img.resize(imsize, _ANTIALIAS)
    return img, pil_to_np(img)


def pil_to_np(img: Image.Image) -> np.ndarray:
    """PIL -> HWC float32 in [0,1] (grayscale -> HW1)."""
    ar = np.array(img)
    if ar.ndim == 2:
        ar = ar[..., None]
    if ar.shape[-1] == 4:  # drop alpha
        ar = ar[..., :3]
    return ar.astype(np.float32) / 255.0


def np_to_pil(img_np: np.ndarray) -> Image.Image:
    """HWC (or HW / HW1) float [0,1] -> PIL."""
    ar = np.clip(np.asarray(img_np) * 255.0, 0, 255).astype(np.uint8)
    if ar.ndim == 3 and ar.shape[-1] == 1:
        ar = ar[..., 0]
    return Image.fromarray(ar)


# --- layout shims -----------------------------------------------------------

def hwc_to_nhwc(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)[None]


def nhwc_to_hwc(x) -> np.ndarray:
    return np.asarray(x)[0]


def chw_to_hwc(x: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(x), (1, 2, 0))


def hwc_to_chw(x: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(x), (2, 0, 1))
