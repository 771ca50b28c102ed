"""Host-side utilities: image I/O, noise inputs, masks, grids."""

from dip_tpu.utils.image_io import (
    load_image,
    save_image,
    crop_image,
    get_image,
    pil_to_np,
    np_to_pil,
    hwc_to_nhwc,
    nhwc_to_hwc,
    chw_to_hwc,
    hwc_to_chw,
)
from dip_tpu.utils.noise import get_noise
from dip_tpu.utils.masks import get_text_mask, get_bernoulli_mask
from dip_tpu.utils.grid import get_image_grid

__all__ = [
    "load_image",
    "save_image",
    "crop_image",
    "get_image",
    "pil_to_np",
    "np_to_pil",
    "hwc_to_nhwc",
    "nhwc_to_hwc",
    "chw_to_hwc",
    "hwc_to_chw",
    "get_noise",
    "get_text_mask",
    "get_bernoulli_mask",
    "get_image_grid",
]
