"""Host-side utils: I/O conversions, masks, grids, noise."""

import numpy as np
import jax
import pytest
from PIL import Image

from dip_tpu.utils.image_io import (
    chw_to_hwc,
    crop_image,
    hwc_to_chw,
    hwc_to_nhwc,
    nhwc_to_hwc,
    np_to_pil,
    pil_to_np,
)
from dip_tpu.utils.masks import get_bernoulli_mask, get_text_mask
from dip_tpu.utils.grid import get_image_grid
from dip_tpu.utils.noise import get_noise


def test_pil_np_roundtrip():
    rng = np.random.default_rng(0)
    img = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    pil = Image.fromarray(img)
    arr = pil_to_np(pil)
    assert arr.shape == (20, 30, 3)
    assert arr.dtype == np.float32
    assert 0 <= arr.min() and arr.max() <= 1
    back = np.array(np_to_pil(arr))
    np.testing.assert_array_equal(back, img)


def test_grayscale_channels():
    img = Image.new("L", (16, 12), 128)
    arr = pil_to_np(img)
    assert arr.shape == (12, 16, 1)


def test_crop_image_divisible():
    img = Image.new("RGB", (67, 43))
    out = crop_image(img, d=32)
    assert out.size == (64, 32)


def test_layout_shims():
    x = np.zeros((4, 5, 3), np.float32)
    assert hwc_to_nhwc(x).shape == (1, 4, 5, 3)
    assert nhwc_to_hwc(hwc_to_nhwc(x)).shape == (4, 5, 3)
    assert hwc_to_chw(x).shape == (3, 4, 5)
    assert chw_to_hwc(hwc_to_chw(x)).shape == (4, 5, 3)


def test_text_mask():
    m = get_text_mask((192, 256, 3), text="hello world")
    assert m.shape == (192, 256, 3)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert m.mean() < 1.0  # some pixels masked
    assert m.mean() > 0.9  # but most survive


def test_bernoulli_mask():
    m = get_bernoulli_mask((64, 64, 3), zero_fraction=0.95,
                           rng=np.random.default_rng(1))
    assert abs(m.mean() - 0.05) < 0.02


def test_image_grid():
    imgs = [np.ones((8, 8, 3)), np.zeros((8, 8, 1)), np.ones((6, 8, 3)) * 0.5]
    grid = get_image_grid(imgs, nrow=2)
    assert grid.ndim == 3 and grid.shape[-1] == 3


def test_noise_types():
    k = jax.random.key(0)
    zu = get_noise(k, 4, "noise", (8, 10), noise_type="u")
    assert zu.shape == (1, 8, 10, 4)
    assert float(zu.max()) <= 0.1 + 1e-6  # var=0.1 scales U(0,1)
    zn = get_noise(k, 4, "noise", 8, noise_type="n", var=1.0)
    assert zn.shape == (1, 8, 8, 4)
    with pytest.raises(AssertionError):
        get_noise(k, 3, "meshgrid", (8, 8))
