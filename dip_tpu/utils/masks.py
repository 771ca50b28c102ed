"""Inpainting mask generators.

Equivalents of /root/reference/utils/inpainting_utils.py:7-22.  The text
mask renders onto a white canvas with a bold sans font (DejaVuSans-Bold if
FreeSansBold is absent); the Bernoulli mask keeps a random pixel fraction.
Masks are HWC float arrays in {0, 1} sized like the target image.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw, ImageFont

_FONT_CANDIDATES = [
    "/usr/share/fonts/truetype/freefont/FreeSansBold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
]


def _find_font(size: int) -> ImageFont.ImageFont:
    for path in _FONT_CANDIDATES:
        if os.path.exists(path):
            return ImageFont.truetype(path, size)
    return ImageFont.load_default()


def get_text_mask(
    shape_hwc: tuple[int, int, int],
    text: str = "hello world",
    font_size: int = 20,
    xy: tuple[int, int] = (128, 128),
) -> np.ndarray:
    """White mask with black text drawn at `xy` — the README convergence
    smoke-test degradation. Returns HWC float in {0,1}."""
    h, w, c = shape_hwc
    font = _find_font(font_size)
    canvas = Image.new("RGB" if c == 3 else "L", (w, h), color=255 if c == 1 else (255, 255, 255))
    draw = ImageDraw.Draw(canvas)
    draw.text(xy, text, font=font, fill=0 if c == 1 else (0, 0, 0))
    ar = np.array(canvas).astype(np.float32) / 255.0
    if ar.ndim == 2:
        ar = ar[..., None]
    return (ar > 0.5).astype(np.float32)


def get_bernoulli_mask(
    shape_hwc: tuple[int, int, int],
    zero_fraction: float = 0.95,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Random keep-mask: each pixel survives with prob (1 - zero_fraction)."""
    rng = rng or np.random.default_rng(0)
    return (rng.random(shape_hwc) > zero_fraction).astype(np.float32)
