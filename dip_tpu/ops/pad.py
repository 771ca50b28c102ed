"""Spatial padding for NHWC tensors.

Covers the reference's three padding behaviors (zero / reflection /
replication — see /root/reference/models/common.py:114-120 and
models/downsampler.py:54-61) as pure jnp.pad calls, which XLA fuses into the
consuming convolution.
"""

from __future__ import annotations

import jax.numpy as jnp

_MODES = {
    "zero": "constant",
    "constant": "constant",
    "reflection": "reflect",
    "reflect": "reflect",
    "replication": "edge",
    "replicate": "edge",
    "edge": "edge",
}


def pad2d(x: jnp.ndarray, pad: int | tuple[int, int], mode: str = "zero") -> jnp.ndarray:
    """Pad the spatial dims (H, W) of an NHWC (or HWC) tensor.

    Args:
        x: array of shape (..., H, W, C).
        pad: int (same both dims) or (pad_h, pad_w).
        mode: 'zero' | 'reflection' | 'replication' (plus jnp aliases).
    """
    if isinstance(pad, int):
        ph = pw = pad
    else:
        ph, pw = pad
    if ph == 0 and pw == 0:
        return x
    jmode = _MODES[mode]
    cfg = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
    return jnp.pad(x, cfg, mode=jmode)
