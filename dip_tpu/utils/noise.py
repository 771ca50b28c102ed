"""Network-input generators (the `z` code tensor).

Functional port of get_noise / fill_noise
(/root/reference/utils/common_utils.py:118-153): explicit jax.random keys
replace in-place ``uniform_()/normal_()``.  Shapes are NHWC (1, H, W, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_noise(
    key: jax.Array,
    input_depth: int,
    method: str,
    spatial_size: int | tuple[int, int],
    noise_type: str = "u",
    var: float = 0.1,
) -> jnp.ndarray:
    """Build the generator input of shape (1, H, W, input_depth).

    method 'noise': U(0,1) ('u') or N(0,1) ('n') scaled by `var`;
    method 'meshgrid': 2-channel normalized X/Y coordinate grid
    (requires input_depth == 2).
    """
    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)
    h, w = spatial_size
    if method == "noise":
        shape = (1, h, w, input_depth)
        if noise_type == "u":
            z = jax.random.uniform(key, shape)
        elif noise_type == "n":
            z = jax.random.normal(key, shape)
        else:
            raise ValueError(f"unknown noise_type {noise_type!r}")
        return z * var
    if method == "meshgrid":
        assert input_depth == 2, "meshgrid input requires input_depth == 2"
        xg, yg = np.meshgrid(
            np.arange(w) / float(w - 1),
            np.arange(h) / float(h - 1),
        )
        grid = np.stack([xg, yg], axis=-1).astype(np.float32)
        return jnp.asarray(grid[None])
    raise ValueError(f"unknown method {method!r}")
