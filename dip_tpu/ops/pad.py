"""Spatial padding for NHWC tensors.

Covers the reference's three padding behaviors (zero / reflection /
replication — see /root/reference/models/common.py:114-120 and
models/downsampler.py:54-61).  Reflect/edge padding carries a custom VJP:
jnp.pad's autodiff transpose lowers the edge-fold to gather/scatter forms
that cost a measurable slice of every DIP iteration (the skip net pads
before all ~17 convs); the hand adjoint is the interior slice plus two
p-row strip-adds per axis — static dynamic-update-slices XLA fuses cheaply.
"""

from __future__ import annotations

import functools

import jax
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
    if jmode in ("reflect", "edge") and x.ndim == 4:
        return _pad2d_folded(x, (ph, pw), jmode)
    cfg = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
    return jnp.pad(x, cfg, mode=jmode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pad2d_folded(x, pads, jmode):
    ph, pw = pads
    return jnp.pad(x, [(0, 0), (ph, ph), (pw, pw), (0, 0)], mode=jmode)


def _pad2d_fwd(x, pads, jmode):
    return _pad2d_folded(x, pads, jmode), None


def _unpad_h(g, p, n, jmode):
    """Adjoint of H-axis pad: slice the interior, fold the strips back."""
    if p == 0:
        return g
    core = g[:, p : p + n]
    pre, post = g[:, :p], g[:, p + n :]
    if jmode == "reflect":
        # y[i] = x[p-i] (i<p) and y[p+n+k] = x[n-2-k]
        core = core.at[:, 1 : p + 1].add(pre[:, ::-1])
        core = core.at[:, n - p - 1 : n - 1].add(post[:, ::-1])
    else:  # edge
        core = core.at[:, :1].add(pre.sum(axis=1, keepdims=True))
        core = core.at[:, n - 1 : n].add(post.sum(axis=1, keepdims=True))
    return core


def _pad2d_bwd(pads, jmode, _, g):
    ph, pw = pads
    n_h = g.shape[1] - 2 * ph
    n_w = g.shape[2] - 2 * pw
    # forward = pad H then pad W, so the adjoint unpads W then H
    g = jnp.swapaxes(_unpad_h(jnp.swapaxes(g, 1, 2), pw, n_w, jmode), 1, 2)
    g = _unpad_h(g, ph, n_h, jmode)
    return (g,)


_pad2d_folded.defvjp(_pad2d_fwd, _pad2d_bwd)
