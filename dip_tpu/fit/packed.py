"""Pack small parameter leaves into one vector for the optimizer update.

The trace (docs/PERF.md) shows XLA emitting a separate multiply-add fusion
per optimizer leaf, each costing ~0.2 ms regardless of size — a KB-sized
1x1-conv bias costs the same as a 65 KB kernel. The skip net has ~117
leaves, most tiny (biases, BN scales, 1x1 kernels). `optax.flatten` fixes
the fusion count but drags the big 3x3 kernels through ravel/concat traffic
and measured slower (PERF.md).

`pack_small` is the middle road: leaves under `threshold` elements are
raveled into ONE packed vector (their updates become a single fused
multiply-add), while large leaves keep their per-leaf update (no ravel
traffic on the hot kernels). Small leaves are replaced by zero-size
placeholders inside the inner transformation, so its state pytree keeps the
same structure and XLA elides the empty ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _Meta(NamedTuple):
    small: tuple          # indices of packed leaves (flatten order)
    shapes: tuple         # their shapes
    sizes: tuple          # their element counts
    dtypes: tuple         # their dtypes (restored on unpack: jnp.concatenate
                          # would silently promote mixed-dtype leaves)


def _split_meta(params, threshold: int) -> _Meta:
    leaves = jax.tree_util.tree_leaves(params)
    small = tuple(i for i, l in enumerate(leaves) if l.size < threshold)
    shapes = tuple(leaves[i].shape for i in small)
    sizes = tuple(leaves[i].size for i in small)
    dtypes = tuple(leaves[i].dtype for i in small)
    return _Meta(small, shapes, sizes, dtypes)


def _to_inner(tree, meta: _Meta):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    small = set(meta.small)
    packed = (jnp.concatenate([leaves[i].ravel() for i in meta.small])
              if meta.small else jnp.zeros((0,), jnp.float32))
    kept = [jnp.zeros((0,), l.dtype) if i in small else l
            for i, l in enumerate(leaves)]
    return {"leaves": jax.tree_util.tree_unflatten(treedef, kept),
            "packed": packed}


def _from_inner(inner_tree, like, meta: _Meta):
    leaves, treedef = jax.tree_util.tree_flatten(like)
    kept = jax.tree_util.tree_leaves(inner_tree["leaves"])
    packed = inner_tree["packed"]
    out = list(kept)
    off = 0
    for i, shape, size, dtype in zip(meta.small, meta.shapes, meta.sizes,
                                     meta.dtypes):
        leaf = jax.lax.dynamic_slice_in_dim(packed, off, size).reshape(shape)
        # undo the concat's dtype promotion (no-op when dtypes agree)
        out[i] = leaf if leaf.dtype == dtype else leaf.astype(dtype)
        off += size
    return jax.tree_util.tree_unflatten(treedef, out)


def pack_small(inner: optax.GradientTransformation,
               threshold: int = 1 << 15) -> optax.GradientTransformation:
    """Wrap `inner` so leaves with < `threshold` elements share one packed
    update vector. Gradient-transformation semantics are unchanged for
    elementwise optimizers (adam/sgd/...): packing is a permutation of
    elements, and their updates are per-element."""

    # The partition is a pure function of the (static) leaf shapes, so it
    # is recomputed per call rather than carried in the optimizer state —
    # state must stay a pytree of arrays for scan/donation/checkpointing.

    def init(params):
        meta = _split_meta(params, threshold)
        return inner.init(_to_inner(params, meta))

    def update(grads, state, params=None):
        meta = _split_meta(grads, threshold)
        g2 = _to_inner(grads, meta)
        p2 = None if params is None else _to_inner(params, meta)
        u2, state = inner.update(g2, state, p2)
        return _from_inner(u2, grads, meta), state

    return optax.GradientTransformation(init, update)
