"""Device-mesh helpers.

DIP has no gradient coupling between images — each fit is independent — so
the natural TPU scaling axis is *images across chips*: a 1-D 'data' mesh,
batch arrays sharded over it, zero collectives in the hot loop (SURVEY.md
§5).  XLA's SPMD partitioner splits the vmapped fit automatically from the
sharding annotations; ICI traffic is nil until metrics are gathered.

For images too large for one chip's HBM, `spatial` submeshes are reserved as
a future axis (halo-exchange sharded convs) — not required for parity with
the reference, whose largest input is 706x774.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first `n_devices` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place every array in `tree` with its leading (batch) dim sharded over
    the mesh axis; scalars/rank-0 leaves are replicated."""
    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            spec = P()
        else:
            spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jax.numpy.asarray(x), NamedSharding(mesh, P())),
        tree,
    )
