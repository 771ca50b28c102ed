"""Spatial sharding: fit ONE image larger than a chip's HBM across the mesh.

For giant inputs the data-parallel axis (images) doesn't help — a single
fit must itself be partitioned. Convolutions partition cleanly along
spatial dimensions: XLA's SPMD partitioner inserts halo exchanges for the
3x3/5x5 windows automatically when the activations carry a spatial
sharding. Since a DIP fit is batch-1 (no vmap), none of the grouped-conv
lowering problems apply — we simply pin z / target / output to
P(None, 'sp', None, None) (H sharded) and jit the ordinary engine step over
the mesh; weights replicate, activations shard, ICI carries only halo rows.

Practical notes:
 - shard H only (1-D 'sp' mesh): W stays full-width for lane efficiency.
 - H/num_devices should stay a multiple of 2^num_scales so the encoder's
   stride-2 ladder divides evenly on every shard.
 - this is a capability the reference cannot express at all (single-GPU,
   largest input 706x774 — SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dip_tpu.fit.engine import Engine, FitConfig, FitState


def make_spatial_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("sp",))


def _shard_image(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P(None, "sp", None, None)))


def _replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), tree
    )


class SpatialEngine:
    """Engine wrapper that runs one fit with H-sharded activations."""

    def __init__(self, model, loss_fn, cfg: FitConfig, metrics_fn=None,
                 mesh: Mesh | None = None):
        self.engine = Engine(model, loss_fn, cfg, metrics_fn)
        self.cfg = self.engine.cfg
        self.mesh = mesh or make_spatial_mesh()
        self._chunk_jit = None

    def init_state(self, key, z, aux: Any = None) -> FitState:
        n_sp = self.mesh.devices.size
        assert z.shape[1] % n_sp == 0, (
            f"image height {z.shape[1]} must divide by mesh size {n_sp}"
        )
        state = self.engine.init_state(key, z, aux)
        # params/opt replicate; image-shaped leaves shard along H
        state = FitState(
            params=_replicate(state.params, self.mesh),
            opt_state=_replicate(state.opt_state, self.mesh),
            z=_shard_image(state.z, self.mesh),
            ema_out=_shard_image(state.ema_out, self.mesh),
            key=_replicate(state.key, self.mesh),
            snapshot=_replicate(state.snapshot, self.mesh),
            last_track=_replicate(state.last_track, self.mesh),
            step=_replicate(state.step, self.mesh),
        )
        return state

    def shard_aux(self, aux):
        """Shard image-shaped aux leaves (rank-4) along H; replicate rest."""
        def put(v):
            v = jax.numpy.asarray(v)
            if v.ndim == 4:
                return _shard_image(v, self.mesh)
            return jax.device_put(v, NamedSharding(self.mesh, P()))
        return jax.tree_util.tree_map(put, aux)

    def run(self, state: FitState, aux, callback=None):
        aux = self.shard_aux(aux)
        if self._chunk_jit is None:
            self._chunk_jit = jax.jit(
                lambda s, a, n: self.engine.run_chunk(s, a, n),
                static_argnums=(2,),
                donate_argnums=(0,),
            )
        remaining = self.cfg.num_iter
        hist_chunks = []
        it = 0
        while remaining > 0:
            n = min(self.cfg.log_every, remaining)
            state, hist = self._chunk_jit(state, aux, n)
            remaining -= n
            it += n
            if callback is not None:
                host = jax.tree_util.tree_map(np.asarray, hist)
                hist_chunks.append(host)
                callback(it, host, state)
            else:
                hist_chunks.append(hist)
        history = jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *hist_chunks
        )
        return state, history

    def render(self, state: FitState):
        return jax.jit(self.engine.render)(state)
