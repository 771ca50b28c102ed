"""Batched multi-image fitting: vmap across images, shard across chips.

The reference fits one image per GPU process (SURVEY.md §5: no distributed
code at all).  Here a batch of independent DIP problems runs as ONE compiled
program: `vmap` maps the engine's scan body over the image axis, and a 1-D
device mesh shards that axis, so 8 images on a v5e-8 cost the wall-clock of
one.  Requires all images in a batch to share a static shape (group by
resolution; the bench/eval harnesses do).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np

from dip_tpu.fit.engine import Engine, FitConfig, FitState
from dip_tpu.parallel.mesh import make_mesh, shard_batch


class BatchEngine:
    """vmapped + sharded wrapper around Engine.

    All per-problem leaves (keys, z, aux) must have a leading batch axis of
    the same size.  If `mesh` is given, batch arrays are sharded over its
    'data' axis and XLA partitions the whole scan SPMD-style.
    """

    def __init__(self, model, loss_fn, cfg: FitConfig, metrics_fn=None, mesh=None):
        self.engine = Engine(model, loss_fn, cfg, metrics_fn)
        self.cfg = cfg
        self.mesh = mesh
        self._chunk_jit = None

    def init_state(self, keys: jax.Array, zs: jax.Array, auxs: Any = None) -> FitState:
        init = jax.jit(jax.vmap(lambda k, z: self.engine.init_state(k, z)))
        from dip_tpu.fit.engine import unalias

        state = unalias(init(keys, zs))
        if self.mesh is not None:
            state = shard_batch(state, self.mesh)
        return state

    def _chunk(self):
        if self._chunk_jit is None:
            def run(state, aux, length):
                def body(s, _):
                    return jax.vmap(self.engine.step, in_axes=(0, 0))(s, aux)
                return jax.lax.scan(body, state, None, length=length)

            self._chunk_jit = jax.jit(run, static_argnums=(2,), donate_argnums=(0,))
        return self._chunk_jit

    def run(self, state: FitState, auxs: Any,
            callback: Callable[[int, dict, FitState], None] | None = None):
        if self.mesh is not None:
            auxs = shard_batch(auxs, self.mesh)
        chunk = self._chunk()
        remaining = self.cfg.num_iter
        it = 0
        hist_chunks = []
        while remaining > 0:
            n = min(self.cfg.log_every, remaining)
            state, hist = chunk(state, auxs, n)
            remaining -= n
            it += n
            hist_chunks.append(jax.tree_util.tree_map(np.asarray, hist))
            if callback is not None:
                callback(it, hist_chunks[-1], state)
        # history leaves have shape (num_chunks*, length, batch) -> (iters, batch)
        history = jax.tree_util.tree_map(lambda *xs: np.concatenate(xs), *hist_chunks)
        return state, history

    def render(self, state: FitState) -> jax.Array:
        return jax.jit(jax.vmap(self.engine.render))(state)
