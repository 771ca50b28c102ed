"""Batched multi-image fitting: vmap across images, shard_map across chips.

The reference fits one image per GPU process (SURVEY.md §5: no distributed
code at all).  Here a batch of independent DIP problems runs as ONE compiled
program: `vmap` maps the engine's scan body over the image axis and
`jax.shard_map` splits that axis over a 1-D device mesh.  shard_map (not
sharding annotations alone) is the right tool because vmap lowers the
per-image convolutions into grouped convs with the batch folded into feature
groups — a form XLA's SPMD partitioner refuses to split — whereas shard_map
just runs the unpartitioned per-shard program on each chip's local images.
Zero collectives in the hot loop; 8 images on a v5e-8 cost the wall-clock
of one.

All images in a batch must share a static shape (group by resolution; the
bench/eval harnesses do), and the batch size must divide by the mesh size.

Size the batch to ONE image per device: vmap's grouped-conv lowering is slow
on the MXU when multiple per-image nets fold into one chip's convolutions
(measured ~14x aggregate slowdown at b=4 on one v5e core), so images beyond
the mesh size are better run as sequential batches.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from dip_tpu.fit.engine import Engine, FitConfig, FitState, unalias
from dip_tpu.parallel.mesh import shard_batch


class BatchEngine:
    """vmapped + shard_mapped wrapper around Engine.

    All per-problem leaves (keys, z, aux) must have a leading batch axis of
    the same size. With `mesh`, that axis is sharded over the mesh's 'data'
    axis and each device scans its local sub-batch independently.
    """

    def __init__(self, model, loss_fn, cfg: FitConfig, metrics_fn=None,
                 mesh=None, axis: str = "data"):
        self.engine = Engine(model, loss_fn, cfg, metrics_fn)
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self._chunk_jit = None

    def init_state(self, keys: jax.Array, zs: jax.Array, auxs: Any = None,
                   extra_params: Any = None) -> FitState:
        """`extra_params`: optional batched pytree of additional trainable
        leaves (leading axis = batch), e.g. one learnable downsampler kernel
        per image — same contract as Engine.init_state's extra_params."""
        if self.mesh is not None:
            n = self.mesh.devices.size
            assert keys.shape[0] % n == 0, (
                f"batch {keys.shape[0]} must divide by mesh size {n}"
            )
        if extra_params is None:
            init = jax.jit(jax.vmap(lambda k, z: self.engine.init_state(k, z)))
            state = unalias(init(keys, zs))
        else:
            init = jax.jit(jax.vmap(
                lambda k, z, e: self.engine.init_state(k, z, extra_params=e)))
            state = unalias(init(keys, zs, extra_params))
        if self.mesh is not None:
            state = shard_batch(state, self.mesh, self.axis)
        return state

    def _chunk(self):
        if self._chunk_jit is None:
            def scan_local(state, aux, length):
                def body(s, _):
                    return jax.vmap(self.engine.step, in_axes=(0, 0))(s, aux)
                return jax.lax.scan(body, state, None, length=length)

            if self.mesh is None:
                run = scan_local
            else:
                def run(state, aux, length):
                    f = jax.shard_map(
                        partial(scan_local, length=length),
                        mesh=self.mesh,
                        in_specs=(P(self.axis), P(self.axis)),
                        out_specs=(P(self.axis), P(None, self.axis)),
                        check_vma=False,
                    )
                    return f(state, aux)

            self._chunk_jit = jax.jit(run, static_argnums=(2,),
                                      donate_argnums=(0,))
        return self._chunk_jit

    def run(self, state: FitState, auxs: Any,
            callback: Callable[[int, dict, FitState], None] | None = None):
        if self.mesh is not None:
            auxs = shard_batch(auxs, self.mesh, self.axis)
        chunk = self._chunk()
        remaining = self.cfg.num_iter
        it = 0
        hist_chunks = []
        while remaining > 0:
            n = min(self.cfg.log_every, remaining)
            state, hist = chunk(state, auxs, n)
            remaining -= n
            it += n
            if callback is not None:
                hist_chunks.append(jax.tree_util.tree_map(np.asarray, hist))
                callback(it, hist_chunks[-1], state)
            else:
                hist_chunks.append(hist)  # stay on device; chunks pipeline
        # history leaves: (length, batch) per chunk -> (num_iter, batch)
        history = jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs]),
            *hist_chunks,
        )
        return state, history

    def render(self, state: FitState) -> jax.Array:
        if self.mesh is None:
            return jax.jit(jax.vmap(self.engine.render))(state)
        f = jax.shard_map(
            jax.vmap(self.engine.render),
            mesh=self.mesh,
            in_specs=(P(self.axis),),
            out_specs=P(self.axis),
            check_vma=False,
        )
        return jax.jit(f)(state)
