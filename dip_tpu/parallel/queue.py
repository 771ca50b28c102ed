"""Single-chip multi-image scheduling: a round-robin fit queue.

BASELINE.md's north star is many images in flight.  Across chips that is
shard_map (parallel/batch.py) — but on ONE chip, vmap-folding independent
nets into grouped convs is a measured ~14x anti-pattern on this hardware
(parallel/batch.py docstring).  The TPU-native answer for one chip is
*pipelining, not fusing*: each fit stays its own fully-optimized scanned
program, and the queue round-robins log_every-sized chunks across fits.
JAX's async dispatch then overlaps fit B's enqueued chunk with fit A's
device execution and hides all host-side work (history transfer, callbacks,
checkpointing) behind device compute.  Aggregate throughput matches the
single-fit it/s (the chip is saturated either way) while N images make
progress together and emit interleaved live logs — same UX as the mesh
path, no 14x tax.

Fits with identical (model, cfg, shapes) share one compiled chunk program
via Engine's jit cache; heterogeneous fits just compile once each.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import types
from typing import Any, Callable

import jax
import numpy as np

from dip_tpu.fit.engine import Engine, FitState
from dip_tpu.tasks.base import TaskSpec, make_input


def _val_key(v):
    """Hashable descriptor of a closure-cell value, structural where safe."""
    if isinstance(v, (int, float, str, bool, bytes, type(None))):
        return v
    if isinstance(v, (types.FunctionType, functools.partial)):
        return _fn_key(v)
    if isinstance(v, (tuple, list)):
        return ("seq", tuple(_val_key(x) for x in v))
    try:
        arr = np.asarray(v)
        if arr.dtype != object:
            # arrays closed over by loss/metrics closures (e.g. the PSNR
            # target in default_metrics) become CONSTANTS in the compiled
            # program, so sharing requires equal contents — hash them
            return ("array", arr.shape, str(arr.dtype),
                    hashlib.sha1(arr.tobytes()).hexdigest())
    except Exception:
        pass
    # Identity fallback: a closure over a custom object we can't inspect.
    # Correct (the cache dict keeps the object alive, so an id() can never
    # be recycled into a false hit) but conservative — two structurally
    # identical specs closing over two equal-but-distinct such objects will
    # silently compile twice. Opt out by giving the object a
    # __dip_cache_key__() -> hashable method describing its trace-relevant
    # content.
    key_fn = getattr(v, "__dip_cache_key__", None)
    if callable(key_fn):
        return ("custom", type(v).__module__, type(v).__qualname__, key_fn())
    return v


def _fn_key(fn):
    """Structural cache key for a loss/metrics callable.

    Two separately-constructed closures get the same key iff they trace the
    same computation: same code object + module, and equal closed-over
    values (arrays by content hash — a closure over a different target is a
    DIFFERENT compiled program, since the trace embeds it as a constant).
    Exotic callables fall back to object identity, held live by the cache
    dict, so id()-reuse-after-GC aliasing cannot occur.
    """
    if fn is None:
        return None
    if isinstance(fn, functools.partial):
        return ("partial", _fn_key(fn.func),
                tuple(_val_key(a) for a in fn.args),
                tuple(sorted((k, _val_key(v))
                             for k, v in fn.keywords.items())))
    if isinstance(fn, types.FunctionType):
        try:
            cells = tuple(_val_key(c.cell_contents)
                          for c in (fn.__closure__ or ()))
        except ValueError:  # empty cell
            return fn
        return ("fn", fn.__module__, fn.__code__, cells,
                tuple(_val_key(d) for d in (fn.__defaults__ or ())))
    return fn


def engine_cache_key(spec: TaskSpec):
    """Structural Engine-sharing key for a TaskSpec (model by dataclass
    fields, cfg by value, callables by code + closure contents)."""
    return (type(spec.model), repr(spec.model), spec.cfg,
            _fn_key(spec.loss_fn), _fn_key(spec.metrics_fn))


@dataclasses.dataclass
class _Job:
    name: str
    engine: Engine
    state: FitState
    aux: Any
    remaining: int
    it: int = 0
    hist_chunks: list = dataclasses.field(default_factory=list)
    postprocess: Callable | None = None


class FitQueue:
    """Run many independent DIP fits concurrently on one device.

    add() TaskSpecs (or raw engine/state/aux triples via add_raw), then
    run(). Returns per-job (output, state, history) keyed by job name.
    """

    def __init__(self, callback: Callable[[str, int, dict], None] | None = None):
        self.jobs: list[_Job] = []
        self.callback = callback
        self._engines: dict[Any, Engine] = {}

    def add(self, spec: TaskSpec, key: jax.Array, name: str | None = None):
        k_z, k_fit = jax.random.split(key)
        z = make_input(spec, k_z)
        # Share Engine objects (and therefore compiled chunk programs)
        # between jobs with equivalent (model, cfg, loss, metrics) — the
        # key is structural (engine_cache_key), so two separately-built
        # identical specs share one compiled program.
        cache_key = engine_cache_key(spec)
        eng = self._engines.get(cache_key)
        if eng is None:
            eng = Engine(spec.model, spec.loss_fn, spec.cfg, spec.metrics_fn)
            self._engines[cache_key] = eng
        state = eng.init_state(k_fit, z, spec.aux, spec.extra_params)
        self.jobs.append(_Job(
            name=name or f"{spec.name}#{len(self.jobs)}",
            engine=eng, state=state, aux=spec.aux,
            remaining=spec.cfg.num_iter, postprocess=spec.postprocess,
        ))
        return self

    def run(self) -> dict[str, tuple[Any, FitState, dict]]:
        active = [j for j in self.jobs if j.remaining > 0]
        while active:
            # round-robin one chunk per job: enqueueing all chunks before
            # blocking lets XLA pipeline them back-to-back on device
            for job in active:
                n = min(job.engine.cfg.log_every, job.remaining)
                chunk = job.engine._get_chunk_jit()
                job.state, hist = chunk(job.state, job.aux, n)
                job.remaining -= n
                job.it += n
                job.hist_chunks.append(hist)
            if self.callback is not None:
                for job in active:
                    host = jax.tree_util.tree_map(np.asarray,
                                                  job.hist_chunks[-1])
                    job.hist_chunks[-1] = host
                    self.callback(job.name, job.it, host)
            active = [j for j in active if j.remaining > 0]

        results = {}
        for job in self.jobs:
            history = jax.tree_util.tree_map(
                lambda *xs: np.concatenate([np.asarray(x) for x in xs]),
                *job.hist_chunks,
            )
            out = job.engine.render(job.state)
            if job.postprocess is not None:
                out = job.postprocess(out)
            results[job.name] = (out, job.state, history)
        return results
