"""Uniform task protocol.

A TaskSpec bundles everything a DIP workload needs: the generator, the fit
config (the notebook recipe), the loss over the degraded observation, and
optional on-device metrics.  tasks.run_task() then owns the generic flow the
notebooks repeat by hand: make the input z -> fit -> render
(SURVEY.md §1 L4: every notebook is load -> degrade -> net -> closure ->
optimize -> plot).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from dip_tpu.fit.engine import Engine, FitConfig
from dip_tpu.utils.noise import get_noise


@dataclasses.dataclass
class TaskSpec:
    name: str
    model: Any
    cfg: FitConfig
    loss_fn: Callable
    aux: Any
    metrics_fn: Callable | None = None
    input_depth: int = 32
    input_method: str = "noise"
    input_var: float = 0.1
    spatial_size: tuple[int, int] | None = None
    net_input: jnp.ndarray | None = None     # explicit z (flash/no-flash)
    extra_params: dict | None = None          # e.g. learnable downsampler
    postprocess: Callable[[jnp.ndarray], Any] | None = None


def make_input(spec: TaskSpec, key: jax.Array) -> jnp.ndarray:
    if spec.net_input is not None:
        return jnp.asarray(spec.net_input)
    assert spec.spatial_size is not None, "spatial_size or net_input required"
    return get_noise(
        key, spec.input_depth, spec.input_method, spec.spatial_size,
        var=spec.input_var,
    )


def run_task(spec: TaskSpec, key: jax.Array, callback=None):
    """Fit the task and return (output image NHWC, state, history)."""
    k_z, k_fit = jax.random.split(key)
    z = make_input(spec, k_z)
    eng = Engine(spec.model, spec.loss_fn, spec.cfg, spec.metrics_fn)
    state = eng.init_state(k_fit, z, spec.aux, spec.extra_params)
    state, history = eng.run(state, spec.aux, callback)
    out = eng.render(state)
    if spec.postprocess is not None:
        out = spec.postprocess(out)
    return out, state, history
