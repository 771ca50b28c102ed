"""Checkpoint / resume for DIP fits (orbax-backed).

The reference has no fit-state checkpointing at all (SURVEY.md §5) — only
pretrained-weight downloads.  Long fits (barbara: 11000 iters) and multi-hour
eval sweeps deserve resumability: we persist the full FitState pytree
(params, optimizer moments, EMA buffer, RNG key, backtracking snapshot, step
counter) so a resumed fit is bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import os


import jax
import numpy as np

from dip_tpu.fit.engine import FitState, unalias


def save_fit_state(path: str, state: FitState) -> None:
    """Persist a FitState. Uses orbax if available, else a npz fallback.

    Overwrite-safe: repeated saves to the same path (the CLI checkpoints at
    every log boundary) replace the previous checkpoint atomically rather
    than raising orbax's "destination already exists" error.
    """
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            jax.tree_util.tree_map(np.asarray, _keyless(state)),
            force=True,  # overwrite: periodic saves reuse one path
        )
        ckptr.wait_until_finished()
    except ImportError:
        flat, treedef = jax.tree_util.tree_flatten(_keyless(state))
        np.savez(path + ".npz", *[np.asarray(x) for x in flat])


def restore_fit_state(path: str, template: FitState) -> FitState:
    """Restore into the structure of `template` (an init_state result)."""
    path = os.path.abspath(path)
    tmpl = _keyless(template)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            path, jax.tree_util.tree_map(np.asarray, tmpl)
        )
    except ImportError:
        flat_t, treedef = jax.tree_util.tree_flatten(tmpl)
        data = np.load(path + ".npz")
        restored = jax.tree_util.tree_unflatten(
            treedef, [data[k] for k in data.files]
        )
    state = _rekey(restored, template)
    return unalias(state)


def _keyless(state: FitState):
    """jax PRNG keys aren't directly serializable: store raw key data."""
    return state._replace(key=jax.random.key_data(state.key))


def _rekey(restored, template: FitState) -> FitState:
    # Raw key-data shapes differ per PRNG impl (threefry: (2,) uint32,
    # rbg/unsafe_rbg: (4,)). The checkpoint predates impl recording, so
    # recover the impl from the saved data's shape; only when that is
    # ambiguous-free fall back to the template's impl. This keeps
    # checkpoints written under an older FitConfig.rng_impl default
    # (threefry) restorable into engines built with the current default
    # (rbg) and vice versa, instead of failing wrap_key_data on shape.
    key_data = jax.numpy.asarray(restored.key)
    impl = jax.random.key_impl(template.key)
    tmpl_shape = jax.random.key_data(template.key).shape
    if key_data.shape != tmpl_shape:
        by_shape = {(2,): "threefry2x32", (4,): "rbg"}
        if key_data.shape not in by_shape:
            raise ValueError(
                f"checkpoint PRNG key data has shape {key_data.shape}; "
                f"expected {tmpl_shape} for impl {impl} (or a known impl's "
                "shape to recover from)")
        impl = by_shape[key_data.shape]
    key = jax.random.wrap_key_data(key_data, impl=impl)
    return FitState(
        params=jax.tree_util.tree_map(jax.numpy.asarray, restored.params),
        opt_state=jax.tree_util.tree_map(jax.numpy.asarray, restored.opt_state),
        z=jax.numpy.asarray(restored.z),
        ema_out=jax.numpy.asarray(restored.ema_out),
        key=key,
        snapshot=jax.tree_util.tree_map(jax.numpy.asarray, restored.snapshot),
        last_track=jax.numpy.asarray(restored.last_track),
        step=jax.numpy.asarray(restored.step),
    )
