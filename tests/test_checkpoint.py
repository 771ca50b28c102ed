"""Checkpoint/resume: a resumed fit continues from the saved step."""

import pytest
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from dip_tpu.fit.checkpoint import restore_fit_state, save_fit_state
from dip_tpu.fit.engine import Engine, FitConfig
from dip_tpu.models import Skip
from dip_tpu.ops.losses import mse
from dip_tpu.utils.noise import get_noise


def test_save_restore_roundtrip():
    target = jnp.full((1, 16, 16, 3), 0.5)
    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    cfg = FitConfig(num_iter=20, lr=0.01, exp_weight=0.99, log_every=10)
    eng = Engine(model, lambda p, o, a: mse(o, a), cfg)
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    state = eng.init_state(jax.random.key(0), z)
    state, _ = eng.run(state, target)
    assert int(state.step) == 20

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_fit_state(path, state)
        template = eng.init_state(jax.random.key(0), z)
        restored = restore_fit_state(path, template)

    assert int(restored.step) == 20
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed state must keep optimizing without error (incl. donation)
    restored, hist = eng.run(restored, target)
    assert int(restored.step) == 40
    assert np.isfinite(hist["loss"]).all()


def test_save_twice_overwrites():
    """Regression: periodic saves reuse one path; orbax must not raise
    'destination already exists' on the second save (round-1 crash)."""
    target = jnp.full((1, 16, 16, 3), 0.5)
    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    cfg = FitConfig(num_iter=4, lr=0.01, log_every=2)
    eng = Engine(model, lambda p, o, a: mse(o, a), cfg)
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    state = eng.init_state(jax.random.key(0), z)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_fit_state(path, state)
        state, _ = eng.run(state, target)
        save_fit_state(path, state)  # raised ValueError before the fix
        restored = restore_fit_state(path, eng.init_state(jax.random.key(0), z))
    assert int(restored.step) == 4  # second save won


@pytest.mark.slow
def test_cli_fit_save_ckpt_end_to_end(tmp_path):
    """cli.main fit --save-ckpt across >=2 log chunks (the crash scenario)."""
    from PIL import Image

    from dip_tpu.cli.main import main

    img = (np.random.default_rng(0).uniform(size=(32, 32, 3)) * 255)
    img_path = tmp_path / "tiny.png"
    Image.fromarray(img.astype(np.uint8)).save(img_path)
    out_path = tmp_path / "out.png"
    ckpt_path = tmp_path / "ckpt"

    main(["fit", "--task", "denoise", "--image", str(img_path),
          "--sigma", "25", "--num-iter", "4", "--log-every", "2",
          "--save-ckpt", str(ckpt_path), "--out", str(out_path)])
    assert out_path.exists()
    assert ckpt_path.exists() or ckpt_path.with_suffix(".npz").exists()
