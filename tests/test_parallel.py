"""Multi-device batching: vmap semantics on the default backend, full mesh
sharding in a CPU subprocess with 8 virtual devices (the driver's
dryrun_multichip contract runs the same path)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_tpu.fit.engine import FitConfig
from dip_tpu.models import Skip
from dip_tpu.ops.losses import mse, psnr
from dip_tpu.parallel.batch import BatchEngine
from dip_tpu.utils.noise import get_noise


def test_batch_engine_vmap_single_device():
    """Two independent problems in one vmapped scan: each must fit its own
    target, and the trajectories must differ."""
    b, s = 2, 16
    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    cfg = FitConfig(num_iter=40, lr=0.02, log_every=40)
    beng = BatchEngine(
        model, lambda p, o, a: mse(o, a), cfg,
        metrics_fn=lambda o, e, a: {"psnr_track": psnr(o, a)},
    )
    keys = jax.random.split(jax.random.key(0), b)
    zs = jax.vmap(lambda k: get_noise(k, 4, "noise", (s, s)))(keys)
    targets = jnp.stack([jnp.full((1, s, s, 3), 0.25),
                         jnp.full((1, s, s, 3), 0.75)])
    state = beng.init_state(keys, zs)
    state, hist = beng.run(state, targets)
    assert hist["loss"].shape == (40, b)
    assert (hist["loss"][-1] < hist["loss"][0]).all()
    outs = np.asarray(beng.render(state))
    assert outs.shape == (b, 1, s, s, 3)
    # each member drifts toward its own constant target
    assert abs(outs[0].mean() - 0.25) < abs(outs[1].mean() - 0.25)


def test_batch_engine_extra_params():
    """Batched fits can carry per-image extra trainable leaves (the 'down'
    channel of opt_over): each image's extra param must train toward its own
    optimum inside the vmapped scan."""
    b, s = 2, 16
    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    cfg = FitConfig(num_iter=60, lr=0.05, log_every=60)

    # out is scaled by a learnable per-image gain before the loss — a
    # minimal stand-in for a learnable degradation operator
    def loss_fn(p, out, aux):
        return mse(out * p["down"]["gain"], aux)

    beng = BatchEngine(model, loss_fn, cfg)
    keys = jax.random.split(jax.random.key(0), b)
    zs = jax.vmap(lambda k: get_noise(k, 4, "noise", (s, s)))(keys)
    targets = jnp.stack([jnp.full((1, s, s, 3), 0.2),
                         jnp.full((1, s, s, 3), 0.8)])
    extra = {"down": {"gain": jnp.full((b,), 0.5)}}
    state = beng.init_state(keys, zs, extra_params=extra)
    assert state.params["down"]["gain"].shape == (b,)
    state, hist = beng.run(state, targets)
    assert (hist["loss"][-1] < hist["loss"][0]).all()
    gains = np.asarray(state.params["down"]["gain"])
    assert not np.allclose(gains, 0.5)  # the extra leaves actually trained
    assert gains[0] != gains[1]         # independently per image


def test_fit_queue_single_device():
    """Round-robin multi-fit scheduling on one device: every job converges
    to its own target, histories are full-length, and jobs with identical
    configs share one Engine (one compiled program)."""
    from dip_tpu.fit.engine import FitConfig
    from dip_tpu.parallel.queue import FitQueue
    from dip_tpu.tasks.base import TaskSpec

    s = 16
    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    cfg = FitConfig(num_iter=40, lr=0.02, log_every=20)
    loss_fn = lambda p, o, a: mse(o, a)  # noqa: E731

    def spec(level):
        return TaskSpec(
            name=f"const{level}", model=model, cfg=cfg, loss_fn=loss_fn,
            aux=jnp.full((1, s, s, 3), level),
            metrics_fn=lambda o, e, a: {"psnr_track": psnr(o, a)},
            input_depth=4, spatial_size=(s, s),
        )

    seen = []
    q = FitQueue(callback=lambda name, it, hist: seen.append((name, it)))
    q.add(spec(0.25), jax.random.key(0), name="a")
    q.add(spec(0.75), jax.random.key(1), name="b")
    assert len(q._engines) == 1  # identical jobs share one compiled engine
    res = q.run()

    out_a, _, hist_a = res["a"]
    out_b, _, hist_b = res["b"]
    assert hist_a["loss"].shape == (40,)
    assert hist_a["loss"][-1] < hist_a["loss"][0]
    assert hist_b["loss"][-1] < hist_b["loss"][0]
    assert abs(np.asarray(out_a).mean() - 0.25) < 0.15
    assert abs(np.asarray(out_b).mean() - 0.75) < 0.15
    # callbacks interleave: a@20, b@20, a@40, b@40
    assert seen == [("a", 20), ("b", 20), ("a", 40), ("b", 40)]


@pytest.mark.slow
def test_mesh_sharded_dryrun_subprocess():
    """Run the driver's dryrun_multichip(8) on a fake 8-device CPU backend in
    a subprocess (can't re-init the in-process backend)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("DIP_TEST_PLATFORM", None)
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK" in res.stdout


@pytest.mark.slow
def test_sharded_eval_sweep_subprocess(tmp_path):
    """Fleet SR eval: 8 images, one per virtual device, as one BatchEngine
    program sharded over the 8-device CPU mesh (the BASELINE.md '8 images
    concurrently' capability)."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(8):
        img = rng.uniform(0.2, 0.8, (64, 64, 3))
        yy, xx = np.mgrid[0:64, 0:64] / 64
        img = (img * 0.2 + 0.8 * np.stack(
            [np.sin(xx * (3 + i)) * 0.5 + 0.5, yy, xx], -1)).clip(0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            tmp_path / f"img{i}.png")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import numpy as np;"
        "from dip_tpu.parallel.mesh import make_mesh;"
        "from dip_tpu.eval.sr_eval import eval_sr_dataset_sharded;"
        f"res = eval_sr_dataset_sharded({str(tmp_path)!r}, make_mesh(),"
        "       factor=4, num_iter=12, verbose=False);"
        "assert len(res.per_image) == 8, res.per_image;"
        "assert all(np.isfinite(v) for v in res.per_image.values());"
        "print('OK', round(res.mean_psnr_y, 2))"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK" in res.stdout


@pytest.mark.slow
def test_cli_eval_sr_fleet_subprocess(tmp_path):
    """`eval-sr --fleet` reaches the sharded fleet path from the product
    surface (VERDICT r2 weak 5): 8 images over the 8-device CPU mesh via
    the CLI entry point."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(1)
    for i in range(8):
        yy, xx = np.mgrid[0:64, 0:64] / 64
        img = (rng.uniform(0.2, 0.8, (64, 64, 3)) * 0.2 + 0.8 * np.stack(
            [np.cos(xx * (2 + i)) * 0.5 + 0.5, xx, yy], -1)).clip(0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            tmp_path / f"img{i}.png")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from dip_tpu.cli.main import main;"
        f"main(['eval-sr', '--dir', {str(tmp_path)!r}, '--fleet',"
        "      '--num-iter', '8'])"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "mean PSNR-Y" in res.stdout


@pytest.mark.slow
def test_spatial_sharding_subprocess():
    """One image fit with H sharded over 8 virtual CPU devices: XLA SPMD
    inserts conv halo exchanges; loss must decrease."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import jax.numpy as jnp, numpy as np;"
        "from dip_tpu.fit.engine import FitConfig;"
        "from dip_tpu.models import Skip;"
        "from dip_tpu.ops.losses import mse;"
        "from dip_tpu.parallel.spatial import SpatialEngine, make_spatial_mesh;"
        "from dip_tpu.utils.noise import get_noise;"
        "mesh = make_spatial_mesh(8);"
        "m = Skip(num_channels_down=[8], num_channels_up=[8],"
        "         num_channels_skip=[2]);"
        "cfg = FitConfig(num_iter=20, lr=0.02, log_every=20);"
        "t = jnp.asarray(np.random.default_rng(0).random((1,64,64,3)),"
        "                jnp.float32);"
        "e = SpatialEngine(m, lambda p,o,a: mse(o,a), cfg, mesh=mesh);"
        "z = get_noise(jax.random.key(1), 4, 'noise', (64,64));"
        "s = e.init_state(jax.random.key(0), z);"
        "s, h = e.run(s, t);"
        "assert h['loss'][-1] < h['loss'][0];"
        "print('OK')"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK" in res.stdout


@pytest.mark.slow
def test_sharded_eval_subbatches_groups_larger_than_mesh(tmp_path):
    """A shape group larger than the mesh runs as sequential mesh-size
    sub-batches (one image per device — parallel/batch.py header), and
    every image still gets its own score."""
    from PIL import Image

    from dip_tpu.eval.sr_eval import eval_sr_dataset_sharded

    rng = np.random.default_rng(2)
    for i in range(3):
        yy, xx = np.mgrid[0:64, 0:64] / 64
        img = (rng.uniform(0.2, 0.8, (64, 64, 3)) * 0.2 + 0.8 * np.stack(
            [np.sin(xx * (4 + i)) * 0.5 + 0.5, yy, xx], -1)).clip(0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            tmp_path / f"img{i}.png")

    res = eval_sr_dataset_sharded(str(tmp_path), mesh=None, factor=4,
                                  num_iter=10, verbose=False)
    assert len(res.per_image) == 3, res.per_image
    assert all(np.isfinite(v) for v in res.per_image.values())
