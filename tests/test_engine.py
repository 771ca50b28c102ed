"""Fit-engine tests: convergence smoke, jitter, EMA, backtracking, LBFGS."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dip_tpu.fit.engine import Engine, FitConfig, default_metrics, fit
from dip_tpu.models import Skip, Identity
from dip_tpu.ops.losses import mse, masked_mse, psnr
from dip_tpu.utils.noise import get_noise


def _tiny_skip():
    return Skip(
        num_channels_down=[8, 16],
        num_channels_up=[8, 16],
        num_channels_skip=[4, 4],
        pad="reflection",
        upsample_mode="nearest",
    )


def _toy_image(h=32, w=32):
    """Smooth synthetic target — easy for a conv net to fit."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [np.sin(xx / 7) * 0.5 + 0.5, np.cos(yy / 5) * 0.5 + 0.5, (xx + yy) / (h + w)],
        axis=-1,
    )
    return jnp.asarray(img[None])


@pytest.mark.slow
def test_fit_denoising_smoke():
    """Loss must drop and PSNR climb within a few hundred iters (the
    TPU-framework analog of the reference's README convergence check)."""
    target = _toy_image()
    cfg = FitConfig(num_iter=200, lr=0.01, reg_noise_std=1.0 / 30,
                    exp_weight=0.99, log_every=50)
    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    out, state, hist = fit(
        _tiny_skip(),
        lambda p, out, aux: mse(out, aux),
        cfg,
        jax.random.key(0),
        z,
        aux=target,
        metrics_fn=default_metrics(target),
    )
    assert hist["loss"].shape == (200,)
    assert hist["loss"][-10:].mean() < hist["loss"][:10].mean() * 0.5
    assert float(psnr(out, target)) > 15.0
    assert int(state.step) == 200


def test_fit_masked_inpainting_smoke():
    """Masked MSE fit must also improve PSNR on the *hidden* region."""
    target = _toy_image()
    mask = np.ones((1, 32, 32, 1), np.float32)
    mask[:, 12:20, 12:20] = 0.0
    mask = jnp.asarray(mask)
    cfg = FitConfig(num_iter=300, lr=0.01, log_every=100)
    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))

    out, state, hist = fit(
        _tiny_skip(),
        lambda p, out, aux: masked_mse(out, aux["img"], aux["mask"]),
        cfg,
        jax.random.key(0),
        z,
        aux={"img": target, "mask": mask},
    )
    hole_psnr = float(psnr(out * (1 - mask), target * (1 - mask)))
    assert hole_psnr > 20.0


@pytest.mark.slow
def test_ema_initialized_to_first_output():
    target = _toy_image()
    cfg = FitConfig(num_iter=1, lr=0.01, exp_weight=0.99, log_every=1)
    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    eng = Engine(_tiny_skip(), lambda p, o, a: mse(o, a), cfg)
    state = eng.init_state(jax.random.key(0), z)
    state2, _ = eng.step(state, target)
    # after 1 step the EMA equals that step's output exactly
    assert not np.allclose(np.asarray(state2.ema_out), 0)


def test_ema_exact_recurrence():
    """ema_t = w*ema_{t-1} + (1-w)*out_t with ema_0 = out_0, verified
    numerically over 3 steps (denoising.ipynb cell 10 semantics)."""
    target = _toy_image(16, 16)
    w = 0.9
    cfg = FitConfig(num_iter=3, lr=0.01, exp_weight=w, log_every=3,
                    reg_noise_std=0.2)  # jitter makes out_t vary per step

    def metrics_fn(out, ema, aux):
        # mean is linear, so the EMA recurrence holds exactly on means
        return {"m_out": jnp.mean(out), "m_ema": jnp.mean(ema)}

    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    _, _, hist = fit(model, lambda p, o, a: mse(o, a), cfg,
                     jax.random.key(0), z, aux=target, metrics_fn=metrics_fn)
    m_out = np.asarray(hist["m_out"], np.float64)
    m_ema = np.asarray(hist["m_ema"], np.float64)
    np.testing.assert_allclose(m_ema[0], m_out[0], rtol=1e-5)
    np.testing.assert_allclose(m_ema[1], w * m_ema[0] + (1 - w) * m_out[1],
                               rtol=1e-5)
    np.testing.assert_allclose(m_ema[2], w * m_ema[1] + (1 - w) * m_out[2],
                               rtol=1e-5)
    # and the steps genuinely differ (jitter applied), so this isn't vacuous
    assert abs(m_out[1] - m_out[0]) > 0


def test_backtracking_restores_snapshot():
    target = _toy_image()
    cfg = FitConfig(num_iter=50, lr=0.01, backtrack=True, log_every=25)
    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    eng = Engine(
        _tiny_skip(),
        lambda p, o, a: mse(o, a),
        cfg,
        metrics_fn=lambda o, e, a: {"psnr_track": psnr(o, a)},
    )
    state = eng.init_state(jax.random.key(0), z, target)
    state, hist = eng.run(state, target)
    assert "backtracked" in hist
    # a healthy run should essentially never backtrack
    assert hist["backtracked"].sum() <= 2


def test_optimize_over_input_identity():
    """sr_prior_effect mode: identity net, optimize raw pixels directly."""
    target = _toy_image()
    cfg = FitConfig(num_iter=300, lr=0.05, opt_input=True, log_every=100)
    z = get_noise(jax.random.key(1), 3, "noise", (32, 32), var=0.5)
    out, state, hist = fit(
        Identity(), lambda p, o, a: mse(o, a), cfg, jax.random.key(0), z, aux=target
    )
    assert float(psnr(out, target)) > 25.0


def test_param_noise_runs():
    target = _toy_image()
    cfg = FitConfig(num_iter=20, lr=0.01, param_noise=True, log_every=10)
    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    out, _, hist = fit(
        _tiny_skip(), lambda p, o, a: mse(o, a), cfg, jax.random.key(0), z, aux=target
    )
    assert np.isfinite(hist["loss"]).all()


def test_lbfgs_path():
    target = _toy_image(16, 16)
    cfg = FitConfig(num_iter=30, lr=1.0, optimizer="lbfgs", lbfgs_warmup=20,
                    log_every=30)
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    out, state, hist = fit(
        model, lambda p, o, a: mse(o, a), cfg, jax.random.key(0), z, aux=target
    )
    assert np.isfinite(hist["loss"]).all()
    assert hist["loss"][-1] < hist["loss"][0]


def test_meshgrid_input():
    z = get_noise(jax.random.key(0), 2, "meshgrid", (16, 24))
    assert z.shape == (1, 16, 24, 2)
    np.testing.assert_allclose(float(z[0, 0, -1, 0]), 1.0)
    np.testing.assert_allclose(float(z[0, -1, 0, 1]), 1.0)


def test_mixed_precision_compute_dtype():
    """bf16 forward/backward with f32 master params still converges."""
    target = _toy_image(16, 16)
    cfg = FitConfig(num_iter=60, lr=0.02, log_every=60,
                    compute_dtype="bfloat16")
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    out, state, hist = fit(
        model, lambda p, o, a: mse(o, a), cfg, jax.random.key(0), z, aux=target
    )
    # params stayed f32
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(state.params))
    assert hist["loss"][-1] < hist["loss"][0] * 0.7


def test_reg_noise_schedule():
    """Staged jitter: std selected by step range, falls back past the end."""
    target = _toy_image(16, 16)
    cfg = FitConfig(num_iter=12, lr=0.01, log_every=12,
                    reg_noise_std=0.01,
                    reg_noise_schedule=((4, 0.5), (8, 0.1)))
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    model = Skip(num_channels_down=[8], num_channels_up=[8],
                 num_channels_skip=[2])
    out, state, hist = fit(
        model, lambda p, o, a: mse(o, a), cfg, jax.random.key(0), z, aux=target
    )
    assert np.isfinite(hist["loss"]).all()


def test_reg_noise_schedule_applied_stds():
    """The schedule's std is actually applied per stage: with the Identity
    net (out == z_used) the per-step deviation from the base z measures the
    injected jitter directly."""
    base = get_noise(jax.random.key(1), 3, "noise", (64, 64), var=0.5)
    cfg = FitConfig(num_iter=12, lr=0.0, log_every=12,
                    reg_noise_std=0.01,
                    reg_noise_schedule=((4, 0.5), (8, 0.1)))

    def metrics_fn(out, ema, aux):
        return {"jitter_std": jnp.std(out - aux)}

    _, _, hist = fit(Identity(), lambda p, o, a: mse(o, a) * 0.0, cfg,
                     jax.random.key(0), base, aux=base,
                     metrics_fn=metrics_fn)
    stds = np.asarray(hist["jitter_std"])
    # stage 1 (steps 0-3): std 0.5; stage 2 (4-7): 0.1; past the schedule:
    # fall back to reg_noise_std = 0.01. N=64*64*3 samples -> tight estimate.
    np.testing.assert_allclose(stds[:4], 0.5, rtol=0.05)
    np.testing.assert_allclose(stds[4:8], 0.1, rtol=0.05)
    np.testing.assert_allclose(stds[8:], 0.01, rtol=0.05)


@pytest.mark.slow
def test_rng_impl_rbg():
    """cfg.rng_impl='rbg' swaps the in-loop PRNG (TPU-fast RBG) while
    keeping weight init identical to the default-impl run."""
    target = _toy_image()
    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    outs = {}
    for impl in (None, "rbg"):
        cfg = FitConfig(num_iter=60, lr=0.01, reg_noise_std=1.0 / 30,
                        log_every=30, rng_impl=impl)
        eng = Engine(_tiny_skip(), lambda p, out, aux: mse(out, aux), cfg,
                     default_metrics(target))
        state = eng.init_state(jax.random.key(0), z)
        outs[impl] = state.params["net"]
        state, hist = jax.jit(lambda s: eng.run_chunk(s, target, 60))(state)
        assert float(hist["loss"][-1]) < float(hist["loss"][0])
    # init params bit-identical: only the run key changes impl
    a = jax.tree_util.tree_leaves(outs[None])
    b = jax.tree_util.tree_leaves(outs["rbg"])
    assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_pack_small_matches_plain_adam():
    """pack_small(adam) is bitwise-equivalent to plain adam per update
    (packing permutes elements; adam is elementwise), and the engine runs
    and converges with it. Whole-fit trajectories are NOT compared: a
    different optimizer graph changes XLA fusion boundaries, and DIP fits
    amplify last-ulp differences chaotically."""
    import optax

    from dip_tpu.fit.packed import pack_small

    rng = np.random.default_rng(0)
    params = {"a": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(300,)), jnp.float32),
              "c": jnp.asarray(rng.normal(size=(70000,)), jnp.float32)}
    grads = jax.tree_util.tree_map(lambda x: x * 0.1 + 0.01, params)
    t1, t2 = optax.adam(0.01), pack_small(optax.adam(0.01), 1 << 15)
    s1, s2 = t1.init(params), t2.init(params)
    for _ in range(3):
        u1, s1 = t1.update(grads, s1)
        u2, s2 = t2.update(grads, s2)
        for k in params:
            np.testing.assert_array_equal(np.asarray(u1[k]),
                                          np.asarray(u2[k]), err_msg=k)

    target = _toy_image()
    z = get_noise(jax.random.key(1), 8, "noise", (32, 32))
    cfg = FitConfig(num_iter=60, lr=0.01, reg_noise_std=1.0 / 30,
                    log_every=60, pack_small_threshold=1 << 15)
    eng = Engine(_tiny_skip(), lambda p, out, aux: mse(out, aux), cfg,
                 default_metrics(target))
    state = eng.init_state(jax.random.key(0), z)
    state, hist = jax.jit(lambda s: eng.run_chunk(s, target, 60))(state)
    assert float(hist["loss"][-1]) < float(hist["loss"][0])
    assert np.isfinite(np.asarray(hist["loss"])).all()
