"""Round-3 correctness fixes: explicit dispatch flags, structural Engine
cache keys, checkpoint PRNG-impl recovery, packed-leaf dtype restoration."""

import jax
import jax.numpy as jnp
import numpy as np

from dip_tpu.fit.engine import Engine, FitConfig
from dip_tpu.models import Skip
from dip_tpu.ops import dispatch
from dip_tpu.ops.losses import mse, psnr
from dip_tpu.utils.noise import get_noise


def _tiny_model():
    return Skip(num_channels_down=[8], num_channels_up=[8],
                num_channels_skip=[2])


def test_dispatch_flags_roundtrip():
    base = dispatch.flags()
    prev = dispatch.set_flags(conv_impl="dots")
    assert dispatch.conv_impl() == "dots"
    dispatch.set_flags(**prev)
    assert dispatch.flags() == base
    with dispatch.override(conv_impl="conv", up_shifts=True):
        assert dispatch.conv_impl() == "conv"
        assert dispatch.up_shifts()
    assert dispatch.flags() == base
    # None = leave unchanged (how FitConfig.conv_impl=None threads through)
    with dispatch.override(conv_impl=None):
        assert dispatch.flags() == base


def test_up_conv_auto_policy():
    """The measured policy (waves 7-10): seam ON for both dtypes under
    'auto'; since wave 10 BOTH dtypes take the dots lowering (f32
    re-measured at 20.95 vs 22.78 ms/iter @512^2 on the conv-op
    lowering), so 'auto' resolves the seam to the Pallas fused kernel for
    both — bf16 tiles native, f32 mixed-precision (bf16 MXU operands, f32
    accumulation; same DEFAULT-precision class as XLA's f32 convs).
    Shapes outside seam_ok fall back to 'dots' in up_conv.py. Forcing the
    conv-op lowering restores the wave-8 im2col seam emission for f32."""
    bf16 = jnp.zeros((), jnp.bfloat16).dtype  # what skip.py passes: u.dtype
    f32 = jnp.zeros((), jnp.float32).dtype
    with dispatch.override(conv_impl="auto", up_conv="auto",
                           up_conv_impl="auto"):
        assert dispatch.up_conv_on(bf16)
        assert dispatch.up_conv_on(f32)
        assert dispatch.up_conv_impl(bf16) == "pallas"
        assert dispatch.up_conv_impl(f32) == "pallas"
        assert dispatch.dots_lowering(f32)
        # forcing the conv-op lowering drags the seam emission with it
        with dispatch.override(conv_impl="conv"):
            assert not dispatch.dots_lowering(f32)
            assert dispatch.up_conv_impl(f32) == "im2col"
        with dispatch.override(up_conv_impl="conv"):
            assert dispatch.up_conv_impl(bf16) == "conv"
        with dispatch.override(up_conv="off"):
            assert not dispatch.up_conv_on(f32)


def test_conv_impl_through_fitconfig():
    """cfg.conv_impl='dots' and 'conv' agree numerically (and both run)."""
    target = jnp.full((1, 16, 16, 3), 0.5)
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    outs = []
    for impl in ("conv", "dots"):
        cfg = FitConfig(num_iter=4, lr=0.01, log_every=4, conv_impl=impl)
        eng = Engine(_tiny_model(), lambda p, o, a: mse(o, a), cfg)
        state = eng.init_state(jax.random.key(0), z)
        state, hist = eng.run(state, target)
        assert np.isfinite(hist["loss"]).all()
        outs.append(np.asarray(eng.render(state)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)


def test_bn_moments_sumsq_matches_twopass():
    """The single-read sum/sumsq BN statistics lowering is numerically
    equivalent to jnp.mean+jnp.var through a full fit (fwd + bwd + Adam)."""
    target = jnp.full((1, 16, 16, 3), 0.5)
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    outs = []
    for bnm in ("twopass", "sumsq"):
        cfg = FitConfig(num_iter=4, lr=0.01, log_every=4, bn_moments=bnm)
        eng = Engine(_tiny_model(), lambda p, o, a: mse(o, a), cfg)
        state = eng.init_state(jax.random.key(0), z)
        state, hist = eng.run(state, target)
        assert np.isfinite(hist["loss"]).all()
        outs.append(np.asarray(eng.render(state)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)


def test_engine_cache_key_structural():
    """Two separately-constructed identical specs share ONE Engine (and so
    one compiled program); a different metrics target does not."""
    from dip_tpu.parallel.queue import FitQueue
    from dip_tpu.tasks.base import TaskSpec

    s = 16
    target = np.full((1, s, s, 3), 0.5, np.float32)

    def build_spec(tgt):
        # everything constructed FRESH per call: model, cfg, closures
        model = Skip(num_channels_down=[8], num_channels_up=[8],
                     num_channels_skip=[2])
        cfg = FitConfig(num_iter=4, lr=0.01, log_every=4)
        tgt = jnp.asarray(tgt)
        return TaskSpec(
            name="t", model=model, cfg=cfg,
            loss_fn=lambda p, o, a: mse(o, a), aux=tgt,
            metrics_fn=lambda o, e, a: {"psnr_track": psnr(o, a)},
            input_depth=4, spatial_size=(s, s))

    q = FitQueue()
    q.add(build_spec(target), jax.random.key(0), name="a")
    q.add(build_spec(target.copy()), jax.random.key(1), name="b")
    assert len(q._engines) == 1, "identical specs must share one Engine"

    # a metrics closure over a DIFFERENT array is a different program
    def build_closed(tgt):
        model = Skip(num_channels_down=[8], num_channels_up=[8],
                     num_channels_skip=[2])
        cfg = FitConfig(num_iter=4, lr=0.01, log_every=4)
        tgt = jnp.asarray(tgt)
        return TaskSpec(
            name="c", model=model, cfg=cfg,
            loss_fn=lambda p, o, a: mse(o, a), aux=tgt,
            metrics_fn=lambda o, e, a: {"psnr_track": psnr(o, tgt)},
            input_depth=4, spatial_size=(s, s))

    q2 = FitQueue()
    q2.add(build_closed(target), jax.random.key(0), name="a")
    q2.add(build_closed(target.copy()), jax.random.key(1), name="b")
    assert len(q2._engines) == 1  # equal contents -> shared
    q2.add(build_closed(target * 0.5), jax.random.key(2), name="c")
    assert len(q2._engines) == 2  # different target constant -> own program

    res = q.run()
    assert res["a"][2]["loss"].shape == (4,)


def test_val_key_custom_object_protocol():
    """Exotic closure-cell objects default to identity keys (two equal but
    distinct objects -> two keys); a __dip_cache_key__ method makes them
    structural."""
    from dip_tpu.parallel.queue import _val_key

    class Opaque:
        def __init__(self, x):
            self.x = x

    a, b = Opaque(3), Opaque(3)
    assert _val_key(a) is a and _val_key(b) is b  # identity fallback

    class Keyed:
        def __init__(self, x):
            self.x = x

        def __dip_cache_key__(self):
            return self.x

    assert _val_key(Keyed(3)) == _val_key(Keyed(3))
    assert _val_key(Keyed(3)) != _val_key(Keyed(4))


def test_checkpoint_cross_impl_restore(tmp_path):
    """A checkpoint saved under one PRNG impl restores into a template
    built with another (key-data shape recovery), e.g. pre-rbg-default
    checkpoints into current engines."""
    from dip_tpu.fit.checkpoint import restore_fit_state, save_fit_state

    target = jnp.full((1, 16, 16, 3), 0.5)
    z = get_noise(jax.random.key(1), 4, "noise", (16, 16))
    model = _tiny_model()
    loss = lambda p, o, a: mse(o, a)  # noqa: E731

    cfg_old = FitConfig(num_iter=2, lr=0.01, log_every=2, rng_impl=None)
    eng_old = Engine(model, loss, cfg_old)
    state = eng_old.init_state(jax.random.key(0), z)
    state, _ = eng_old.run(state, target)
    save_fit_state(str(tmp_path / "ck"), state)

    cfg_new = FitConfig(num_iter=2, lr=0.01, log_every=2, rng_impl="rbg")
    eng_new = Engine(model, loss, cfg_new)
    template = eng_new.init_state(jax.random.key(0), z)
    restored = restore_fit_state(str(tmp_path / "ck"), template)
    assert int(restored.step) == 2
    # and the restored state still optimizes (key is usable)
    restored, hist = eng_new.run(restored, target)
    assert np.isfinite(hist["loss"]).all()


def test_pack_small_mixed_dtype_roundtrip():
    """_to_inner/_from_inner restore each leaf's dtype even when the packed
    concat promoted them."""
    from dip_tpu.fit.packed import _from_inner, _split_meta, _to_inner

    tree = {"a": jnp.ones((3,), jnp.bfloat16),
            "b": jnp.full((4,), 2.0, jnp.float32),
            "big": jnp.zeros((64, 64, 16), jnp.float32)}
    meta = _split_meta(tree, threshold=1 << 10)
    inner = _to_inner(tree, meta)
    assert inner["packed"].dtype == jnp.float32  # promoted
    back = _from_inner(inner, tree, meta)
    assert back["a"].dtype == jnp.bfloat16
    assert back["b"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(back["a"], np.float32),
                                  np.ones((3,), np.float32))
    np.testing.assert_array_equal(np.asarray(back["b"]),
                                  np.full((4,), 2.0, np.float32))
    assert back["big"].shape == (64, 64, 16)
