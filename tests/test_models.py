"""Model zoo: shapes, init, determinism, factory parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_tpu.models import (
    DCGAN,
    Identity,
    ResNet,
    Skip,
    TextureNet,
    UNet,
    get_net,
)
from dip_tpu.models.downsampler import Downsampler, LearnableDownsampler


def _init_apply(model, z, key=0):
    k = jax.random.key(key)
    # jit init/apply: one compile each instead of per-op dispatch (slow on
    # this host's tunneled TPU backend), and persistently cached across runs
    variables = jax.jit(model.init)({"params": k, "noise": jax.random.key(1)}, z)
    out = jax.jit(lambda v, x: model.apply(v, x, rngs={"noise": jax.random.key(2)}))(
        variables, z
    )
    return variables, out


def test_skip_default_shape():
    z = jnp.zeros((1, 64, 64, 32))
    model = Skip()
    _, out = _init_apply(model, z)
    assert out.shape == (1, 64, 64, 3)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1  # sigmoid


def test_skip_denoising_config_param_count():
    """The denoising notebook's config: d=u=128, skip=4, 5 scales, ~2-3M params."""
    z = jnp.zeros((1, 64, 64, 32))
    model = Skip(
        num_channels_down=[128] * 5,
        num_channels_up=[128] * 5,
        num_channels_skip=[4] * 5,
        upsample_mode="bilinear",
        pad="reflection",
    )
    variables, out = _init_apply(model, z)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    assert out.shape == (1, 64, 64, 3)
    assert 1.5e6 < n_params < 4e6


def test_skip_no_skip_channels():
    z = jnp.zeros((1, 32, 32, 2))
    model = Skip(
        num_channels_down=[16, 32],
        num_channels_up=[16, 32],
        num_channels_skip=[0, 0],
    )
    _, out = _init_apply(model, z)
    assert out.shape == (1, 32, 32, 3)


def test_skip_downsample_modes():
    z = jnp.zeros((1, 32, 32, 3))
    for mode in ["stride", "avg", "max", "lanczos2"]:
        model = Skip(
            num_channels_down=[8, 8],
            num_channels_up=[8, 8],
            num_channels_skip=[2, 2],
            downsample_mode=mode,
        )
        _, out = _init_apply(model, z)
        assert out.shape == (1, 32, 32, 3), mode


def test_unet_shapes():
    z = jnp.zeros((1, 64, 64, 3))
    for up in ["deconv", "bilinear", "nearest"]:
        model = UNet(upsample_mode=up, norm_kind="batch")
        _, out = _init_apply(model, z)
        assert out.shape == (1, 64, 64, 3), up


def test_unet_concat_x_and_more_layers():
    z = jnp.zeros((1, 64, 64, 3))
    model = UNet(concat_x=True, more_layers=1, upsample_mode="deconv")
    _, out = _init_apply(model, z)
    assert out.shape == (1, 64, 64, 3)


def test_resnet_shape():
    z = jnp.zeros((1, 32, 32, 3))
    model = ResNet(num_blocks=3, num_channels=8)
    _, out = _init_apply(model, z)
    assert out.shape == (1, 32, 32, 3)


def test_texture_net_shape():
    z = jnp.zeros((1, 64, 64, 3))
    model = TextureNet(ratios=(4, 2, 1), conv_num=4)
    _, out = _init_apply(model, z)
    assert out.shape == (1, 64, 64, 3)


def test_texture_net_fill_noise():
    z = jnp.zeros((1, 32, 32, 3))
    model = TextureNet(ratios=(2, 1), conv_num=4, fill_noise=True)
    _, out = _init_apply(model, z)
    assert out.shape == (1, 32, 32, 3)


def test_dcgan_shape():
    z = jnp.zeros((1, 8, 8, 2))
    model = DCGAN(ndf=16, num_ups=4)
    _, out = _init_apply(model, z)
    # stem convT(3,s1,p0) adds 2 per dim; (num_ups-3)=1 mid x2 stage and the
    # final x2 stage: (8+2)*2*2 = 40
    assert out.shape[0] == 1 and out.shape[3] == 3
    assert out.shape[1] == out.shape[2] == 40


def test_dcgan_upsample_variant():
    z = jnp.zeros((1, 8, 8, 2))
    model = DCGAN(ndf=16, num_ups=5, need_convT=False)
    _, out = _init_apply(model, z)
    assert out.shape[3] == 3


def test_get_net_factory():
    z32 = jnp.zeros((1, 64, 64, 32))
    z3 = jnp.zeros((1, 64, 64, 3))
    net = get_net(32, "skip", pad="reflection", upsample_mode="bilinear")
    _, out = _init_apply(net, z32)
    assert out.shape == (1, 64, 64, 3)

    net = get_net(3, "UNet", pad="zero", upsample_mode="deconv")
    _, out = _init_apply(net, z3)
    assert out.shape == (1, 64, 64, 3)

    net = get_net(3, "identity", pad="zero", upsample_mode="nearest")
    assert isinstance(net, Identity)
    assert net.apply({}, z3).shape == z3.shape

    with pytest.raises(ValueError):
        get_net(3, "nope", "zero", "nearest")


def test_downsampler_modules():
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    d = Downsampler(factor=4)
    y = d(x)
    assert y.shape == (1, 8, 8, 3)

    ld = LearnableDownsampler(factor=4)
    variables = ld.init(jax.random.key(0), x)
    y2 = ld.apply(variables, x)
    assert y2.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
    # kernel is a trainable param
    assert variables["params"]["kernel"].shape == (16, 16)


def test_deterministic_init():
    z = jnp.zeros((1, 32, 32, 8))
    m = Skip(num_channels_down=[8, 8], num_channels_up=[8, 8],
             num_channels_skip=[2, 2])
    v1, _ = _init_apply(m, z, key=5)
    v2, _ = _init_apply(m, z, key=5)
    for a, b in zip(jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batchnorm_is_train_mode():
    """BN must normalize by current batch stats (instance-like at N=1)."""
    from dip_tpu.models.blocks import TrainBatchNorm

    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 4)) * 10 + 3,
                    dtype=jnp.float32)
    bn = TrainBatchNorm()
    v = bn.init(jax.random.key(0), x)
    y = np.asarray(bn.apply(v, x))
    np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1, 2)), 1, atol=1e-2)
