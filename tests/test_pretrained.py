"""Pretrained backbones, matcher, feature-inversion/AM task wiring.

Runs with random backbone weights (no egress in this environment); shapes,
taps, objectives and gradients are what's under test — weight fidelity is
covered by the converter unit test with a synthetic torch state dict.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_tpu.pretrained.backbones import (
    AlexNet,
    VGG,
    get_backbone,
    vgg_preprocess_caffe,
)
from dip_tpu.pretrained.convert import convert_torch_state_dict
from dip_tpu.pretrained.matcher import Matcher


def test_alexnet_shapes():
    model = AlexNet()
    x = jnp.zeros((1, 227, 227, 3))
    taps = ("conv1", "pool2", "conv4", "fc6")
    v = jax.jit(lambda k, x: model.init(k, x, taps=taps))(jax.random.key(0), x)
    acts = jax.jit(lambda v, x: model.apply(v, x, taps=taps))(v, x)
    assert acts["conv1"].shape == (1, 55, 55, 96)
    assert acts["pool2"].shape == (1, 13, 13, 256)
    assert acts["conv4"].shape == (1, 13, 13, 384)
    assert acts["fc6"].shape == (1, 4096)


def test_vgg19_truncated_taps():
    model = VGG(depth=19)
    x = jnp.zeros((1, 64, 64, 3))
    taps = ("relu1_2", "conv3_1")
    v = jax.jit(lambda k, x: model.init(k, x, taps=taps))(jax.random.key(0), x)
    acts = jax.jit(lambda v, x: model.apply(v, x, taps=taps))(v, x)
    assert acts["relu1_2"].shape == (1, 64, 64, 64)
    assert acts["conv3_1"].shape == (1, 16, 16, 256)
    # truncation: layers beyond conv3_1 must not exist in params
    assert "conv5_1" not in v["params"]


def test_get_backbone_names():
    for name in ["alexnet_caffe", "vgg19_caffe", "vgg16_caffe",
                 "vgg19_pytorch_modified"]:
        assert get_backbone(name) is not None
    with pytest.raises(ValueError):
        get_backbone("resnet50")


def test_preprocess_caffe():
    rgb = jnp.ones((1, 4, 4, 3)) * jnp.array([1.0, 0.5, 0.0])
    out = vgg_preprocess_caffe(rgb)
    # channel 0 of output is B*255 - mean_b
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                               [0 * 255 - 103.939, 0.5 * 255 - 116.779,
                                1.0 * 255 - 123.680], atol=1e-3)


def test_matcher_match_and_gram():
    m = Matcher(how="features", loss="mse")
    acts = {"a": jnp.ones((1, 4, 4, 2))}
    stored = m.store(acts)
    zero = m.total(acts, stored)
    assert float(zero) == 0.0
    acts2 = {"a": jnp.zeros((1, 4, 4, 2))}
    assert float(m.total(acts2, stored)) == pytest.approx(1.0)

    g = Matcher(how="gram_matrix")
    stored = g.store({"a": jnp.ones((1, 4, 4, 2))})
    assert stored["a"].shape == (1, 2, 2)


def test_matcher_am_objectives():
    # fc maximize
    m = Matcher(method="maximize", map_index=3)
    acts = {"fc8": jnp.arange(10.0).reshape(1, 10)}
    assert float(m.total(acts)) == -3.0
    # fc am_match
    m2 = Matcher(method="am_match", map_index=3)
    assert float(m2.total(acts)) == pytest.approx(297.0)
    # conv windowed maximize
    m3 = Matcher(method="maximize", map_index=1, window_size=2)
    conv = jnp.ones((1, 12, 12, 4))
    assert float(m3.total({"c": conv})) == pytest.approx(-16.0)


def test_converter_torchvision_layout():
    torch = pytest.importorskip("torch")
    state = {
        "features.0.weight": torch.zeros(64, 3, 3, 3),
        "features.0.bias": torch.zeros(64),
        "classifier.0.weight": torch.zeros(4096, 25088),
        "classifier.0.bias": torch.zeros(4096),
        "conv1.weight": torch.zeros(96, 3, 11, 11),
    }
    out = convert_torch_state_dict(state)
    assert out["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert out["fc6"]["kernel"].shape == (25088, 4096)
    assert out["conv1"]["kernel"].shape == (11, 11, 3, 96)


_FIT_SMOKE_SKIP = pytest.mark.skipif(
    jax.devices()[0].platform != "cpu",
    reason="fit smokes through the backbone stall the tunneled TPU backend; "
           "covered by CPU runs (DIP_PLATFORM=cpu)",
)


@_FIT_SMOKE_SKIP
@pytest.mark.slow
def test_feature_inversion_task_smoke():
    from dip_tpu.tasks.feature_inversion import FeatureInversion
    from dip_tpu.tasks.base import run_task

    # small sizes: the smoke validates wiring, not AlexNet-scale compiles
    fi = FeatureInversion(backbone="alexnet_caffe", layers=("conv1",),
                          num_iter=5, imsize_net=64, imsize=48)
    content = jnp.ones((1, 48, 48, 3)) * 0.5
    spec = fi.spec(content)
    out, state, hist = run_task(spec, jax.random.key(0))
    assert out.shape == (1, 48, 48, 3)
    assert np.isfinite(hist["loss"]).all()


@_FIT_SMOKE_SKIP
@pytest.mark.slow
def test_activation_maximization_task_smoke():
    from dip_tpu.tasks import activation_maximization as am
    from dip_tpu.tasks.base import run_task

    spec = am.task(backbone="alexnet_caffe", layer="conv1", map_idx=0,
                   window_size=3, num_iter=5, imsize=48, imsize_net=64)
    out, state, hist = run_task(spec, jax.random.key(0))
    assert out.shape == (1, 48, 48, 3)
    assert np.isfinite(hist["loss"]).all()


def test_perceptual_loss_smoke():
    """PerceptualLoss: zero for identical inputs, positive otherwise,
    differentiable."""
    from dip_tpu.pretrained.perceptual import PerceptualLoss

    pl = PerceptualLoss(
        net_type="vgg16_caffe",
        match=[{"layers": ("relu1_2",), "what": "features"},
               {"layers": ("conv2_1",), "what": "gram_matrix"}],
        imsize=32,
    )
    x = jnp.ones((1, 32, 32, 3)) * 0.4
    y = jnp.ones((1, 32, 32, 3)) * 0.6
    assert float(pl(x, x)) == 0.0
    v = float(pl(x, y))
    assert v > 0
    g = jax.grad(lambda a: pl(a, y))(x)
    assert np.isfinite(np.asarray(g)).all()
