"""Converter parity against *real-layout* torch checkpoint files.

Round-1 gap: pretrained/convert.py had only ever seen synthetic dicts. Here
we build genuine torch models — a caffe-layout AlexNet twin (the layout of
the reference's alexnet-torch_py3.pth, perceptual_loss.py:17-21) and a
torchvision-layout VGG16 ('features.N.weight' / 'classifier.N.weight') —
torch.save them to disk, convert with load_torch_weights, and assert the
flax backbones reproduce the torch activations on the same input.  This is
the proof that a user with the reference's downloaded .pth files gets the
true trained features out of dip-tpu.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from dip_tpu.pretrained.backbones import VGG, AlexNet  # noqa: E402
from dip_tpu.pretrained.convert import apply_converted, load_torch_weights  # noqa: E402


class TorchCaffeAlexNet(tnn.Module):
    """Caffe AlexNet twin with the reference checkpoint's key layout
    ('conv1.weight', ..., 'fc8.bias')."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 96, 11, stride=4)
        self.conv2 = tnn.Conv2d(96, 256, 5, padding=2, groups=2)
        self.conv3 = tnn.Conv2d(256, 384, 3, padding=1)
        self.conv4 = tnn.Conv2d(384, 384, 3, padding=1, groups=2)
        self.conv5 = tnn.Conv2d(384, 256, 3, padding=1, groups=2)
        self.fc6 = tnn.Linear(256 * 6 * 6, 4096)
        self.fc7 = tnn.Linear(4096, 4096)
        self.fc8 = tnn.Linear(4096, 1000)
        # torch LRN scales alpha by 1/size; dip-tpu's LRN uses the raw
        # Krizhevsky convention, so pass alpha*size for identical math
        self.lrn = tnn.LocalResponseNorm(5, alpha=5 * 1e-4, beta=0.75, k=1.0)
        self.pool = tnn.MaxPool2d(3, 2)

    def forward(self, x):
        h = self.pool(self.lrn(torch.relu(self.conv1(x))))
        h = self.pool(self.lrn(torch.relu(self.conv2(h))))
        h = torch.relu(self.conv3(h))
        h = torch.relu(self.conv4(h))
        conv5 = self.conv5(h)
        h = self.pool(torch.relu(conv5))
        h = torch.flatten(h, 1)
        fc6 = self.fc6(h)
        return conv5, fc6


def test_alexnet_real_checkpoint_parity(tmp_path):
    torch.manual_seed(0)
    twin = TorchCaffeAlexNet().eval()
    path = tmp_path / "alexnet_caffe.pth"
    torch.save(twin.state_dict(), path)

    x = np.random.default_rng(0).uniform(-1, 1, (1, 227, 227, 3)).astype(np.float32)
    with torch.no_grad():
        t_conv5, t_fc6 = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    model = AlexNet()
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), jnp.asarray(x),
                           taps=("conv5", "fc6"))
    )()
    converted = load_torch_weights(str(path))
    variables = apply_converted(variables, converted)
    acts = jax.jit(
        lambda v: model.apply(v, jnp.asarray(x), taps=("conv5", "fc6"))
    )(variables)

    np.testing.assert_allclose(
        np.asarray(acts["conv5"]).transpose(0, 3, 1, 2),
        t_conv5.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(acts["fc6"]), t_fc6.numpy(), rtol=1e-3, atol=1e-3)


def _torchvision_vgg16_features():
    """torchvision vgg16 'features' Sequential: conv indices
    0,2,5,7,10,12,14,17,19,21,24,26,28 with maxpools between blocks."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    return tnn.Sequential(*layers)


def test_vgg16_torchvision_layout_parity(tmp_path):
    torch.manual_seed(1)
    feats = _torchvision_vgg16_features().eval()
    fc6 = tnn.Linear(512 * 7 * 7, 4096)
    state = {f"features.{k}": v for k, v in feats.state_dict().items()}
    state.update({f"classifier.0.{k}": v for k, v in fc6.state_dict().items()})
    path = tmp_path / "vgg16.pth"
    torch.save(state, path)

    x = np.random.default_rng(1).uniform(-1, 1, (1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_feat = feats(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        t_fc6 = fc6(torch.flatten(t_feat, 1))

    model = VGG(depth=16)
    variables = jax.jit(
        lambda: model.init(jax.random.key(0), jnp.asarray(x),
                           taps=("pool5", "fc6"))
    )()
    variables = apply_converted(variables, load_torch_weights(str(path)))
    acts = jax.jit(
        lambda v: model.apply(v, jnp.asarray(x), taps=("pool5", "fc6"))
    )(variables)

    np.testing.assert_allclose(
        np.asarray(acts["pool5"]).transpose(0, 3, 1, 2),
        t_feat.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(acts["fc6"]), t_fc6.numpy(), rtol=1e-3, atol=1e-3)
