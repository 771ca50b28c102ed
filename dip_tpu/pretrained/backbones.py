"""Frozen classifier backbones with feature taps (NHWC, flax.linen).

The reference extracts intermediate activations from pretrained VGG/AlexNet
via torch forward hooks (utils/feature_inversion_utils.py:46-56).  Hooks
don't exist in a functional framework — instead each backbone's apply
returns a dict of activations tagged by the same caffe-style layer names the
reference uses ('conv1_1'...'fc8' for VGG
[utils/perceptual_loss/perceptual_loss.py:101-124], 'conv1'...'fc8' for
AlexNet-caffe), and computation stops at the deepest requested tap (the
reference pops later modules — feature_inversion.ipynb cell 5).

Weights: the reference downloads .pth files from (now mostly dead) URLs.
Here weights are converted from any torch checkpoint on disk via
pretrained/convert.py; with no checkpoint available the backbone runs with
torch-default random init — structurally identical, so the whole
matcher/inversion machinery stays testable offline.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from dip_tpu.models.blocks import torch_conv_kernel_init
from dip_tpu.ops.resample import max_pool


# --- preprocessing ----------------------------------------------------------

_VGG_MEAN_BGR = jnp.array([103.939, 116.779, 123.680])


def vgg_preprocess_caffe(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] NHWC -> caffe BGR*255 - mean (perceptual_loss.py:166-171)."""
    bgr = rgb[..., ::-1]
    return bgr * 255.0 - _VGG_MEAN_BGR


def vgg_deprocess_caffe(bgr: jnp.ndarray) -> jnp.ndarray:
    rgb = ((bgr + _VGG_MEAN_BGR) / 255.0)[..., ::-1]
    return jnp.clip(rgb, 0.0, 1.0)


_MEAN_TORCH = jnp.array([0.485, 0.456, 0.406])
_STD_TORCH = jnp.array([0.229, 0.224, 0.225])


def pytorch_preprocess(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - _MEAN_TORCH) / _STD_TORCH


# --- layer tables -----------------------------------------------------------

# (name, kind, arg): conv -> out channels; pool -> max 2x2/s2; fc -> width
VGG19_LAYERS = [
    ("conv1_1", "conv", 64), ("conv1_2", "conv", 64), ("pool1", "pool", 0),
    ("conv2_1", "conv", 128), ("conv2_2", "conv", 128), ("pool2", "pool", 0),
    ("conv3_1", "conv", 256), ("conv3_2", "conv", 256),
    ("conv3_3", "conv", 256), ("conv3_4", "conv", 256), ("pool3", "pool", 0),
    ("conv4_1", "conv", 512), ("conv4_2", "conv", 512),
    ("conv4_3", "conv", 512), ("conv4_4", "conv", 512), ("pool4", "pool", 0),
    ("conv5_1", "conv", 512), ("conv5_2", "conv", 512),
    ("conv5_3", "conv", 512), ("conv5_4", "conv", 512), ("pool5", "pool", 0),
    ("fc6", "fc", 4096), ("fc7", "fc", 4096), ("fc8", "fc", 1000),
]

VGG16_LAYERS = [
    ("conv1_1", "conv", 64), ("conv1_2", "conv", 64), ("pool1", "pool", 0),
    ("conv2_1", "conv", 128), ("conv2_2", "conv", 128), ("pool2", "pool", 0),
    ("conv3_1", "conv", 256), ("conv3_2", "conv", 256),
    ("conv3_3", "conv", 256), ("pool3", "pool", 0),
    ("conv4_1", "conv", 512), ("conv4_2", "conv", 512),
    ("conv4_3", "conv", 512), ("pool4", "pool", 0),
    ("conv5_1", "conv", 512), ("conv5_2", "conv", 512),
    ("conv5_3", "conv", 512), ("pool5", "pool", 0),
    ("fc6", "fc", 4096), ("fc7", "fc", 4096), ("fc8", "fc", 1000),
]


def _conv(name, features, ksize=3, stride=1, pad=1, groups=1):
    def init_bias(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)
    return nn.Conv(
        features, (ksize, ksize), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        feature_group_count=groups,
        kernel_init=torch_conv_kernel_init,
        bias_init=init_bias,
        name=name,
    )


class VGG(nn.Module):
    """VGG19/VGG16 with caffe-style naming and feature taps.

    apply(vars, x_preprocessed, taps=('fc6',)) -> dict name->activation.
    ReLUs follow every conv/fc except fc8 ('reluN_M' taps are exposed too).
    """

    depth: int = 19
    leaky_slope: float = 0.0    # VGGModified variant: ReLU -> LeakyReLU
    avg_pool_instead: bool = False  # VGGModified: MaxPool -> AvgPool

    @nn.compact
    def __call__(self, x: jnp.ndarray, taps: Sequence[str] = ("fc6",)) -> dict:
        layers = VGG19_LAYERS if self.depth == 19 else VGG16_LAYERS
        taps = tuple(taps)
        last = self._deepest(layers, taps)

        acts: dict[str, jnp.ndarray] = {}
        h = x
        for i, (name, kind, arg) in enumerate(layers):
            if i > last:
                break
            if kind == "conv":
                h = _conv(name, arg)(h)
                acts[name] = h
                h = nn.relu(h) if self.leaky_slope == 0 else nn.leaky_relu(h, self.leaky_slope)
                acts["relu" + name[4:]] = h
            elif kind == "pool":
                if self.avg_pool_instead:
                    from dip_tpu.ops.resample import avg_pool
                    h = avg_pool(h, 2)
                else:
                    h = max_pool(h, 2)
                acts[name] = h
            else:  # fc
                if h.ndim == 4:
                    # torch flattens NCHW: (N, C, H, W) -> (N, C*H*W).
                    # Transpose so converted torch fc weights line up.
                    h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
                h = nn.Dense(arg, name=name,
                             kernel_init=nn.initializers.lecun_normal())(h)
                acts[name] = h
                if name != "fc8":
                    h = nn.relu(h)
                    acts["relu" + name[2:]] = h
        return {t: acts[t] for t in taps}

    @staticmethod
    def _deepest(layers, taps):
        names = [n for n, _, _ in layers]
        idx = []
        for t in taps:
            if t in names:
                idx.append(names.index(t))
            elif t.startswith("relu"):
                base = "conv" + t[4:] if not t[4:].startswith(("6", "7")) else "fc" + t[4:]
                idx.append(names.index(base))
            else:
                raise ValueError(f"unknown tap {t!r}")
        return max(idx)


class LRN(nn.Module):
    """Local response normalization (caffe AlexNet, across channels)."""

    size: int = 5
    alpha: float = 1e-4
    beta: float = 0.75
    k: float = 1.0

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # sum of squares over a channel window
        sq = x * x
        half = self.size // 2
        padded = jnp.pad(sq, [(0, 0)] * 3 + [(half, half)])
        window = sum(
            padded[..., i : i + x.shape[-1]] for i in range(self.size)
        )
        return x * lax.pow(self.k + self.alpha * window, -self.beta)


ALEXNET_TAPS = ["conv1", "relu1", "norm1", "pool1",
                "conv2", "relu2", "norm2", "pool2",
                "conv3", "relu3", "conv4", "relu4", "conv5", "relu5", "pool5",
                "fc6", "relu6", "fc7", "relu7", "fc8", "softmax"]


class AlexNet(nn.Module):
    """Caffe AlexNet (CaffeNet) with grouped convs and LRN, tapped by name."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, taps: Sequence[str] = ("fc6",)) -> dict:
        taps = tuple(taps)
        last = max(ALEXNET_TAPS.index(t) for t in taps)
        acts: dict[str, jnp.ndarray] = {}

        def emit(name, val):
            acts[name] = val
            return ALEXNET_TAPS.index(name) >= last

        h = _conv("conv1", 96, ksize=11, stride=4, pad=0)(x)
        done = emit("conv1", h)
        if not done:
            h = nn.relu(h); done = emit("relu1", h)
        if not done:
            h = LRN()(h); done = emit("norm1", h)
        if not done:
            h = max_pool(h, 3, 2); done = emit("pool1", h)
        if not done:
            h = _conv("conv2", 256, ksize=5, pad=2, groups=2)(h); done = emit("conv2", h)
        if not done:
            h = nn.relu(h); done = emit("relu2", h)
        if not done:
            h = LRN()(h); done = emit("norm2", h)
        if not done:
            h = max_pool(h, 3, 2); done = emit("pool2", h)
        if not done:
            h = _conv("conv3", 384, ksize=3, pad=1)(h); done = emit("conv3", h)
        if not done:
            h = nn.relu(h); done = emit("relu3", h)
        if not done:
            h = _conv("conv4", 384, ksize=3, pad=1, groups=2)(h); done = emit("conv4", h)
        if not done:
            h = nn.relu(h); done = emit("relu4", h)
        if not done:
            h = _conv("conv5", 256, ksize=3, pad=1, groups=2)(h); done = emit("conv5", h)
        if not done:
            h = nn.relu(h); done = emit("relu5", h)
        if not done:
            h = max_pool(h, 3, 2); done = emit("pool5", h)
        if not done:
            h = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
            h = nn.Dense(4096, name="fc6")(h); done = emit("fc6", h)
        if not done:
            h = nn.relu(h); done = emit("relu6", h)
        if not done:
            h = nn.Dense(4096, name="fc7")(h); done = emit("fc7", h)
        if not done:
            h = nn.relu(h); done = emit("relu7", h)
        if not done:
            h = nn.Dense(1000, name="fc8")(h); done = emit("fc8", h)
        if not done:
            h = jax.nn.softmax(h); emit("softmax", h)
        return {t: acts[t] for t in taps}


def get_backbone(name: str) -> nn.Module:
    """'alexnet_caffe' | 'vgg19_caffe' | 'vgg16_caffe' |
    'vgg19_pytorch_modified' (perceptual_loss.py:15-46)."""
    if name == "alexnet_caffe":
        return AlexNet()
    if name == "vgg19_caffe":
        return VGG(depth=19)
    if name == "vgg16_caffe":
        return VGG(depth=16)
    if name == "vgg19_pytorch_modified":
        return VGG(depth=19, leaky_slope=0.2, avg_pool_instead=True)
    raise ValueError(f"unknown backbone {name!r}")
