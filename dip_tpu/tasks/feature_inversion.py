"""Feature inversion: reconstruct an image whose deep features match a
content image's (feature_inversion.ipynb).

The frozen backbone replaces forward hooks with tagged activations
(pretrained/backbones.py); gradient flows through it into the generator.
Recipe from cells 7-14: 6-scale skip net (filters [7,7,5,5,3,3], avg
downsampling, zero pad), z at 256^2, output cropped to the classifier's
input size (227 AlexNet / 224 VGG), caffe preprocessing, 3100 Adam iters at
LR 1e-3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dip_tpu.fit.engine import FitConfig
from dip_tpu.models import Skip
from dip_tpu.pretrained.backbones import get_backbone, vgg_preprocess_caffe
from dip_tpu.pretrained.convert import apply_converted, load_torch_weights
from dip_tpu.pretrained.matcher import Matcher


def inversion_net(num_output_channels: int = 3, pad: str = "zero") -> Skip:
    """The notebook's 6-scale generator (cell 11)."""
    return Skip(
        num_output_channels=num_output_channels,
        num_channels_down=[16, 32, 64, 128, 128, 128],
        num_channels_up=[16, 32, 64, 128, 128, 128],
        num_channels_skip=[4] * 6,
        filter_size_down=[7, 7, 5, 5, 3, 3],
        filter_size_up=[7, 7, 5, 5, 3, 3],
        upsample_mode="nearest",
        downsample_mode="avg",
        need_sigmoid=True,
        pad=pad,
    )


def build_extractor(backbone: str = "alexnet_caffe",
                    layers: tuple[str, ...] = ("fc6",),
                    weights_path: str | None = None,
                    imsize: int | None = None,
                    preprocess=None):
    """Return (extract_fn, frozen_vars, imsize). extract_fn(x_rgb01) -> dict
    of tapped activations after preprocessing (caffe BGR by default)."""
    model = get_backbone(backbone)
    if imsize is None:
        imsize = 227 if backbone.startswith("alexnet") else 224
    if preprocess is None:
        preprocess = vgg_preprocess_caffe
    dummy = jnp.zeros((1, imsize, imsize, 3))
    variables = jax.jit(
        lambda k, x: model.init(k, x, taps=layers)
    )(jax.random.key(0), preprocess(dummy))
    if weights_path:
        converted = load_torch_weights(weights_path)
        if converted:
            variables = apply_converted(variables, converted)
    variables = jax.lax.stop_gradient(variables)

    def extract(x_rgb01: jnp.ndarray) -> dict:
        return model.apply(variables, preprocess(x_rgb01), taps=layers)

    return extract, variables, imsize


class FeatureInversion:
    """Bundles extractor + matcher + generator + fit recipe.

    Not a TaskSpec because it needs a store pass on the content image before
    fitting; `spec(content_img)` performs the store and returns the TaskSpec.
    """

    def __init__(self, backbone: str = "alexnet_caffe",
                 layers: tuple[str, ...] = ("fc6",),
                 what: str = "features",
                 weights_path: str | None = None,
                 imsize_net: int = 256,
                 imsize: int | None = None,
                 num_iter: int = 3100, lr: float = 1e-3):
        self.extract, self.cnn_vars, self.imsize = build_extractor(
            backbone, layers, weights_path, imsize=imsize)
        self.matcher = Matcher(how=what, loss="mse", method="match")
        self.imsize_net = imsize_net
        self.num_iter = num_iter
        self.lr = lr

    def spec(self, content_img_nhwc, input_depth: int = 32):
        from dip_tpu.tasks.base import TaskSpec

        content = jnp.asarray(content_img_nhwc)
        assert content.shape[1] == content.shape[2] == self.imsize, (
            f"content image must be {self.imsize}^2"
        )
        stored = self.matcher.store(self.extract(content))
        sz = self.imsize

        def loss_fn(p, out, aux):
            out_c = out[:, :sz, :sz, :]
            acts = self.extract(out_c)
            return self.matcher.total(acts, aux["stored"])

        return TaskSpec(
            name="feature_inversion",
            model=inversion_net(),
            cfg=FitConfig(num_iter=self.num_iter, lr=self.lr),
            loss_fn=loss_fn,
            aux={"stored": stored},
            input_depth=input_depth,
            spatial_size=(self.imsize_net, self.imsize_net),
            postprocess=lambda out: out[:, :sz, :sz, :],
        )


def task(content_img_nhwc, backbone: str = "alexnet_caffe",
         layers: tuple[str, ...] = ("fc6",), weights_path: str | None = None,
         **kw):
    return FeatureInversion(backbone, layers, weights_path=weights_path,
                            **kw).spec(content_img_nhwc)


def big_run_spec(fi: FeatureInversion, content_img_nhwc, input_depth: int = 2):
    """The 20k-iteration staged-noise variant (feature_inversion.ipynb cells
    20-22): meshgrid-width-2 input, LR 0.01, input jitter x10 until 10k, x2
    until 15k, x0.5 until 20k, with weight jitter."""
    import dataclasses

    spec = fi.spec(content_img_nhwc, input_depth=input_depth)
    cfg = dataclasses.replace(
        spec.cfg,
        num_iter=20000,
        lr=0.01,
        param_noise=True,
        reg_noise_schedule=((10000, 10.0), (15000, 2.0), (20000, 0.5)),
    )
    return dataclasses.replace(spec, cfg=cfg)
