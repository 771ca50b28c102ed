"""Activation maximization: synthesize an input that excites a chosen unit
(activation_maximization.ipynb).

Objectives from utils/perceptual_loss/matcher.py:33-54 via the hook-free
Matcher: fc layer -> maximize/match the class logit; conv layer -> windowed
center-crop channel objective (window_size controls the excited region).
Recipe from cells 11-22: 3100 iters, conv layers LR 1e-3 / fc8 LR 1e-2,
reg_noise 0.03, param_noise on, loss x5, optional TV on the preprocessed
output (beta=2) and an optional spatial mask penalty.
"""

from __future__ import annotations

import jax.numpy as jnp

from dip_tpu.fit.engine import FitConfig
from dip_tpu.ops.losses import tv_loss
from dip_tpu.pretrained.backbones import vgg_preprocess_caffe
from dip_tpu.pretrained.matcher import Matcher
from dip_tpu.tasks.base import TaskSpec
from dip_tpu.tasks.feature_inversion import build_extractor, inversion_net


def task(
    backbone: str = "alexnet_caffe",
    layer: str = "conv4",
    map_idx: int = 2,
    window_size: int = 20,
    weights_path: str | None = None,
    method: str | None = None,          # default: fc8 -> 'am_match', else 'maximize'
    num_iter: int = 3100,
    lr: float | None = None,
    tv_weight: float = 0.0,
    mask_nhwc=None,                      # penalize output inside this mask
    imsize_net: int = 256,
    imsize: int | None = None,
    input_depth: int = 32,
) -> TaskSpec:
    extract, _, imsize = build_extractor(backbone, (layer,), weights_path,
                                         imsize=imsize)
    is_fc = layer.startswith("fc") or layer == "softmax"
    if method is None:
        method = "am_match" if layer == "fc8" else "maximize"
    if lr is None:
        lr = 1e-2 if layer == "fc8" else 1e-3

    matcher = Matcher(how="features", method=method, map_index=map_idx,
                      window_size=window_size)

    mask = None if mask_nhwc is None else jnp.asarray(mask_nhwc)

    def loss_fn(p, out, aux):
        out_c = out[:, :imsize, :imsize, :]
        acts = extract(out_c)
        total = matcher.total(acts) * 5.0
        if tv_weight > 0:
            total = total + tv_weight * tv_loss(vgg_preprocess_caffe(out_c), beta=2.0)
        if mask is not None:
            d = out_c * mask
            total = total + jnp.sum(d * d) * 1e1
        return total

    return TaskSpec(
        name=f"activation_max/{layer}[{map_idx}]",
        model=inversion_net(pad="reflection"),
        cfg=FitConfig(num_iter=num_iter, lr=lr, reg_noise_std=0.03,
                      param_noise=True),
        loss_fn=loss_fn,
        aux={},
        input_depth=input_depth,
        spatial_size=(imsize_net, imsize_net),
        postprocess=lambda out: out[:, :imsize, :imsize, :],
    )
