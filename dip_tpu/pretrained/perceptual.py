"""PerceptualLoss: one-call deep-feature distance.

Functional equivalent of the reference's PerceputalLoss [sic] orchestrator
(utils/perceptual_loss/perceptual_loss.py:49-92): store statistics from the
target image, match them on the prediction, sum over matchers.  Here it's a
plain callable — loss = PerceptualLoss(...)(x, y) — usable directly inside a
jitted fit loss.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from dip_tpu.pretrained.backbones import (
    pytorch_preprocess,
    vgg_preprocess_caffe,
)
from dip_tpu.pretrained.matcher import Matcher
from dip_tpu.tasks.feature_inversion import build_extractor

_PREPROCESS = {
    "alexnet_caffe": vgg_preprocess_caffe,
    "vgg19_caffe": vgg_preprocess_caffe,
    "vgg16_caffe": vgg_preprocess_caffe,
    "vgg19_pytorch_modified": pytorch_preprocess,
}


class PerceptualLoss:
    """Deep-feature distance between images in [0,1].

    match: list of dicts {'layers': (...names...), 'what': 'features'|
    'gram_matrix', 'loss': 'mse'|'L1'|'smoothL1'} — one Matcher per entry,
    losses summed (perceptual_loss.py:56,92).
    """

    def __init__(
        self,
        net_type: str = "vgg19_caffe",
        match: Sequence[dict] = ({"layers": ("relu4_4",), "what": "features"},),
        weights_path: str | None = None,
        input_range: str = "sigmoid",   # 'sigmoid' [0,1] | 'tanh' [-1,1]
        imsize: int | None = None,
    ):
        all_layers = tuple({l for m in match for l in m["layers"]})
        self.extract, self.vars, self.imsize = build_extractor(
            net_type, all_layers, weights_path, imsize=imsize,
            preprocess=_PREPROCESS[net_type])
        self.input_range = input_range
        self.matchers = [
            (tuple(m["layers"]),
             Matcher(how=m.get("what", "features"),
                     loss=m.get("loss", "mse"), method="match"))
            for m in match
        ]

    def _acts(self, x: jnp.ndarray) -> dict:
        if self.input_range == "tanh":
            x = (x + 1.0) / 2.0
        return self.extract(x)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Sum of feature-statistic distances between x and target y."""
        acts_y = self._acts(y)
        acts_x = self._acts(x)
        total = jnp.asarray(0.0, jnp.float32)
        for layers, matcher in self.matchers:
            stored = matcher.store({k: acts_y[k] for k in layers})
            total = total + matcher.total({k: acts_x[k] for k in layers}, stored)
        return total
