"""Torch-checkpoint -> flax parameter conversion for the backbones.

The reference downloads caffe-converted .pth files at runtime
(utils/perceptual_loss/perceptual_loss.py:15-46).  This environment has no
egress, so conversion is offline: point `load_torch_weights` at any torch
state dict whose keys follow the caffe-style naming ('conv1_1.weight', ...)
or torchvision's vgg layout ('features.0.weight', ...), and it emits the
matching flax params (OIHW -> HWIO, fc transposed).  Without a checkpoint
the backbones run randomly initialized — same graph, so tests don't need
weights.
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

# torchvision vgg feature indices -> caffe-style names
_VGG19_IDX = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3", 16: "conv3_4",
    19: "conv4_1", 21: "conv4_2", 23: "conv4_3", 25: "conv4_4",
    28: "conv5_1", 30: "conv5_2", 32: "conv5_3", 34: "conv5_4",
}
_VGG16_IDX = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}
_CLASSIFIER_IDX = {0: "fc6", 3: "fc7", 6: "fc8"}


def _to_flax_leaf(name: str, w: np.ndarray) -> tuple[str, np.ndarray]:
    if w.ndim == 4:  # conv OIHW -> HWIO
        return "kernel", np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 2:  # fc (out, in) -> (in, out)
        return "kernel", np.transpose(w, (1, 0))
    return "bias", w


def _detect_vgg_layout(state: Mapping[str, object]) -> dict:
    """VGG16 and VGG19 torchvision layouts share feature indices 0-16 but
    diverge above (16/25/30/32/34 are VGG19-only; 17 is VGG16-only), so the
    index set identifies the architecture."""
    idxs = {int(k.split(".")[1]) for k in state
            if k.startswith("features.") and k.split(".")[1].isdigit()}
    if idxs & {16, 25, 30, 32, 34}:
        return _VGG19_IDX
    if 17 in idxs:
        return _VGG16_IDX
    return _VGG19_IDX  # indices <= 14 are identical in both


def convert_torch_state_dict(state: Mapping[str, "np.ndarray"]) -> dict:
    """Convert a torch state dict (tensor or ndarray values) with caffe-style
    or torchvision-style keys into a flax params dict keyed by layer name."""
    params: dict[str, dict[str, np.ndarray]] = {}
    vgg_idx = _detect_vgg_layout(state)
    for key, val in state.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        parts = key.split(".")
        if parts[0] == "features" and len(parts) == 3:
            name = vgg_idx.get(int(parts[1]))
            if name is None:
                continue
        elif parts[0] == "classifier" and len(parts) == 3:
            name = _CLASSIFIER_IDX.get(int(parts[1]))
            if name is None:
                continue
        else:
            name = parts[0]
        leaf, arr = _to_flax_leaf(name, arr)
        params.setdefault(name, {})[leaf] = arr.astype(np.float32)
    return params


def load_torch_weights(path: str) -> dict | None:
    """Load + convert a torch checkpoint if it exists; else None."""
    if not os.path.exists(path):
        return None
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return convert_torch_state_dict(obj)


def apply_converted(variables: dict, converted: dict) -> dict:
    """Overlay converted weights onto randomly initialized flax variables,
    checking shape agreement layer by layer."""
    import jax

    params = dict(variables["params"])
    for name, leaves in converted.items():
        if name not in params:
            continue
        tgt = dict(params[name])
        for leaf, arr in leaves.items():
            if leaf in tgt and tuple(tgt[leaf].shape) == tuple(arr.shape):
                tgt[leaf] = jax.numpy.asarray(arr)
        params[name] = tgt
    return {**variables, "params": params}
