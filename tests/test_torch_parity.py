"""Cross-framework forward parity: the flax Skip net vs an independently
constructed torch twin with transplanted weights.

This pins the exact topology of the DIP workhorse (skip-branch placement,
BN-after-concat ordering, 1x1 up convs, head) against a second
implementation written from the documented dataflow (SURVEY.md §2 #3 /
models/skip.py docstring): same weights -> same outputs within float32
tolerance. Torch runs on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from dip_tpu.models import Skip  # noqa: E402


CFG = dict(
    num_channels_down=[8, 16],
    num_channels_up=[8, 16],
    num_channels_skip=[4, 4],
    filter_size_down=3,
    filter_size_up=3,
    filter_skip_size=1,
    pad="reflection",
    upsample_mode="bilinear",
    need1x1_up=True,
    need_sigmoid=True,
)


class _Params:
    """Walk flax params in module-creation order (flax auto-numbers by type)."""

    def __init__(self, params):
        self.params = params
        self.conv_i = 0
        self.bn_i = 0

    def conv(self):
        p = self.params[f"Conv_{self.conv_i}"]["Conv_0"]
        self.conv_i += 1
        w = torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(p["bias"]).copy())
        return w, b

    def bn(self):
        p = self.params[f"TrainBatchNorm_{self.bn_i}"]
        self.bn_i += 1
        return (torch.from_numpy(np.asarray(p["scale"]).copy()),
                torch.from_numpy(np.asarray(p["bias"]).copy()))


def t_conv(x, w, b, reflect_pad):
    p = (w.shape[-1] - 1) // 2
    if p and reflect_pad:
        x = F.pad(x, (p, p, p, p), mode="reflect")
        p = 0
    return F.conv2d(x, w, b, padding=p)


def t_bn(x, scale, bias):
    return F.batch_norm(x, None, None, scale, bias, training=True, eps=1e-5)


def t_cba(x, pp, features_unused, stride=1):
    w, b = pp.conv()
    p = (w.shape[-1] - 1) // 2
    if p:
        x = F.pad(x, (p, p, p, p), mode="reflect")
    x = F.conv2d(x, w, b, stride=stride)
    x = t_bn(x, *pp.bn())
    return F.leaky_relu(x, 0.2)


def torch_skip_forward(params, x_nchw, cfg):
    # `params` is a flax params dict, or any walker with .conv()/.bn()
    # (test_lbfgs_dip reuses this forward with live torch Parameters)
    pp = params if hasattr(params, "conv") else _Params(params)
    n_scales = len(cfg["num_channels_down"])
    skips = []
    x = x_nchw
    for i in range(n_scales):
        if cfg["num_channels_skip"][i]:
            skips.append(t_cba(x, pp, None))  # 1x1 skip conv + bn + act
        else:
            skips.append(None)
        x = t_cba(x, pp, None, stride=2)     # down conv s2
        x = t_cba(x, pp, None)               # down conv
    u = x
    for i in reversed(range(n_scales)):
        u = F.interpolate(u, scale_factor=2, mode="bilinear",
                          align_corners=False)
        if skips[i] is not None:
            u = torch.cat([skips[i], u], dim=1)
        u = t_bn(u, *pp.bn())                # bn after concat
        u = t_cba(u, pp, None)               # conv up
        if cfg["need1x1_up"]:
            u = t_cba(u, pp, None)           # 1x1 up
    w, b = pp.conv()
    u = F.conv2d(u, w, b)                    # 1x1 head
    return torch.sigmoid(u)


def test_skip_forward_matches_torch_twin():
    model = Skip(**CFG)
    z = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 6)),
                    dtype=jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), z)
    ours = np.asarray(jax.jit(model.apply)(variables, z))

    x_t = torch.from_numpy(np.asarray(z).transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        theirs = torch_skip_forward(variables["params"], x_t, CFG)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
