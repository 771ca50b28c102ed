"""Generator zoo + `get_net` factory.

Factory parity with /root/reference/models/__init__.py:8-31: string net type
-> configured module.  'identity' returns a module that passes the input
through unchanged — the degenerate net used by sr_prior_effect.ipynb to
optimize raw pixels.
"""

from __future__ import annotations

import flax.linen as nn

from dip_tpu.models.skip import Skip, skip
from dip_tpu.models.unet import UNet
from dip_tpu.models.resnet import ResNet
from dip_tpu.models.texture_nets import TextureNet, get_texture_nets
from dip_tpu.models.dcgan import DCGAN, dcgan
from dip_tpu.models.downsampler import Downsampler, LearnableDownsampler


class Identity(nn.Module):
    def __call__(self, x):
        return x


def get_net(
    input_depth: int,
    net_type: str,
    pad: str,
    upsample_mode: str,
    n_channels: int = 3,
    act_fun: str = "LeakyReLU",
    skip_n33d=128,
    skip_n33u=128,
    skip_n11=4,
    num_scales: int = 5,
    downsample_mode: str = "stride",
) -> nn.Module:
    """Map a net-type string to a configured generator module."""
    if net_type == "skip":
        to_list = lambda v: [v] * num_scales if isinstance(v, int) else list(v)
        return Skip(
            num_output_channels=n_channels,
            num_channels_down=to_list(skip_n33d),
            num_channels_up=to_list(skip_n33u),
            num_channels_skip=to_list(skip_n11),
            upsample_mode=upsample_mode,
            downsample_mode=downsample_mode,
            need_sigmoid=True,
            need_bias=True,
            pad=pad,
            act_fun=act_fun,
        )
    if net_type == "UNet":
        return UNet(
            num_output_channels=n_channels,
            feature_scale=4,
            more_layers=0,
            concat_x=False,
            upsample_mode=upsample_mode,
            pad=pad,
            norm_kind="batch",
            need_sigmoid=True,
            need_bias=True,
        )
    if net_type == "ResNet":
        # NOTE: the reference's get_net wiring for ResNet is broken
        # (models/__init__.py:11 passes a norm class as the activation);
        # this is the intended configuration: 10 blocks, 16 channels.
        return ResNet(
            num_output_channels=n_channels,
            num_blocks=10,
            num_channels=16,
            need_residual=True,
            act_fun=act_fun,
            need_sigmoid=True,
            norm_kind="batch",
            pad=pad,
        )
    if net_type == "texture_nets":
        return TextureNet(
            ratios=(32, 16, 8, 4, 2, 1),
            fill_noise=False,
            pad=pad,
            num_output_channels=n_channels,
        )
    if net_type == "identity":
        return Identity()
    raise ValueError(f"unknown net type {net_type!r}")


__all__ = [
    "get_net",
    "Skip",
    "skip",
    "UNet",
    "ResNet",
    "TextureNet",
    "get_texture_nets",
    "DCGAN",
    "dcgan",
    "Downsampler",
    "LearnableDownsampler",
    "Identity",
]
