"""Task layer: spec construction + short-fit smoke tests per workload.

Smoke runs swap the preset generator for a tiny skip net (dataclasses.replace
on the spec) — preset *configs* are asserted as built, but compiling the
128-wide production nets for every smoke test is wasteful on this host.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_tpu.models import Skip
from dip_tpu.ops.losses import psnr
from dip_tpu.tasks import (
    denoise,
    flash_no_flash,
    inpaint,
    restore,
    super_resolve,
)
from dip_tpu.tasks.base import run_task
from dip_tpu.utils.masks import get_bernoulli_mask


def _tiny(spec):
    """Replace the preset generator with a small one for fast smoke runs."""
    model = Skip(num_channels_down=[8, 16], num_channels_up=[8, 16],
                 num_channels_skip=[4, 4], pad="reflection")
    return dataclasses.replace(spec, model=model)


def _toy(h=64, w=64, c=3):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([np.sin(xx / 9) * .5 + .5, np.cos(yy / 7) * .5 + .5,
                    (xx + yy) / (h + w)], axis=-1)[..., :c]
    return img[None]


@pytest.mark.slow
def test_denoise_spec_and_smoke():
    gt = _toy()
    noisy = denoise.get_noisy_image(gt[0], 25 / 255.0)[None]
    spec = denoise.task(noisy, preset="f16", gt=gt, num_iter=100)
    assert spec.cfg.reg_noise_std == pytest.approx(1 / 30)
    assert spec.cfg.backtrack
    out, state, hist = run_task(_tiny(spec), jax.random.key(0))
    assert out.shape == gt.shape
    assert {"loss", "psnr_track", "psnr_gt", "psnr_gt_sm"} <= set(hist)
    assert hist["loss"][-1] < hist["loss"][0]


def test_denoise_snail_preset():
    spec = denoise.task(_toy(), preset="snail")
    assert spec.input_depth == 3
    assert spec.cfg.num_iter == 2400


@pytest.mark.slow
def test_inpaint_presets():
    img = _toy()
    mask = np.ones_like(img)
    mask[:, 20:40, 20:40] = 0
    for preset, depth, method in [("vase", 2, "meshgrid"), ("kate", 32, "noise"),
                                  ("library", 1, "noise")]:
        spec = inpaint.task(img, mask, preset=preset)
        assert spec.input_depth == depth
        assert spec.input_method == method
    spec = inpaint.task(img, mask, preset="kate", num_iter=150)
    out, _, hist = run_task(_tiny(spec), jax.random.key(0))
    assert hist["loss"][-1] < hist["loss"][0]


def test_inpaint_library_net_variants():
    img = _toy()
    mask = np.ones_like(img)
    for net_type in ["skip_depth4", "UNet", "ResNet"]:
        spec = inpaint.task(img, mask, preset="library", net_type=net_type)
        assert spec.cfg.num_iter == 3001


@pytest.mark.slow
def test_sr_spec_and_smoke():
    hr = _toy(64, 64)
    lr = hr[:, ::4, ::4, :]  # cheap stand-in LR for the smoke test
    spec = super_resolve.task(lr, factor=4, hr_gt=hr, num_iter=120)
    assert spec.spatial_size == (64, 64)
    out, _, hist = run_task(_tiny(spec), jax.random.key(0))
    assert out.shape == hr.shape
    assert "psnr_hr" in hist and "psnr_lr" in hist
    assert hist["psnr_lr"][-1] > hist["psnr_lr"][0]


def test_sr_factor8_defaults():
    lr = _toy(8, 8)
    spec = super_resolve.task(lr, factor=8)
    assert spec.cfg.num_iter == 4000
    assert spec.cfg.reg_noise_std == pytest.approx(0.05)


def test_restore_spec():
    img = _toy()
    mask = get_bernoulli_mask((64, 64, 3), 0.5, np.random.default_rng(0))[None]
    spec = restore.task(img, mask, preset="barbara")
    assert spec.cfg.lr == pytest.approx(1e-3)
    assert spec.cfg.num_iter == 11000
    spec = restore.task(img, mask, preset="kate", num_iter=80)
    out, _, hist = run_task(_tiny(spec), jax.random.key(0))
    assert hist["loss"][-1] < hist["loss"][0]


@pytest.mark.slow
def test_flash_no_flash_smoke():
    flash = _toy()
    noflash = np.clip(_toy() * 0.6 + 0.2, 0, 1)
    spec = flash_no_flash.task(flash, noflash, num_iter=60)
    assert spec.net_input is not None
    out, _, hist = run_task(_tiny(spec), jax.random.key(0))
    assert out.shape == noflash.shape
    assert hist["loss"][-1] < hist["loss"][0]


@pytest.mark.slow
def test_sr_learnable_downsampler():
    """opt_over='net,down': the degradation kernel is a trainable leaf.

    factor=2 keeps the learnable kernel at 8x8 (64 tap-slices to compile);
    factor=4's 16x16 kernel compiles for ~7 minutes on this 1-core host."""
    hr = _toy(32, 32)
    lr = hr[:, ::2, ::2, :]
    spec = super_resolve.task(lr, factor=2, learnable_downsampler=True,
                              num_iter=30)
    assert "down" in spec.extra_params
    assert "down" in spec.cfg.opt_over
    out, state, hist = run_task(_tiny(spec), jax.random.key(0))
    assert "down" in state.params
    # the kernel moved away from its initialization (it is being optimized)
    init_k = spec.extra_params["down"]["kernel"]
    final_k = state.params["down"]["kernel"]
    assert float(jnp.abs(final_k - init_k).max()) > 0
    assert hist["loss"][-1] < hist["loss"][0]


def test_sr_get_baselines():
    """bicubic / unsharp / nearest baselines (regression: PIL.ImageFilter
    submodule import crashed the zebra reproduction run)."""
    from PIL import Image

    from dip_tpu.tasks.super_resolve import get_baselines

    lr = Image.fromarray(np.full((16, 16, 3), 128, np.uint8))
    hr = Image.fromarray(np.full((64, 64, 3), 128, np.uint8))
    bic, sharp, near = get_baselines(lr, hr)
    for b in (bic, sharp, near):
        assert b.shape == (64, 64, 3)
        assert np.isfinite(b).all()


def test_sr_resample_impl_flag():
    """resample_impl='pallas' builds a spec wired to the fused kernel;
    unknown impls are rejected."""
    import pytest as _pytest

    from dip_tpu.tasks import super_resolve

    lr_img = jnp.asarray(np.random.default_rng(0).random((1, 8, 8, 3)),
                         jnp.float32)
    spec = super_resolve.task(lr_img, factor=4, resample_impl="pallas",
                              num_iter=5)
    assert spec.name == "sr/x4"
    with _pytest.raises(ValueError):
        super_resolve.task(lr_img, factor=4, resample_impl="cuda")
