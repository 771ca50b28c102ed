"""Losses / metrics golden tests (incl. torch cross-checks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dip_tpu.ops.losses import gram_matrix, masked_mse, mse, psnr, psnr_y, tv_loss


def test_psnr_basic():
    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20 dB (float32 log10 gives ~1e-4 slack)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-3)


def test_masked_mse_normalization():
    """Normalized by total pixel count, like mse(out*mask, img*mask)."""
    pred = jnp.ones((1, 4, 4, 1))
    tgt = jnp.zeros((1, 4, 4, 1))
    mask = jnp.zeros((1, 4, 4, 1)).at[0, 0, 0, 0].set(1.0)
    np.testing.assert_allclose(float(masked_mse(pred, tgt, mask)), 1.0 / 16.0)


def test_tv_loss_matches_torch_formula():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.random((1, 6, 7, 3)).astype(np.float32)

    ours = float(tv_loss(jnp.asarray(x), beta=0.5))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    dh = torch.pow(xt[:, :, :, 1:] - xt[:, :, :, :-1], 2)
    dw = torch.pow(xt[:, :, 1:, :] - xt[:, :, :-1, :], 2)
    ref = torch.sum(torch.pow(dh[:, :, :-1] + dw[:, :, :, :-1], 0.5)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_gram_matrix_matches_torch_bmm():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.random((2, 5, 6, 4)).astype(np.float32)

    ours = np.asarray(gram_matrix(jnp.asarray(x)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    b, ch, h, w = xt.shape
    f = xt.reshape(b, ch, h * w)
    ref = (f.bmm(f.transpose(1, 2)) / (ch * h * w)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_psnr_y_range():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.random((1, 16, 16, 3)), dtype=jnp.float32)
    noisy = jnp.clip(a + 0.05, 0, 1)
    v = float(psnr_y(a, noisy, crop=2))
    assert 15 < v < 40


def test_losses_jit_and_grad():
    # non-constant input: tv_loss has beta=0.5 so its grad at exactly-zero
    # neighbor diffs is a 0^-0.5 singularity (true of the reference formula
    # too, sr_utils.py:84-94 — real images never hit it)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 8, 8, 3)), dtype=jnp.float32)
    t = jnp.zeros_like(x)
    g = jax.grad(lambda y: mse(y, t))(x)
    assert g.shape == x.shape
    g2 = jax.grad(lambda y: tv_loss(y))(x)
    assert np.isfinite(np.asarray(g2)).all()
