"""Pallas fused downsample: golden vs the XLA separable path.

Runs in interpret mode so it validates on any backend; the compiled TPU path
is exercised by bench/production runs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dip_tpu.ops.pallas_resample import HAVE_PALLAS, downsample_fused
from dip_tpu.ops.resample import downsample


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
@pytest.mark.parametrize("factor,ktype,hw", [
    (4, "lanczos2", (64, 64)),
    (2, "lanczos2", (32, 48)),
    (8, "lanczos3", (64, 64)),
])
def test_fused_matches_xla(factor, ktype, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, hw[0], hw[1], 3)), dtype=jnp.float32)
    ref = downsample(x, factor, ktype, phase=0.5, preserve_size=True)
    got = downsample_fused(x, factor, ktype, phase=0.5, preserve_size=True,
                           interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_constant_preserved():
    x = jnp.full((1, 32, 32, 3), 0.7)
    y = downsample_fused(x, 4, "lanczos2", 0.5, True, interpret=True)
    assert y.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(y), 0.7, atol=1e-5)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_fused_custom_vjp_matches_xla_grad():
    """The kernel's custom VJP must equal the XLA path's autodiff gradient."""
    import jax

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), dtype=jnp.float32)
    tgt = jnp.asarray(rng.random((1, 16, 16, 3)), dtype=jnp.float32)

    def loss_fused(x):
        y = downsample_fused(x, 4, "lanczos2", 0.5, True, interpret=True)
        return jnp.mean((y - tgt) ** 2)

    def loss_xla(x):
        y = downsample(x, 4, "lanczos2", 0.5, True)
        return jnp.mean((y - tgt) ** 2)

    g1 = jax.grad(loss_fused)(x)
    g2 = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
