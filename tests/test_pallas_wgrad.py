"""Pallas weight-gradient kernels vs XLA autodiff.

The kernels claim exact (f32-accumulated) equality with the weight gradient
of lax.conv_general_dilated for the 3x3/s1/p1 and 1x1 forms. Run compiled
on TPU, interpreted elsewhere — same kernel code either way.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_tpu.ops import pallas_wgrad as pw

DN = ("NHWC", "HWIO", "NHWC")

interp = jax.default_backend() != "tpu"


def _xla_wgrad(x, g, ks, pad):
    def loss(kernel):
        y = jax.lax.conv_general_dilated(x, kernel, (1, 1), pad,
                                         dimension_numbers=DN)
        return jnp.sum(y * g)
    ci, co = x.shape[-1], g.shape[-1]
    return jax.grad(loss)(jnp.zeros((ks, ks, ci, co), x.dtype))


def _run(fn, *args):
    if interp:
        import jax.experimental.pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            return fn(*args)
    return fn(*args)


@pytest.mark.parametrize("h,w,ci,co", [(16, 24, 8, 16), (32, 16, 4, 8)])
def test_wgrad3x3_matches_xla(h, w, ci, co):
    k1, k2 = jax.random.split(jax.random.key(0))
    x = jax.random.normal(k1, (1, h, w, ci), jnp.float32)
    g = jax.random.normal(k2, (1, h, w, co), jnp.float32)
    got = _run(pw.wgrad3x3_s1, x[0], g[0])
    want = _xla_wgrad(x, g, 3, ((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_wgrad1x1_matches_xla():
    k1, k2 = jax.random.split(jax.random.key(1))
    x = jax.random.normal(k1, (1, 32, 32, 8), jnp.float32)  # k = 1024
    g = jax.random.normal(k2, (1, 32, 32, 16), jnp.float32)
    got = _run(pw.wgrad1x1, x[0], g[0])
    want = _xla_wgrad(x, g, 1, ((0, 0), (0, 0)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(interp, reason="compiled custom-vjp path is TPU-only")
def test_conv_wrappers_grads_match_xla_on_tpu():
    """Full custom_vjp wrappers: dx and dW against plain XLA autodiff."""
    k1, k2, k3 = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(k1, (1, 32, 32, 8), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, 8, 16), jnp.float32)
    ct = jax.random.normal(k3, (1, 32, 32, 16), jnp.float32)

    def loss_fast(x, k):
        return jnp.sum(pw._conv3x3_s1p1(x, k) * ct)

    def loss_ref(x, k):
        y = jax.lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=DN)
        return jnp.sum(y * ct)

    gx1, gk1 = jax.grad(loss_fast, (0, 1))(x, kern)
    gx2, gk2 = jax.grad(loss_ref, (0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_fast_fallback_matches():
    """Shapes that do not qualify must silently use the XLA path."""
    k1, k2 = jax.random.split(jax.random.key(3))
    x = jax.random.normal(k1, (1, 10, 10, 3))       # H not /8
    kern = jax.random.normal(k2, (3, 3, 3, 4))
    y = pw.conv2d_fast(x, kern, 1, ((1, 1), (1, 1)))
    want = jax.lax.conv_general_dilated(x, kern, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=DN)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
