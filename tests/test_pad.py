"""pad2d forward + custom-VJP correctness.

The reflect/edge pads carry a hand-written adjoint (strip folds) for speed;
it must agree exactly with jnp.pad's autodiff on both values and gradients,
including asymmetric pads and corner regions (H and W interact there).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dip_tpu.ops.pad import pad2d


@pytest.mark.parametrize("mode", ["reflection", "replication", "zero"])
@pytest.mark.parametrize("pads", [1, 2, (2, 3)])
def test_pad2d_forward_matches_jnp(mode, pads):
    x = jnp.asarray(np.random.default_rng(0).random((2, 6, 7, 3)),
                    jnp.float32)
    got = pad2d(x, pads, mode)
    jmode = {"reflection": "reflect", "replication": "edge",
             "zero": "constant"}[mode]
    ph, pw = (pads, pads) if isinstance(pads, int) else pads
    want = jnp.pad(x, [(0, 0), (ph, ph), (pw, pw), (0, 0)], mode=jmode)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("mode", ["reflection", "replication"])
@pytest.mark.parametrize("pads", [1, 2, (2, 3)])
def test_pad2d_custom_vjp_matches_autodiff(mode, pads):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 5, 6, 2)), jnp.float32)
    jmode = {"reflection": "reflect", "replication": "edge"}[mode]
    ph, pw = (pads, pads) if isinstance(pads, int) else pads
    # arbitrary nonlinear scalar so the cotangent isn't uniform
    w = jnp.asarray(rng.random((5 + 2 * ph, 6 + 2 * pw, 2)), jnp.float32)

    def f_custom(t):
        return jnp.sum(pad2d(t, pads, mode) ** 2 * w)

    def f_ref(t):
        return jnp.sum(jnp.pad(t, [(0, 0), (ph, ph), (pw, pw), (0, 0)],
                               mode=jmode) ** 2 * w)

    g_custom = jax.grad(f_custom)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-6)
