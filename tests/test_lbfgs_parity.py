"""LBFGS parity vs torch.optim.LBFGS.

The reference's LBFGS mode is 100 Adam warm-up steps then one
torch.optim.LBFGS(max_iter=num_iter, tolerance_grad=-1,
tolerance_change=-1).step(closure) (utils/common_utils.py:208-221).
dip-tpu scans optax.lbfgs steps after the same warm-up.  These are
different line-search implementations, so the pin is on *outcome*: on the
same problem from the same start, both must reach a comparable final loss.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from dip_tpu.fit.engine import Engine, FitConfig  # noqa: E402
from dip_tpu.models import Identity  # noqa: E402

N, M = 24, 16
WARMUP, LBFGS_ITERS = 10, 40


def _problem():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(N, M)).astype(np.float32)
    b = rng.normal(size=(N,)).astype(np.float32)
    x0 = rng.normal(scale=0.1, size=(1, 4, 4, M)).astype(np.float32)
    return A, b, x0


def _loss_np(A, b, x):
    r = x.reshape(-1, M) @ A.T - b
    return float(np.mean(r * r))


def test_lbfgs_matches_torch_final_loss():
    A, b, x0 = _problem()

    # --- torch: the reference's exact optimize('LBFGS', ...) semantics ----
    xt = torch.nn.Parameter(torch.from_numpy(x0.copy()))
    At, bt = torch.from_numpy(A), torch.from_numpy(b)

    def t_loss():
        r = xt.reshape(-1, M) @ At.T - bt
        return (r * r).mean()

    warm = torch.optim.Adam([xt], lr=1e-3)
    for _ in range(WARMUP):
        warm.zero_grad()
        loss = t_loss()
        loss.backward()
        warm.step()
    opt = torch.optim.LBFGS([xt], max_iter=LBFGS_ITERS,
                            tolerance_grad=-1, tolerance_change=-1)

    def closure():
        opt.zero_grad()
        loss = t_loss()
        loss.backward()
        return loss

    opt.step(closure)
    torch_final = _loss_np(A, b, xt.detach().numpy())

    # --- dip-tpu: Engine 'lbfgs' over the input pytree -------------------
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def loss_fn(p, out, aux):
        r = out.reshape(-1, M) @ Aj.T - bj
        return jnp.mean(r * r)

    cfg = FitConfig(num_iter=LBFGS_ITERS, optimizer="lbfgs",
                    lbfgs_warmup=WARMUP, lbfgs_warmup_lr=1e-3,
                    opt_input=True, log_every=LBFGS_ITERS)
    eng = Engine(Identity(), loss_fn, cfg)
    state = eng.init_state(jax.random.key(0), jnp.asarray(x0))
    state, hist = eng.run(state, aux=None)
    ours_final = float(hist["loss"][-1])
    initial = _loss_np(A, b, x0)

    # analytic optimum of the (overdetermined) least-squares problem
    x_star = np.linalg.lstsq(A, b, rcond=None)[0]
    optimal = _loss_np(A, b, np.broadcast_to(x_star, (x0.size // M, M)))

    # both optimizers must close >=98% of the gap to the true optimum
    assert torch_final - optimal < (initial - optimal) * 0.02, (
        torch_final, optimal, initial)
    assert ours_final - optimal < (initial - optimal) * 0.02, (
        ours_final, optimal, initial)
    # and land within 5% of each other's excess above the optimum + epsilon
    assert abs(ours_final - torch_final) < 0.05 * (initial - optimal) + 1e-6
