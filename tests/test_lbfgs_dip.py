"""LBFGS on a REAL DIP problem: tiny skip net denoising, vs torch.

test_lbfgs_parity.py pins the optimizer on a convex toy; the reference's
LBFGS mode exists to fit conv nets (utils/common_utils.py:208-221). Here
both frameworks fit the SAME tiny skip net (transplanted weights, identical
init) to the same 32^2 noisy image with the reference's exact semantics —
Adam warm-up at lr 1e-3, then full-history LBFGS (torch: one
.step(closure) with max_iter=N, tolerance_grad/change=-1; dip-tpu: scanned
optax.lbfgs) — and must reach comparable final loss. Line searches differ
by construction, so the pin is on outcome, not trajectory.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from dip_tpu.fit.engine import Engine, FitConfig  # noqa: E402
from dip_tpu.models import Skip  # noqa: E402
from dip_tpu.ops.losses import mse  # noqa: E402

from test_torch_parity import CFG, _Params, torch_skip_forward  # noqa: E402

WARMUP, LBFGS_ITERS = 30, 40


def _data():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32
    clean = np.stack([np.sin(xx * 6) * 0.5 + 0.5, yy,
                      (xx + yy) / 2], axis=-1)
    noisy = np.clip(clean + rng.normal(scale=0.1, size=clean.shape), 0, 1)
    z = rng.uniform(size=(1, 32, 32, 6)).astype(np.float32) * 0.1
    return noisy.astype(np.float32)[None], z


class _Replay:
    """Serve pre-built live torch Parameters in module-creation order."""

    def __init__(self, convs, bns):
        self.convs, self.bns = convs, bns
        self.ci = self.bi = 0

    def conv(self):
        out = self.convs[self.ci]
        self.ci += 1
        return out

    def bn(self):
        out = self.bns[self.bi]
        self.bi += 1
        return out


@pytest.mark.slow
def test_lbfgs_on_tiny_skip_dip():
    noisy, z = _data()
    model = Skip(**CFG)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.asarray(z))
    fp = variables["params"]

    # ---- torch twin with transplanted weights ----------------------------
    base = _Params(fp)
    n_convs = sum(k.startswith("Conv_") for k in fp)
    n_bns = sum(k.startswith("TrainBatchNorm_") for k in fp)
    convs = [[torch.nn.Parameter(t) for t in base.conv()]
             for _ in range(n_convs)]
    bns = [[torch.nn.Parameter(t) for t in base.bn()] for _ in range(n_bns)]
    leaves = [t for grp in convs + bns for t in grp]
    x_t = torch.from_numpy(z.transpose(0, 3, 1, 2).copy())
    tgt_t = torch.from_numpy(noisy.transpose(0, 3, 1, 2).copy())

    def t_loss():
        out = torch_skip_forward(_Replay(convs, bns), x_t, CFG)
        return ((out - tgt_t) ** 2).mean()

    initial = float(t_loss().detach())

    warm = torch.optim.Adam(leaves, lr=1e-3)
    for _ in range(WARMUP):
        warm.zero_grad()
        loss = t_loss()
        loss.backward()
        warm.step()
    opt = torch.optim.LBFGS(leaves, max_iter=LBFGS_ITERS,
                            tolerance_grad=-1, tolerance_change=-1)

    def closure():
        opt.zero_grad()
        loss = t_loss()
        loss.backward()
        return loss

    opt.step(closure)
    torch_final = float(t_loss().detach())

    # ---- dip-tpu Engine 'lbfgs', same weights/input/target ---------------
    cfg = FitConfig(num_iter=LBFGS_ITERS, optimizer="lbfgs",
                    lbfgs_warmup=WARMUP, lbfgs_warmup_lr=1e-3,
                    reg_noise_std=0.0, exp_weight=None,
                    log_every=LBFGS_ITERS)
    eng = Engine(model, lambda p, out, aux: mse(out, aux), cfg)
    target = jnp.asarray(noisy)
    state = eng.init_state(jax.random.key(1), jnp.asarray(z))
    state = state._replace(params=dict(state.params, net=fp))
    state, hist = eng.run(state, target)
    ours_final = float(hist["loss"][-1])

    # both must make real progress on the DIP objective from the same start
    assert torch_final < 0.5 * initial, (torch_final, initial)
    assert ours_final < 0.5 * initial, (ours_final, initial)
    # and land in the same ballpark (different line searches; outcome pin)
    assert ours_final < 3.0 * torch_final + 1e-6, (ours_final, torch_final)
    assert torch_final < 3.0 * ours_final + 1e-6, (ours_final, torch_final)
