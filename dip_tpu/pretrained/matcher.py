"""Hook-free feature matcher.

Pure-functional rewrite of the reference's two stateful hook Matchers
(utils/matcher.py:4-54 and utils/perceptual_loss/matcher.py:5-55): the
backbone returns tagged activations; `store()` turns them into target
statistics, `losses()` compares fresh activations against stored targets (or
runs the activation-maximization objectives).  Everything is jit/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dip_tpu.ops.losses import gram_matrix


def _features(x):
    return x


def _stat_fn(how: str):
    if how == "features":
        return _features
    if how == "gram_matrix":
        return lambda x: gram_matrix(x) if x.ndim == 4 else x
    raise ValueError(f"unknown statistic {how!r}")


def _loss_fn(name: str):
    if name == "mse":
        return lambda a, b: jnp.mean((a - b) ** 2)
    if name == "L1":
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if name == "smoothL1":
        def smooth_l1(a, b):
            d = jnp.abs(a - b)
            return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))
        return smooth_l1
    raise ValueError(f"unknown loss {name!r}")


class Matcher:
    """Feature/Gram matcher with 'match' and 'maximize' objectives.

    how: 'features' | 'gram_matrix'; loss: 'mse' | 'L1' | 'smoothL1';
    method: 'match' (vs stored targets) or 'maximize'/'am_match' (the
    activation-maximization objectives of perceptual_loss/matcher.py:33-54,
    driven by map_index and window_size).
    """

    def __init__(self, how: str = "features", loss: str = "mse",
                 map_index: int | None = None, method: str = "match",
                 window_size: int = 20):
        self.get_statistics = _stat_fn(how)
        self.loss = _loss_fn(loss)
        self.map_index = map_index
        self.method = method
        self.window_size = window_size

    # -- store pass -----------------------------------------------------------
    def store(self, acts: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
        """Targets are constants: stop_gradient mirrors .detach() at
        utils/matcher.py:26."""
        return {
            k: jax.lax.stop_gradient(self.get_statistics(v))
            for k, v in acts.items()
        }

    # -- match pass -----------------------------------------------------------
    def losses(self, acts: dict[str, jnp.ndarray],
               stored: dict[str, jnp.ndarray] | None = None) -> dict[str, jnp.ndarray]:
        out = {}
        for name, v in acts.items():
            stats = self.get_statistics(v)
            if self.method == "match":
                assert stored is not None, "match mode needs stored targets"
                out[name] = self.loss(stats, stored[name])
            elif stats.ndim == 2:
                # fc activation: single-unit objective
                if self.method == "maximize":
                    out[name] = -stats[0, self.map_index]
                else:  # 'am_match'
                    out[name] = jnp.abs(300.0 - stats[0, self.map_index])
            else:
                # conv activation (NHWC): windowed center-crop objective
                ws = self.window_size
                h, w = stats.shape[1], stats.shape[2]
                s_cc = stats[:1, h // 2 - ws : h // 2 + ws,
                             w // 2 - ws : w // 2 + ws, self.map_index]
                if self.method == "maximize":
                    out[name] = -jnp.sum(s_cc)
                else:
                    out[name] = jnp.sum(jnp.abs(200.0 - s_cc))
        return out

    def total(self, acts, stored=None) -> jnp.ndarray:
        return sum(self.losses(acts, stored).values())
