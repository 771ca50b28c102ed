"""dip_tpu — a TPU-native Deep Image Prior framework.

A from-scratch JAX/XLA re-design of the capabilities of
DmitryUlyanov/deep-image-prior: untrained conv generators fit per image by
gradient descent under task-specific degradation operators.  Everything hot
runs inside one jitted ``lax.scan``; independent per-image fits batch via
``vmap`` and shard across a TPU mesh via ``jax.sharding``.

Layout is NHWC (TPU-native) throughout the compute path; host-side image
utilities speak HWC float32 in [0, 1].
"""

from dip_tpu.models import get_net
from dip_tpu.utils.noise import get_noise
from dip_tpu.fit.engine import FitConfig, fit, init_fit

__all__ = [
    "get_net",
    "get_noise",
    "FitConfig",
    "fit",
    "init_fit",
]

__version__ = "0.1.0"
