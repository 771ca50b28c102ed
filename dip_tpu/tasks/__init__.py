"""Task layer: each module packages a degradation model + loss + the exact
notebook preset recipes as a uniform TaskSpec consumed by tasks.run()."""

from dip_tpu.tasks.base import TaskSpec, run_task
from dip_tpu.tasks import (
    denoise,
    inpaint,
    super_resolve,
    restore,
    flash_no_flash,
    feature_inversion,
    activation_maximization,
)

__all__ = [
    "TaskSpec",
    "run_task",
    "denoise",
    "inpaint",
    "super_resolve",
    "restore",
    "flash_no_flash",
    "feature_inversion",
    "activation_maximization",
]
