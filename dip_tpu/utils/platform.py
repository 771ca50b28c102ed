"""Platform selection helper.

This build environment's sitecustomize force-registers the axon TPU plugin
and overwrites jax_platforms to "axon,cpu", so the JAX_PLATFORMS env var
alone cannot select CPU.  `apply_platform_env()` honors DIP_PLATFORM (or
JAX_PLATFORMS when it disagrees with the forced config) via a config update,
which works as long as no backend has been initialized yet.
"""

from __future__ import annotations

import os


def apply_platform_env(default: str | None = None) -> None:
    enable_compile_cache()
    want = os.environ.get("DIP_PLATFORM") or default
    if not want:
        return
    import jax

    try:
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already initialized; leave as-is


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent XLA compile cache: per-image-fit CLI invocations are
    short-lived processes, so recompiling the scan program every run would
    dominate wall-clock. Opt out with DIP_COMPILE_CACHE=0."""
    env = os.environ.get("DIP_COMPILE_CACHE", "")
    if env == "0":
        return
    path = path or env or os.path.expanduser("~/.cache/dip_tpu_xla")
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def cpu_devices(n: int | None = None):
    """Return CPU devices (for fake-mesh tests on the forced-TPU host)."""
    import jax

    devs = [d for d in jax.devices("cpu")]
    return devs if n is None else devs[:n]
