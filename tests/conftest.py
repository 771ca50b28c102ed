"""Test harness.

Numeric tests run on whatever accelerator is present (TPU when available —
this host's single CPU core makes XLA:CPU compiles pathologically slow, so
the TPU is also the *fast* path).  Convs/matmuls are pinned to HIGHEST
precision so golden tests against float32 references hold on TPU (whose
default is bf16 multiplies).  Multi-chip sharding logic is exercised in a
subprocess with JAX_PLATFORMS=cpu + 8 virtual devices (tests/test_parallel.py),
the standard fake-backend trick (SURVEY.md §4).
"""

import os

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Allow an explicit platform override (DIP_PLATFORM=cpu). NOTE: this host's
# sitecustomize force-registers the axon TPU plugin and overwrites
# jax_platforms, so a config update — not the env var — is required.
from dip_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: reruns skip XLA compilation entirely.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dip_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng_key():
    return jax.random.key(0)


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
