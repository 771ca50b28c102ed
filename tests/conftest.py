"""Test harness.

Numeric tests run on whatever accelerator is present.  Surprising fact
about this host (measured round 5): the FULL suite is *faster on the
single CPU core* than on the tunneled TPU — XLA:CPU pays compiles once
into the persistent cache below, while the tunnel pays an RPC round-trip
per eager dispatch (~1 test/min TPU vs ~4.4/min CPU).  The complete
green run is recorded in results/pytest_full_r5_cpu.log (249 passed,
1 skipped, 56:48 cold).

Tiering: the 20 tests >=45 s (subprocess mesh tests, convergence smokes,
end-to-end CLI/eval fits) are marked `slow`; `-m "not slow"` runs the
230-test tier in ~13 min cold on this host, much less with the compile
cache warm.

Convs/matmuls are pinned to HIGHEST precision so golden tests against
float32 references hold on TPU (whose default is bf16 multiplies).
Multi-chip sharding logic is exercised in a subprocess with
JAX_PLATFORMS=cpu + 8 virtual devices (tests/test_parallel.py), the
standard fake-backend trick (SURVEY.md §4).
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
