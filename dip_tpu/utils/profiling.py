"""Tracing / observability hooks.

The reference's only observability is print() lines (SURVEY.md §5).  Here:
`trace()` wraps a block in a jax.profiler trace (viewable in TensorBoard /
Perfetto), `timed_chunk` measures steady-state scan throughput, and
`enable_nan_debug()` is the opt-in NaN-checking flag.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block: `with trace('/tmp/dip-trace'): eng.run(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debug() -> None:
    """Opt-in NaN checks (debug runs only — disables some fusions)."""
    jax.config.update("jax_debug_nans", True)


def timed_chunk(fn, *args, warmup: int = 1, repeats: int = 3) -> float:
    """Median wall-clock seconds of fn(*args) after warmup calls."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
