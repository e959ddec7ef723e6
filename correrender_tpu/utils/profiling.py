"""Profiling/tracing hooks.

Role parity with the reference's observability stack (SURVEY.md §5.1):
Tracy zones / RenderDoc captures / Vulkan GPU timers become
``jax.profiler`` traces (viewable in Perfetto/TensorBoard) plus a
lightweight annotated-timer registry for CSV summaries.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

_TIMINGS: dict[str, list] = defaultdict(list)


def sync(x):
    """Force execution of a JAX value and return it (the axon backend's
    block_until_ready does not block — scalar materialization does)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.sum(leaves[0]))
    return x


@contextlib.contextmanager
def zone(name: str):
    """Named timing zone (Tracy-zone analogue); results accumulate in
    the registry for :func:`timing_summary`."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _TIMINGS[name].append(time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (Perfetto) for a code region —
    the programmatic-RenderDoc-capture analogue."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timing_summary(reset: bool = True) -> dict:
    """Aggregated zone timings in milliseconds."""
    out = {}
    for name, samples in _TIMINGS.items():
        arr = sorted(samples)
        out[name] = {
            "count": len(arr),
            "total_ms": sum(arr) * 1e3,
            "mean_ms": sum(arr) / len(arr) * 1e3,
            "median_ms": arr[len(arr) // 2] * 1e3,
        }
    if reset:
        _TIMINGS.clear()
    return out
