"""Persistent XLA compilation-cache policy — the ONE definition shared
by every fresh-process entry point (CLI, bench.py); a drifting copy
would silently measure benches under a different cache policy than the
app runs with.

ON by default; opt out with ``CORRERENDER_NO_COMPILE_CACHE=1``,
override the directory with ``CORRERENDER_COMPILE_CACHE=<dir>``
(default ``~/.cache/correrender_tpu/xla``).

Measured history on the tunneled axon backend (both recorded because
they conflict): an early round-3 session saw cached-executable loading
11x SLOWER than a fresh compile; re-measured 2026-08-18 with 3
interleaved reps of ``render --measure pearson`` per variant, the
cache was consistently FASTER (16.4-18.8 s vs 21.1-56.9 s wall) — it
also clips the occasional compile-helper stall. Only compiles over
0.5 s are cached, so a pathological deserialization regression is
bounded and the opt-out is one env var.
"""

from __future__ import annotations

import os


def enable_compile_cache():
    if os.environ.get("CORRERENDER_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get("CORRERENDER_COMPILE_CACHE") or (
        os.path.join(os.path.expanduser("~"), ".cache",
                     "correrender_tpu", "xla")
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass
