"""Shared Pallas utilities."""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
