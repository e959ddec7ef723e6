"""Shared Pallas utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def digamma_vpu(x):
    """Branch-free ψ(x) for x ≥ 1: recurrence-shift by 8 then the
    asymptotic series (|err| < 1e-9 — well inside f32 tolerance).

    Used instead of a one-hot @ ψ-table MXU lookup inside kernels:
    Mosaic lowers a default f32 matmul as a SINGLE bf16 pass on v5e,
    which rounds the table values to ~0.4% relative — measured up to
    1.3e-3 absolute error on KSG MI fields before the series replaced
    the lookup. Elementwise VPU arithmetic stays full f32.
    """
    shifted = x + 8.0
    acc = 0.0
    for i in range(8):
        acc = acc + 1.0 / (x + float(i))
    inv = 1.0 / shifted
    inv2 = inv * inv
    return (
        jnp.log(shifted) - 0.5 * inv
        - inv2 * (1.0 / 12.0 - inv2 * (1.0 / 120.0 - inv2 / 252.0))
        - acc
    )


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
