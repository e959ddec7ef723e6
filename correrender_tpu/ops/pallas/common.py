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


_SELECT_BIG = 1e30


def select_kth(dch, k, axis):
    """(k+1)-th smallest per slice along ``axis`` including ties —
    extract-min-above-threshold with duplicate counting (the exact
    kernel's selection semantics; shared by ksg_kernel and
    ksg_banded's repair so the "exactly equal to the full-matrix
    path" invariant has ONE definition)."""
    import jax.numpy as jnp

    shape = list(dch.shape)
    shape[axis] = 1
    thresh = jnp.full(shape, -1.0, jnp.float32)
    cnt = jnp.zeros(shape, jnp.float32)
    for _ in range(k + 1):
        active = cnt < (k + 1)
        masked = jnp.where(dch > thresh, dch, _SELECT_BIG)
        m = jnp.min(masked, axis=axis, keepdims=True)
        dup = jnp.sum((dch == m).astype(jnp.float32), axis=axis,
                      keepdims=True)
        thresh = jnp.where(active, m, thresh)
        cnt = jnp.where(active, cnt + dup, cnt)
    return thresh
