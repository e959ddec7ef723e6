"""Pearson product-moment correlation over the member axis.

Semantics follow the reference's one-pass form ``computePearson1``
(reference: src/Calculators/Correlation.cpp:42-99):

    r = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − (Σx)²) · (n·Σyy − (Σy)²))

The reference offers float/double accumulators via a template
parameter; here ``dtype`` selects the accumulator dtype (float64
requires ``jax.config.update('jax_enable_x64', True)``).
"""

from __future__ import annotations

import jax.numpy as jnp


def pearson(x: jnp.ndarray, y: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Pearson r between ``x`` and ``y`` along the last axis.

    Args:
      x: ``(..., n)`` sample values (e.g. the reference-point series).
      y: ``(..., n)`` sample values (e.g. per-voxel member series).
        Leading axes broadcast.
      dtype: accumulator dtype (float32 or float64).

    Returns:
      ``(...)`` correlation coefficients in float32.
    """
    n = x.shape[-1]
    xa = x.astype(dtype)
    ya = y.astype(dtype)
    nn = jnp.asarray(n, dtype)
    sum_x = jnp.sum(xa, axis=-1)
    sum_y = jnp.sum(ya, axis=-1)
    sum_xy = jnp.sum(xa * ya, axis=-1)
    sum_xx = jnp.sum(xa * xa, axis=-1)
    sum_yy = jnp.sum(ya * ya, axis=-1)
    num = nn * sum_xy - sum_x * sum_y
    den = jnp.sqrt((nn * sum_xx - sum_x * sum_x) * (nn * sum_yy - sum_y * sum_y))
    return (num / den).astype(jnp.float32)


def pearson_moments(y: jnp.ndarray, dtype=jnp.float32):
    """Partial moments of ``y`` for distributed Pearson accumulation.

    Used by the sharded path: per-shard ``(Σy, Σyy, Σxy)`` partials are
    ``psum``-reduced over the member mesh axis (no reference analogue —
    the reference is single-GPU; see SURVEY.md §2.11).
    """
    ya = y.astype(dtype)
    return jnp.sum(ya, axis=-1), jnp.sum(ya * ya, axis=-1)


def pearson_from_sums(n, sum_x, sum_y, sum_xy, sum_xx, sum_yy):
    """Assemble Pearson r from (possibly psum-reduced) raw sums."""
    nn = jnp.asarray(n, sum_xy.dtype)
    num = nn * sum_xy - sum_x * sum_y
    den = jnp.sqrt((nn * sum_xx - sum_x * sum_x) * (nn * sum_yy - sum_y * sum_y))
    return (num / den).astype(jnp.float32)
