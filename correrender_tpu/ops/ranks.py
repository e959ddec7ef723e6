"""Fractional (tie-averaged) ranking over the member axis.

Matches the reference's ``computeRanks`` (reference:
src/Calculators/Correlation.cpp:277-303): values are sorted, runs of
equal values all receive the mean of the ranks they span, ranks are
1-based.

TPU-native formulation: instead of the reference's sequential
run-length walk we mark run starts/ends on the sorted values and
recover each element's tie range with a cumulative max/min — O(n log n)
for the sort, O(n) for the rest, fully batched over voxels with no
gather-heavy inner loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fractional_ranks(v: jnp.ndarray) -> jnp.ndarray:
    """1-based fractional ranks along the last axis.

    Args:
      v: ``(..., n)`` values.

    Returns:
      ``(..., n)`` float32 ranks, tie groups averaged.
    """
    n = v.shape[-1]
    order = jnp.argsort(v, axis=-1)
    sorted_v = jnp.take_along_axis(v, order, axis=-1)
    idx = jnp.arange(n)
    idx = jnp.broadcast_to(idx, sorted_v.shape)

    # Run starts: position 0, or value differs from predecessor.
    prev_diff = sorted_v[..., 1:] != sorted_v[..., :-1]
    is_start = jnp.concatenate(
        [jnp.ones(sorted_v.shape[:-1] + (1,), bool), prev_diff], axis=-1
    )
    is_end = jnp.concatenate(
        [prev_diff, jnp.ones(sorted_v.shape[:-1] + (1,), bool)], axis=-1
    )
    axis = v.ndim - 1  # lax cumulative ops require non-negative axes
    # first[i] = index of the start of i's tie run (most recent start).
    first = jax.lax.cummax(jnp.where(is_start, idx, -1), axis=axis)
    # last[i] = index of the end of i's tie run (nearest end at/after i).
    last = jax.lax.cummin(jnp.where(is_end, idx, n), axis=axis, reverse=True)

    # Mean of 1-based ranks first+1 .. last+1  ->  (first + last) / 2 + 1.
    rank_sorted = (first + last).astype(jnp.float32) * 0.5 + 1.0
    # Scatter back to original positions: ranks[order[i]] = rank_sorted[i].
    ranks = jnp.zeros(v.shape, jnp.float32)
    ranks = jnp.put_along_axis(ranks, order, rank_sorted, axis=-1, inplace=False)
    return ranks
