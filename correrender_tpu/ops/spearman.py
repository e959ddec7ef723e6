"""Spearman rank correlation: Pearson on fractional ranks.

Reference computes per-voxel ranks then Pearson on them
(src/Calculators/CorrelationCalculator.cpp:900-940, kernels
Data/Shaders/Correlation/SpearmanRankCorrelation.glsl). The reference
precomputes the reference-series ranks once
(``SpearmanReferenceRankComputePass``); here the caller can likewise
pass pre-ranked ``x`` via ``x_is_ranked=True``.
"""

from __future__ import annotations

import jax.numpy as jnp

from correrender_tpu.ops.pearson import pearson
from correrender_tpu.ops.ranks import fractional_ranks


def spearman(
    x: jnp.ndarray,
    y: jnp.ndarray,
    dtype=jnp.float32,
    *,
    x_is_ranked: bool = False,
    y_is_ranked: bool = False,
) -> jnp.ndarray:
    """Spearman rho between ``x`` and ``y`` along the last axis."""
    rx = x if x_is_ranked else fractional_ranks(x)
    ry = y if y_is_ranked else fractional_ranks(y)
    return pearson(rx, ry, dtype=dtype)
