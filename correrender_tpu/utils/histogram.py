"""Field histograms and min/max reductions for the TF editor.

Reference: src/Volume/Histogram.{hpp,cpp} + Data/Shaders/Histogram/ —
a five-pass GPU pipeline (min/max write → reduce → histogram → max →
divide) plus a divergent (sign-symmetric) min/max variant. On TPU all
of it is a couple of fused reductions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def min_max(field: jnp.ndarray):
    """NaN-ignoring (min, max) of a field."""
    return jnp.nanmin(field), jnp.nanmax(field)


@jax.jit
def divergent_min_max(field: jnp.ndarray):
    """Sign-symmetric range: (−m, m) with m = max|field| — used for
    signed fields (correlations) so the TF centers at zero
    (DivergentMinMaxPass analogue)."""
    m = jnp.nanmax(jnp.abs(field))
    return -m, m


@functools.partial(jax.jit, static_argnames=("num_bins", "normalize"))
def histogram(
    field: jnp.ndarray,
    num_bins: int = 256,
    bounds=None,
    normalize: bool = True,
):
    """Histogram of finite field values.

    Returns (counts, (lo, hi)); counts normalized to max 1 when
    ``normalize`` (the reference divides by the max bin for the TF
    editor display — ComputeHistogramDividePass).
    """
    flat = field.reshape(-1)
    ok = jnp.isfinite(flat)
    if bounds is None:
        lo = jnp.nanmin(flat)
        hi = jnp.nanmax(flat)
    else:
        lo, hi = bounds
    u = (flat - lo) / jnp.maximum(hi - lo, 1e-30)
    bins = jnp.clip((u * num_bins).astype(jnp.int32), 0, num_bins - 1)
    counts = jnp.zeros(num_bins, jnp.float32).at[bins].add(
        ok.astype(jnp.float32)
    )
    if normalize:
        counts = counts / jnp.maximum(jnp.max(counts), 1.0)
    return counts, (lo, hi)
