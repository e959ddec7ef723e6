"""Kullback–Leibler divergence of the per-voxel member distribution
versus the standard normal.

Reference: src/Calculators/DKL.{hpp,cpp} — two estimators:

* **binned**: normalize samples to zero mean / unit variance, histogram
  over [min−0.01, max+0.01], then
  ``Σ p log( p·binFactor / N(center; 0, 1) )`` (DKL.cpp:39-86);
* **k-NN (Kozachenko–Leonenko)**: entropy estimate
  ``H = ⟨log d_k⟩ + ψ(n) − ψ(k) + log 2`` on sorted 1D samples, then
  ``DKL = −H + ½·log(2π) + ½·⟨v²⟩`` (DKL.cpp:133-169, derivation in
  DKL.hpp header comment), clamped ≥ 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

_TWO_PI = 2.0 * math.pi


def _normalize(v: jnp.ndarray):
    mean = jnp.mean(v, axis=-1, keepdims=True)
    var = jnp.mean((mean - v) ** 2, axis=-1, keepdims=True)
    return (v - mean) / jnp.sqrt(var)


@functools.partial(jax.jit, static_argnames=("num_bins",))
def dkl_binned(v: jnp.ndarray, num_bins: int = 80) -> jnp.ndarray:
    """Binned KL divergence vs N(0,1) along the last axis."""
    n = v.shape[-1]
    b = num_bins
    vn = _normalize(v.astype(jnp.float32))
    vmin = jnp.min(vn, axis=-1, keepdims=True) - 0.01
    vmax = jnp.max(vn, axis=-1, keepdims=True) + 0.01
    bin_factor = b / (vmax - vmin)
    bin_width = (vmax - vmin) / b
    bins = jnp.clip(((vn - vmin) * bin_factor).astype(jnp.int32), 0, b - 1)
    hist = jnp.sum(jax.nn.one_hot(bins, b, dtype=jnp.float32), axis=-2)
    p = hist / n  # (..., b)
    centers = (jnp.arange(b, dtype=jnp.float32) + 0.5) * bin_width + vmin
    log_q = -0.5 * jnp.log(jnp.asarray(_TWO_PI)) - 0.5 * centers * centers
    log_p_density = jnp.log(jnp.maximum(p, 1e-30) * bin_factor)
    terms = jnp.where(hist > 0, p * (log_p_density - log_q), 0.0)
    dkl = jnp.sum(terms, axis=-1)
    return jnp.where(jnp.isinf(dkl), jnp.nan, dkl).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def dkl_knn(v: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """Kozachenko–Leonenko entropy-based KL divergence vs N(0,1).

    Exactly-tied samples make the k-NN distance 0 → the estimate is
    NaN; that is reference behavior (DKL.cpp:133-166 takes
    ``log(nnDist)`` unguarded and maps the resulting inf to NaN), and
    this port mirrors it — verified identical on TPU and CPU against
    quantized (heavily tied) member series."""
    n = v.shape[-1]
    vn = _normalize(v.astype(jnp.float32))
    # k-th NN distance in 1D: pairwise |vi − vj|, exclude self via +inf.
    d = jnp.abs(vn[..., :, None] - vn[..., None, :])
    eye = jnp.eye(n, dtype=bool)
    d = jnp.where(eye, jnp.inf, d)
    neg_top, _ = jax.lax.top_k(-d, k)
    dk = -neg_top[..., k - 1]  # (..., n)
    entropy = (
        jnp.mean(jnp.log(dk), axis=-1)
        + digamma(float(n))
        - digamma(float(k))
        + jnp.log(2.0)
    )
    second_moment = jnp.mean(vn * vn, axis=-1)
    dkl = -entropy + 0.5 * jnp.log(jnp.asarray(_TWO_PI)) + 0.5 * second_moment
    dkl = jnp.maximum(dkl, 0.0)
    return jnp.where(jnp.isinf(dkl), jnp.nan, dkl).astype(jnp.float32)
