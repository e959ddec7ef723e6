"""Kraskov–Stögbauer–Grassberger (KSG) k-NN mutual information.

Reference: ``computeMutualInformationKraskov{,2}``
(src/Calculators/MutualInformation.cpp:399-509) — estimators 1 and 2 of
Kraskov et al., Phys. Rev. E 69, 066138 (2004):

* deterministic uniform noise of amplitude 1e-5 is added to each axis
  to break ties (reference seeds xorshift generators 617406168 /
  864730169; we use a fixed JAX PRNG key per axis — a different
  sequence, so fields agree to noise-level tolerance, not bitwise);
* the k-th nearest neighbour is found in the 2D joint space under the
  Chebyshev (max) metric, searching k+1 neighbours including the query
  point itself;
* per-axis neighbour counts use the same half-open interval
  ``[v − d, v + d)`` the reference's binary searches produce
  (MutualInformation.cpp:189-238), with the ±1e-6 epsilon adjustment;
* estimator 1: MI = −⟨ψ(nx+1)⟩ − ⟨ψ(ny+1)⟩ + ψ(k) + ψ(n);
  estimator 2: MI = −⟨ψ(nx)⟩ − ⟨ψ(ny)⟩ + ψ(k) − 1/k + ψ(n);
  both clamped to ≥ 0.

TPU-native formulation: the reference builds an in-register k-d tree
per voxel (GLSL/CUDA). Trees are pointer-chasing and hostile to the
VPU; for n ≤ a few thousand an O(n²) masked pairwise Chebyshev distance
matrix followed by ``top_k`` is faster on TPU and exact. The field
driver tiles voxels so the ``(..., n, n)`` block fits in memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

#: Noise amplitude and count epsilon of the float path
#: (MutualInformation.cpp:162-165).
NOISE_AMPLITUDE = 1e-5
COUNT_EPSILON = 1e-6

# Fixed seeds standing in for the reference's fixed xorshift seeds
# (MutualInformation.cpp:410-411). Data-independent and deterministic.
# Keys are built lazily — creating them at import time would initialize
# the JAX backend on module import.
_SEED_REF = 617406168
_SEED_QUERY = 864730169


def _key_ref():
    return jax.random.key(_SEED_REF)


def _key_query():
    return jax.random.key(_SEED_QUERY)


def _add_noise(v: jnp.ndarray, key) -> jnp.ndarray:
    # The reference re-seeds its generators per voxel, so the noise
    # vector is a function of the member index only — identical for
    # every voxel (MutualInformation.cpp:410-424). Mirror that: draw
    # (n,) once and broadcast, which also keeps sharded and dense
    # evaluations bit-identical.
    noise = jax.random.uniform(key, (v.shape[-1],), jnp.float32)
    return v + noise * NOISE_AMPLITUDE


@functools.partial(jax.jit, static_argnames=("k", "estimator", "use_noise"))
def mutual_information_kraskov(
    x: jnp.ndarray,
    y: jnp.ndarray,
    k: int = 3,
    estimator: int = 1,
    use_noise: bool = True,
) -> jnp.ndarray:
    """KSG mutual information along the last axis.

    Args:
      x, y: ``(..., n)`` sample values; leading axes broadcast.
      k: neighbour count (reference default 3, CorrelationCalculator.hpp).
      estimator: 1 or 2 (Kraskov's two estimators).
      use_noise: add the deterministic tie-breaking noise.

    Returns:
      ``(...)`` float32 MI in nats, clamped to ≥ 0.
    """
    if estimator not in (1, 2):
        raise ValueError(f"estimator must be 1 or 2, got {estimator}")
    x, y = jnp.broadcast_arrays(x, y)
    n = x.shape[-1]
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    if use_noise:
        xf = _add_noise(xf, _key_ref())
        yf = _add_noise(yf, _key_query())

    dx = jnp.abs(xf[..., :, None] - xf[..., None, :])  # (..., n, n)
    dy = jnp.abs(yf[..., :, None] - yf[..., None, :])
    dcheb = jnp.maximum(dx, dy)

    # k+1 smallest including self (self-distance 0), as in the reference's
    # findKNearestNeighbors(point, k+1, ...) call.
    neg_top, _ = jax.lax.top_k(-dcheb, k + 1)  # over last axis

    if estimator == 1:
        kth = -neg_top[..., k]  # (..., n) k-th NN distance excluding self
        cx = _range_count(xf, kth - COUNT_EPSILON)
        cy = _range_count(yf, kth - COUNT_EPSILON)
        # counts include the centre itself => ψ(nx + 1) of the paper.
        a = jnp.mean(digamma(jnp.maximum(cx, 1).astype(jnp.float32)), axis=-1)
        b = jnp.mean(digamma(jnp.maximum(cy, 1).astype(jnp.float32)), axis=-1)
        c = digamma(float(k))
        d = digamma(float(n))
        mi = -a - b + c + d
    else:
        # Per-axis projections of the (k+1)-NN set (estimator 2 uses the
        # max per-axis distance among the joint-space neighbours).
        # TIE-INCLUSIVE: all points at the k-th distance participate —
        # the deterministic convention shared by the Pallas kernels
        # (ksg_kernel/ksg_banded use dch <= kth); top_k's index-order
        # tie-break silently diverged from them on exactly-tied data
        # (quantized ensembles where the 1e-5 noise rounds away at
        # values ≳512). The reference's own tie-break is arbitrary
        # k-d-tree order (MutualInformation.cpp:449-509), so any
        # deterministic member of the tie class is equally faithful.
        kth = -neg_top[..., k]
        nbr = dcheb <= kth[..., None]
        eps_x = jnp.max(jnp.where(nbr, dx, -jnp.inf), axis=-1)
        eps_y = jnp.max(jnp.where(nbr, dy, -jnp.inf), axis=-1)
        cx = _range_count(xf, eps_x + COUNT_EPSILON)
        cy = _range_count(yf, eps_y + COUNT_EPSILON)
        # Reference uses ψ(numPoints − 1) (centre excluded) — numPoints ≥
        # k+1 by construction, so the argument stays ≥ 1.
        a = jnp.mean(
            digamma(jnp.maximum(cx - 1, 1).astype(jnp.float32)), axis=-1
        )
        b = jnp.mean(
            digamma(jnp.maximum(cy - 1, 1).astype(jnp.float32)), axis=-1
        )
        c = digamma(float(k)) - 1.0 / k
        d = digamma(float(n))
        mi = -a - b + c + d

    return jnp.maximum(mi, 0.0).astype(jnp.float32)


def _range_count(v: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    """Count points of ``v`` in ``[v_i − r_i, v_i + r_i)`` per centre i.

    Mirrors the half-open interval produced by the reference's two
    binary searches (MutualInformation.cpp:201-233).
    """
    lo = v[..., :, None] - radius[..., :, None]
    hi = v[..., :, None] + radius[..., :, None]
    vj = v[..., None, :]
    inside = (vj >= lo) & (vj < hi)
    return jnp.sum(inside, axis=-1)


def maximum_mutual_information_kraskov(k: int, n: int) -> float:
    """ψ(n) − ψ(k): the KSG estimator's maximum attainable value.

    Reference: computeMaximumMutualInformationKraskov
    (MutualInformation.cpp:526-528); used to normalize KMI variants.
    """
    import scipy.special

    return float(scipy.special.digamma(n) - scipy.special.digamma(k))


def kmi_correlation_coefficient(mi: jnp.ndarray) -> jnp.ndarray:
    """sqrt(1 − exp(−2·MI)); reference CorrelationCalculator.cpp:1130-1131."""
    return jnp.sqrt(jnp.maximum(1.0 - jnp.exp(-2.0 * mi), 0.0))
