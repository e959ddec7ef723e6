"""Synthetic ensemble generators for tests and benchmarks.

Re-creates the behavior of the reference's
``scripts/generate_synth_box_ensembles.py`` (planted correlated boxes in
a Gaussian background) as vectorized numpy — the fixture underlying the
TVCG-2024 replicability scene (``linear_4x4.nc``) — plus a small
multivariate-Gaussian pair generator used by the sampling tests
(reference: src/Renderers/Diagram/Test/MultivariateGaussian.{hpp,cpp}).
"""

from __future__ import annotations

import numpy as np


def peak_profile(dist: np.ndarray) -> np.ndarray:
    """Quartic-ish bump: 1 − max(0, 2|d| − 1)² inside |d| < 1, else 0."""
    inner = np.maximum(0.0, np.abs(dist) * 2.0 - 1.0) ** 2
    return np.where(dist >= 1.0, 0.0, 1.0 - inner)


def synth_box_lambda_field(
    xs: int = 128, ys: int = 128, zs: int = 32
) -> np.ndarray:
    """Correlation-strength field λ(z,y,x) with the 4×4 planted-box layout."""
    g = zs // 2
    peaks = [
        (g, g, 2.0 * g, 1.0),
        (7 * g, 7 * g, 2.0 * g, 1.0),
        (2.5 * g, 0.5 * g, g, 1.0),
        (2.5 * g, 1.5 * g, g, 1.0),
        (5.5 * g, 6.5 * g, g, 1.0),
        (5.5 * g, 7.5 * g, g, 1.0),
        (0.5 * g, 2.5 * g, g, 1.0),
        (1.5 * g, 2.5 * g, g, 1.0),
        (6.5 * g, 5.5 * g, g, 1.0),
        (7.5 * g, 5.5 * g, g, 1.0),
    ]
    z, y, x = np.meshgrid(
        np.arange(zs), np.arange(ys), np.arange(xs), indexing="ij"
    )
    cz = zs // 2
    field = np.zeros((zs, ys, xs))
    for cx, cy, size, scale in peaks:
        dist = np.maximum.reduce(
            [np.abs(x - cx), np.abs(y - cy), np.abs(z - cz)]
        ) / (size * 0.5)
        field += scale * peak_profile(dist)
    return field


def synth_box_ensemble(
    xs: int = 32,
    ys: int = 32,
    zs: int = 8,
    members: int = 100,
    linear: bool = True,
    seed: int = 0,
    dtype=np.float32,
) -> np.ndarray:
    """Ensemble ``(members, zs, ys, xs)`` with planted correlated boxes.

    Each voxel's member series is ``λ·s1 + (1−λ)·s0`` with s0 i.i.d.
    normal and s1 a shared linear ramp, so voxels inside a box
    correlate strongly with each other. NOTE the default layout
    (matching the reference generate_synth_box_ensembles.py, where
    every peak scale is +1.0) only produces POSITIVE λ — the
    negative-sign branch below exists for callers planting
    negative-scale peaks, not for the stock 4×4 layout.
    """
    lam = synth_box_lambda_field(xs, ys, zs)
    rng = np.random.default_rng(seed)
    if linear:
        s1p = 2.0 * np.linspace(0.0, 1.0, members) - 1.0
        s1n = -s1p
    else:
        s1p = np.sin(np.linspace(0.0, 2.0 * np.pi, members))
        s1n = np.cos(np.linspace(0.0, 2.0 * np.pi, members))
    sign = np.where(lam >= 0.0, 1.0, -1.0)
    lam_abs = np.abs(lam)
    s0 = rng.normal(0.0, 1.0, size=(members, zs, ys, xs))
    s1 = np.where(sign[None] >= 0, s1p[:, None, None, None], s1n[:, None, None, None])
    data = lam_abs[None] * s1 + (1.0 - lam_abs[None]) * s0
    return data.astype(dtype)


def multivariate_gaussian_pair(
    num_points: int, members: int, rho: float, seed: int = 0
):
    """Two blocks of series with known cross-correlation ``rho``.

    Returns ``(a, b)`` of shape ``(num_points, members)`` each; every
    pair (a[i], b[j]) has population correlation rho.
    """
    if not 0.0 <= rho <= 1.0:
        raise ValueError("rho must be in [0, 1]")
    rng = np.random.default_rng(seed)
    shared = rng.normal(size=(members,))
    c = np.sqrt(rho)
    s = np.sqrt(1.0 - rho)
    a = c * shared + s * rng.normal(size=(num_points, members))
    b = c * shared + s * rng.normal(size=(num_points, members))
    return a.astype(np.float32), b.astype(np.float32)
