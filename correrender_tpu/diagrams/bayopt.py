"""Bayesian-optimization block-pair sampler: GP(Matern-5/2) + UCB.

Reference: src/Renderers/Diagram/BayOpt.hpp (limbo GP, UCB acquisition,
nlopt inner optimizer, used per block pair at
HEBChartCorrelation.cpp:909-918). JAX re-design: the GP posterior is a
small dense solve (≤ ~100 points/pair), and the inner acquisition
"optimizer" is a dense quasirandom candidate sweep — vmappable across
candidates, no nlopt.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.diagrams.sampling import (
    plastic_sequence,
    _region_points,
)


def matern52(x1: jnp.ndarray, x2: jnp.ndarray, length_scale: float = 0.3,
             variance: float = 1.0) -> jnp.ndarray:
    """Matern-5/2 kernel matrix between (N, D) and (M, D) points."""
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2, axis=-1), 1e-30
        )
    )
    s = jnp.sqrt(5.0) * d / length_scale
    return variance * (1.0 + s + s * s / 3.0) * jnp.exp(-s)


@jax.jit
def gp_posterior(x_train, y_train, x_query, noise=1e-4):
    """GP mean/std at query points (zero-mean prior, Matern-5/2)."""
    k = matern52(x_train, x_train)
    k = k + noise * jnp.eye(k.shape[0])
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y_train)
    k_star = matern52(x_query, x_train)  # (Q, N)
    mean = k_star @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, k_star.T, lower=True)
    var = jnp.maximum(
        matern52(x_query, x_query)[
            jnp.arange(x_query.shape[0]), jnp.arange(x_query.shape[0])
        ]
        - jnp.sum(v * v, axis=0),
        1e-10,
    )
    return mean, jnp.sqrt(var)


def bayesian_opt_max(
    stack: np.ndarray,
    region_a,
    region_b,
    measure="pearson",
    num_init: int = 20,
    num_iters: int = 60,
    kappa: float = 2.0,
    num_candidates: int = 512,
    seed: int = 0,
    **measure_kw,
) -> float:
    """Max |corr| over A×B via GP-UCB on the 6D pair-position space."""
    stack = np.asarray(stack)

    def evaluate(u6: np.ndarray) -> np.ndarray:
        pa = _region_points(region_a, u6[:, :3])
        pb = _region_points(region_b, u6[:, 3:])
        sa = stack[pa[:, 2], pa[:, 1], pa[:, 0]]
        sb = stack[pb[:, 2], pb[:, 1], pb[:, 0]]
        vals = np.asarray(
            ops.correlate(
                jnp.asarray(sa), jnp.asarray(sb), measure,
                absolute=True, **measure_kw,
            )
        )
        return np.nan_to_num(vals, nan=0.0)

    x = plastic_sequence(num_init, 6)
    y = evaluate(x)

    rng = np.random.default_rng(seed)
    for _ in range(num_iters):
        candidates = rng.random((num_candidates, 6))
        mean, std = gp_posterior(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(y, jnp.float32),
            jnp.asarray(candidates, jnp.float32),
        )
        ucb = np.asarray(mean) + kappa * np.asarray(std)
        best = np.argmax(ucb)
        x_new = candidates[best : best + 1]
        y_new = evaluate(x_new)
        x = np.concatenate([x, x_new])
        y = np.concatenate([y, y_new])

    return float(y.max())
