"""Bayesian-optimization block-pair sampler: GP(Matern-5/2) + UCB.

Reference: src/Renderers/Diagram/BayOpt.hpp (limbo GP, UCB acquisition,
nlopt inner optimizer, used per block pair at
HEBChartCorrelation.cpp:909-918). JAX re-design: the GP posterior is a
small dense solve (≤ ~100 points/pair), the inner acquisition
"optimizer" is a dense quasirandom candidate sweep, and — like limbo's
hyperparameter optimization (BayOpt.hpp:86-127) — the kernel length
scale is refit by maximum marginal likelihood over the observed points
(signal variance profiled out in closed form). A fixed wrong-scale
kernel degrades UCB to quasirandom sampling on 6D pair spaces.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.diagrams.sampling import (
    plastic_sequence,
    _region_points,
)

#: Candidate length scales for the marginal-likelihood refit.
_LS_GRID = np.geomspace(0.05, 2.0, 12).astype(np.float32)


def matern52(x1: jnp.ndarray, x2: jnp.ndarray, length_scale=0.3,
             variance=1.0) -> jnp.ndarray:
    """Matern-5/2 kernel matrix between (N, D) and (M, D) points."""
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum((x1[:, None, :] - x2[None, :, :]) ** 2, axis=-1), 1e-30
        )
    )
    s = jnp.sqrt(5.0) * d / length_scale
    return variance * (1.0 + s + s * s / 3.0) * jnp.exp(-s)


@jax.jit
def gp_posterior(x_train, y_train, x_query, length_scale, variance,
                 noise=1e-4, mask=None):
    """GP mean/std at query points (zero-mean prior, Matern-5/2).

    ``mask`` (0/1 per train point) supports fixed-capacity buffers:
    masked rows/columns of K collapse to the identity and their
    k* columns to zero, so the posterior equals the unmasked GP over
    the active subset — while every call keeps one static shape (the
    growing-train-set alternative recompiles each BayOpt iteration,
    which on TPU costs seconds per step).
    """
    if mask is None:
        mask = jnp.ones(x_train.shape[0], x_train.dtype)
    mm = mask[:, None] * mask[None, :]
    k = matern52(x_train, x_train, length_scale, variance) * mm
    k = k + noise * jnp.eye(k.shape[0]) + jnp.diag(1.0 - mask)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y_train * mask)
    k_star = (matern52(x_query, x_train, length_scale, variance)
              * mask[None, :])  # (Q, N)
    mean = k_star @ alpha
    v = jax.scipy.linalg.solve_triangular(chol, k_star.T, lower=True)
    var = jnp.maximum(variance - jnp.sum(v * v, axis=0), 1e-10)
    return mean, jnp.sqrt(var)


@jax.jit
def fit_gp_hyperparams(x_train, y_train, noise=1e-4, mask=None):
    """Max-marginal-likelihood (length_scale, variance) over a grid.

    With a unit-variance correlation matrix K_ls, the optimal signal
    variance is closed-form (σ² = yᵀK⁻¹y / N), so the profiled log
    marginal likelihood reduces to
        LML(ls) ∝ −N/2 · log σ²(ls) − ½ log|K_ls|.
    Vectorized over the candidate grid (limbo optimizes the same
    likelihood with gradient steps, BayOpt.hpp:86-127).
    """
    cap = x_train.shape[0]
    if mask is None:
        mask = jnp.ones(cap, x_train.dtype)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    mm = mask[:, None] * mask[None, :]
    ym = y_train * mask

    def lml(ls):
        # Masked points contribute identity rows (constant log-det
        # offset across the ls grid — argmax unaffected; see
        # gp_posterior).
        k = matern52(x_train, x_train, ls, 1.0) * mm
        k = k + noise * jnp.eye(cap) + jnp.diag(1.0 - mask)
        chol = jnp.linalg.cholesky(k)
        alpha = jax.scipy.linalg.cho_solve((chol, True), ym)
        sigma2 = jnp.maximum(jnp.dot(ym, alpha) / n, 1e-10)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return -0.5 * n * jnp.log(sigma2) - 0.5 * logdet, sigma2

    scores, sigma2s = jax.vmap(lml)(jnp.asarray(_LS_GRID))
    best = jnp.argmax(scores)
    return jnp.asarray(_LS_GRID)[best], sigma2s[best]


def bayesian_opt_max(
    stack: np.ndarray,
    region_a,
    region_b,
    measure="pearson",
    num_init: int = 20,
    num_iters: int = 60,
    kappa: float = 1.5,
    num_candidates: int = 512,
    seed: int = 0,
    refit_every: int = 10,
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
            ops.correlate_jit(
                jnp.asarray(sa), jnp.asarray(sb), measure,
                absolute=True, **measure_kw,
            )
        )
        return np.nan_to_num(vals, nan=0.0)

    # Fixed-capacity masked buffers: every GP call sees one static
    # shape, so the jitted posterior/refit compile exactly once.
    cap = num_init + num_iters
    x = np.zeros((cap, 6), np.float32)
    y = np.zeros(cap, np.float32)
    x[:num_init] = plastic_sequence(num_init, 6)
    y[:num_init] = evaluate(x[:num_init])
    count = num_init

    rng = np.random.default_rng(seed)
    ls, var = 0.3, 1.0
    for it in range(num_iters):
        mask = np.zeros(cap, np.float32)
        mask[:count] = 1.0
        y_mean = y[:count].mean()
        y_c = np.where(mask > 0, y - y_mean, 0.0).astype(np.float32)
        if it % refit_every == 0:
            ls_j, var_j = fit_gp_hyperparams(
                jnp.asarray(x), jnp.asarray(y_c), mask=jnp.asarray(mask)
            )
            ls, var = float(ls_j), float(var_j)
        candidates = rng.random((num_candidates, 6))
        mean, std = gp_posterior(
            jnp.asarray(x), jnp.asarray(y_c),
            jnp.asarray(candidates, jnp.float32),
            jnp.float32(ls), jnp.float32(var), mask=jnp.asarray(mask),
        )
        ucb = np.asarray(mean) + y_mean + kappa * np.asarray(std)
        best = np.argmax(ucb)
        x_new = candidates[best : best + 1].astype(np.float32)
        x[count] = x_new[0]
        y[count] = evaluate(x_new)[0]
        count += 1

    return float(y[:count].max())
