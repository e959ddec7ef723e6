"""t-SNE embedding in JAX (exact O(n²), TPU-vectorized).

Replaces the reference's vendored Barnes-Hut C++ t-SNE
(src/Renderers/Diagram/DistributionSimilarity/ + bhtsne/,
DistributionSimilarityRenderer.cpp:636-639). For the ~10³–10⁴ points
the distribution-similarity view uses, the exact O(n²) gradient is a
dense matrix program that the MXU/VPU eat for breakfast — no tree
needed (SURVEY.md §2.10 item 9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_sq_dists(x):
    s = jnp.sum(x * x, axis=1)
    d = s[:, None] - 2.0 * (x @ x.T) + s[None, :]
    return jnp.maximum(d, 0.0)


def _binary_search_perplexity(d2, perplexity, iters=32):
    """Per-point beta (1/2σ²) matching the target perplexity."""
    n = d2.shape[0]
    log_perp = jnp.log(perplexity)
    eye = jnp.eye(n, dtype=bool)

    def entropy_and_p(beta):
        p = jnp.exp(-d2 * beta[:, None])
        p = jnp.where(eye, 0.0, p)
        sum_p = jnp.maximum(jnp.sum(p, axis=1), 1e-12)
        h = jnp.log(sum_p) + beta * jnp.sum(d2 * p, axis=1) / sum_p
        return h, p / sum_p[:, None]

    def body(_, state):
        beta, lo, hi = state
        h, _ = entropy_and_p(beta)
        too_high = h > log_perp  # entropy too high → increase beta
        lo = jnp.where(too_high, beta, lo)
        hi = jnp.where(too_high, hi, beta)
        beta = jnp.where(
            jnp.isinf(hi), beta * 2.0, 0.5 * (lo + hi)
        )
        return beta, lo, hi

    beta0 = jnp.ones(n)
    lo0 = jnp.zeros(n)
    hi0 = jnp.full(n, jnp.inf)
    beta, _, _ = jax.lax.fori_loop(0, iters, body, (beta0, lo0, hi0))
    _, p = entropy_and_p(beta)
    return p


@functools.partial(
    jax.jit, static_argnames=("num_iters", "perplexity", "early_exag_iters")
)
def _tsne_run(x, key, num_iters, perplexity, early_exag_iters):
    n = x.shape[0]
    d2 = _pairwise_sq_dists(x)
    p_cond = _binary_search_perplexity(d2, perplexity)
    p = (p_cond + p_cond.T) / (2.0 * n)
    p = jnp.maximum(p, 1e-12)

    y0 = 1e-4 * jax.random.normal(key, (n, 2))
    eye = jnp.eye(n, dtype=bool)

    def grad_kl(y, exaggeration):
        dy2 = _pairwise_sq_dists(y)
        q_num = 1.0 / (1.0 + dy2)
        q_num = jnp.where(eye, 0.0, q_num)
        q = jnp.maximum(q_num / jnp.sum(q_num), 1e-12)
        pq = (exaggeration * p - q) * q_num  # (n, n)
        return 4.0 * (
            jnp.sum(pq, axis=1, keepdims=True) * y - pq @ y
        )

    def body(i, state):
        y, vel, gains = state
        exag = jnp.where(i < early_exag_iters, 12.0, 1.0)
        g = grad_kl(y, exag)
        # van der Maaten gains: grow when gradient opposes velocity.
        same_sign = (g > 0) == (vel > 0)
        gains = jnp.clip(
            jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01, None
        )
        momentum = jnp.where(i < 250, 0.5, 0.8)
        vel = momentum * vel - 200.0 * gains * g
        y = y + vel
        y = y - jnp.mean(y, axis=0, keepdims=True)
        return y, vel, gains

    y, _, _ = jax.lax.fori_loop(
        0, num_iters, body,
        (y0, jnp.zeros_like(y0), jnp.ones_like(y0)),
    )
    return y


def tsne(
    features: np.ndarray,
    perplexity: float = 30.0,
    num_iters: int = 500,
    seed: int = 0,
) -> np.ndarray:
    """2D t-SNE embedding of (N, D) feature vectors."""
    x = jnp.asarray(np.asarray(features, np.float32))
    perplexity = min(perplexity, (x.shape[0] - 1) / 3.0)
    key = jax.random.key(seed)
    return np.asarray(
        _tsne_run(x, key, num_iters, float(perplexity), 100)
    )
