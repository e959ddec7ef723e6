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


def _pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared Euclidean distances, (..., N, D) × (..., M, D) → (..., N, M).

    The |x|²+|y|²−2x·y matmul form keeps the working set at
    O(N·M), not O(N·M·D) — and the dot rides the MXU.
    """
    an = jnp.sum(a * a, axis=-1)
    bn = jnp.sum(b * b, axis=-1)
    ab = a @ jnp.swapaxes(b, -1, -2)
    return jnp.maximum(an[..., :, None] + bn[..., None, :] - 2.0 * ab, 0.0)


def _matern52_from_sq(sq, length_scale, variance):
    d = jnp.sqrt(jnp.maximum(sq, 1e-30))
    s = jnp.sqrt(5.0) * d / length_scale
    return variance * (1.0 + s + s * s / 3.0) * jnp.exp(-s)


@functools.lru_cache(maxsize=32)
def _batched_bayopt_program(measure, kw_items, num_init, num_iters,
                            num_candidates, kappa, refit_every, noise,
                            signed=False):
    """Whole-BayOpt-as-one-XLA-program, vmapped over P block pairs.

    TPU-native redesign of the per-pair limbo loop
    (HEBChartCorrelation.cpp:909-918): the reference runs an
    independent CPU GP per block pair; here ALL pairs advance in
    lockstep inside one ``lax.fori_loop`` — batched Cholesky
    posteriors, shared candidate sweeps, and the measure evaluation
    gathered in-program — so a 512-leaf HEB chart issues ~1 dispatch
    per pair-chunk instead of ~120 host round-trips per pair.
    """
    kw = dict(kw_items)
    cap = num_init + num_iters
    ls_grid = jnp.asarray(_LS_GRID)

    @jax.jit
    def run(stack, lo_a, hi_a, lo_b, hi_b, u_init, key):
        from correrender_tpu import ops as _ops

        p = lo_a.shape[0]
        n = stack.shape[-1]
        zs, ys, xs = stack.shape[:3]
        flat = stack.reshape(-1, n)
        eye = jnp.eye(cap, dtype=jnp.float32)

        def eval_points(u6):
            # u6: (p, 6) in [0,1) → |corr| at one sampled voxel pair
            # per region pair. lo/hi are (p, 3) xyz voxel bounds.
            pa = jnp.minimum(
                (lo_a + u6[:, :3] * (hi_a - lo_a + 1)).astype(jnp.int32),
                hi_a.astype(jnp.int32),
            )
            pb = jnp.minimum(
                (lo_b + u6[:, 3:] * (hi_b - lo_b + 1)).astype(jnp.int32),
                hi_b.astype(jnp.int32),
            )
            ia = (pa[:, 2] * ys + pa[:, 1]) * xs + pa[:, 0]
            ib = (pb[:, 2] * ys + pb[:, 1]) * xs + pb[:, 0]
            # SIGNED evaluation; the GP models |corr| (the sampler
            # estimates the max-MAGNITUDE correlation in both modes),
            # and signed charts report the sign at the winning probe.
            return _ops.correlate(
                flat[ia], flat[ib], measure, absolute=False, **kw
            )  # RAW (NaN probes kept: callers track finiteness)

        def chol_terms(x, y_c, mask, ls, var):
            """Cholesky + weights of the masked Matern GP."""
            sq = _pairwise_sqdist(x, x)
            mm = mask[:, :, None] * mask[:, None, :]
            k = (_matern52_from_sq(sq, ls[:, None, None],
                                   var[:, None, None]) * mm
                 + noise * eye + (1.0 - mask)[:, :, None] * eye)
            chol = jnp.linalg.cholesky(k)
            alpha = jax.scipy.linalg.cho_solve(
                (chol, True), y_c[..., None]
            )[..., 0]
            return chol, alpha

        def refit(x, y_c, mask, nact):
            """Per-pair profiled-LML grid refit (see
            fit_gp_hyperparams for the math)."""
            sq = _pairwise_sqdist(x, x)
            mm = mask[:, :, None] * mask[:, None, :]

            def score_ls(ls):
                k = (_matern52_from_sq(sq, ls, 1.0) * mm
                     + noise * eye + (1.0 - mask)[:, :, None] * eye)
                chol = jnp.linalg.cholesky(k)
                alpha = jax.scipy.linalg.cho_solve(
                    (chol, True), y_c[..., None]
                )[..., 0]
                sigma2 = jnp.maximum(
                    jnp.sum(y_c * alpha, axis=1) / nact, 1e-10
                )
                logdet = 2.0 * jnp.sum(
                    jnp.log(jnp.diagonal(chol, axis1=1, axis2=2)), axis=1
                )
                return -0.5 * nact * jnp.log(sigma2) - 0.5 * logdet, sigma2

            def step(carry, ls):
                best_score, best_ls, best_var = carry
                score, sigma2 = score_ls(ls)
                better = score > best_score
                return (
                    jnp.where(better, score, best_score),
                    jnp.where(better, ls, best_ls),
                    jnp.where(better, sigma2, best_var),
                ), None

            init = (jnp.full((p,), -jnp.inf), jnp.full((p,), 0.3),
                    jnp.ones((p,)))
            (best_score, best_ls, best_var), _ = jax.lax.scan(
                step, init, ls_grid
            )
            return best_ls, best_var

        # -- init: num_init plastic points shared across pairs --------
        x = jnp.zeros((p, cap, 6), jnp.float32)
        x = x.at[:, :num_init].set(u_init[None])
        y_init = jax.vmap(
            lambda u: eval_points(jnp.broadcast_to(u, (p, 6)))
        )(u_init)  # (num_init, p)
        # A pair whose probes are ALL NaN (fully masked regions) must
        # return NaN like every other sampler — nan_to_num-ing it to
        # 0.0 fabricated chords under the default correlation_range
        # (round-3 review). NaN probes are zero-filled for the GP
        # (it needs finite y) but tracked.
        seen_finite = jnp.any(jnp.isfinite(y_init), axis=0)  # (p,)
        # y: |corr| (what the GP optimizes); ysgn: the signed value at
        # the same probe (reported on absolute=False charts — the GP
        # itself always maximizes magnitude).
        y = jnp.zeros((p, cap), jnp.float32).at[:, :num_init].set(
            jnp.abs(jnp.nan_to_num(y_init)).T)
        ysgn = jnp.zeros((p, cap), jnp.float32).at[:, :num_init].set(
            jnp.nan_to_num(y_init).T)

        iota = jnp.arange(cap, dtype=jnp.float32)

        def body(it, state):
            x, y, ysgn, ls, var, seen = state
            count = num_init + it
            mask = jnp.broadcast_to(
                (iota[None, :] < count).astype(jnp.float32), (p, cap)
            )
            nact = jnp.asarray(count, jnp.float32)
            ymean = jnp.sum(y * mask, axis=1) / nact
            y_c = (y - ymean[:, None]) * mask

            ls, var = jax.lax.cond(
                it % refit_every == 0,
                lambda _: refit(x, y_c, mask, nact),
                lambda _: (ls, var),
                None,
            )

            chol, alpha = chol_terms(x, y_c, mask, ls, var)
            candidates = jax.random.uniform(
                jax.random.fold_in(key, it), (num_candidates, 6),
                jnp.float32,
            )
            sq_star = _pairwise_sqdist(candidates[None], x)  # (p, C, cap)
            k_star = (_matern52_from_sq(sq_star, ls[:, None, None],
                                        var[:, None, None])
                      * mask[:, None, :])
            mean = jnp.einsum("pck,pk->pc", k_star, alpha)
            v = jax.scipy.linalg.solve_triangular(
                chol, jnp.swapaxes(k_star, 1, 2), lower=True
            )  # (p, cap, C)
            varq = jnp.maximum(
                var[:, None] - jnp.sum(v * v, axis=1), 1e-10
            )
            ucb = mean + ymean[:, None] + kappa * jnp.sqrt(varq)
            x_new = candidates[jnp.argmax(ucb, axis=1)]  # (p, 6)
            y_new = eval_points(x_new)
            seen = seen | jnp.isfinite(y_new)
            x = jax.lax.dynamic_update_slice(
                x, x_new[:, None, :], (0, count, 0)
            )
            y = jax.lax.dynamic_update_slice(
                y, jnp.abs(jnp.nan_to_num(y_new))[:, None], (0, count))
            ysgn = jax.lax.dynamic_update_slice(
                ysgn, jnp.nan_to_num(y_new)[:, None], (0, count))
            return x, y, ysgn, ls, var, seen

        state = (x, y, ysgn, jnp.full((p,), 0.3, jnp.float32),
                 jnp.ones((p,), jnp.float32), seen_finite)
        x, y, ysgn, _, _, seen_finite = jax.lax.fori_loop(
            0, num_iters, body, state)
        if signed:
            idx = jnp.argmax(y, axis=1)
            best = jnp.take_along_axis(ysgn, idx[:, None], axis=1)[:, 0]
        else:
            best = jnp.max(y, axis=1)
        return jnp.where(seen_finite, best, jnp.nan)

    return run


def batched_bayesian_opt_max(
    stack,
    regions_a,
    regions_b,
    measure="pearson",
    num_init: int = 20,
    num_iters: int = 60,
    kappa: float = 1.5,
    num_candidates: int = 512,
    seed: int = 0,
    refit_every: int = 10,
    pair_chunk: int = 2048,
    **measure_kw,
) -> np.ndarray:
    """GP-UCB max |corr| for MANY region pairs at once → (P,) floats.

    Same estimator as :func:`bayesian_opt_max` but every pair's GP
    advances inside one jitted program (see
    :func:`_batched_bayopt_program`); pairs are chunked to bound the
    (chunk, cap, cap) Cholesky workspace.
    """
    from correrender_tpu.ops.registry import (
        hashable_kwargs,
        measure_from_id,
    )

    m = measure_from_id(measure)
    # The GP always optimizes |corr| (max-magnitude estimation); the
    # flag only selects whether the REPORTED value keeps its sign —
    # signed (absolute=False) HEB charts filter on signed values, and
    # an always-|corr| bayesian sampler silently emptied their
    # negative correlation_range (round-3 review).
    absolute = bool(measure_kw.pop("absolute", True))
    key = hashable_kwargs(measure_kw)
    if key is None:
        raise ValueError(
            "batched_bayesian_opt_max bakes measure kwargs into a "
            "compiled program; pass scalar values, not arrays"
        )
    if num_iters <= 0:
        # Pure quasirandom budget — no GP to run.
        from correrender_tpu.diagrams.sampling import (
            batched_block_pairs_max,
        )

        return batched_block_pairs_max(
            stack, regions_a, regions_b, measure, method="plastic",
            num_samples=max(num_init, 1), absolute=absolute,
            **measure_kw,
        )
    prog = _batched_bayopt_program(
        m, key, num_init, num_iters, num_candidates, float(kappa),
        int(refit_every), 1e-4, signed=not absolute,
    )
    stack_dev = jax.device_put(jnp.asarray(stack))
    u_init = jnp.asarray(plastic_sequence(num_init, 6), jnp.float32)

    def bounds(regions):
        lo = np.array(
            [[r.x_min, r.y_min, r.z_min] for r in regions], np.int32
        )
        hi = np.array(
            [[r.x_max, r.y_max, r.z_max] for r in regions], np.int32
        )
        return lo, hi

    lo_a, hi_a = bounds(regions_a)
    lo_b, hi_b = bounds(regions_b)
    p = len(regions_a)
    if p < pair_chunk:
        # Pad small batches to the next power of two so repeated
        # drill-down levels reuse a handful of compiled programs.
        pair_chunk = 1 << (p - 1).bit_length() if p > 1 else 1
    outs = []
    for start in range(0, p, pair_chunk):
        end = min(start + pair_chunk, p)
        sl = slice(start, end)
        # Pad the final chunk to the canonical size so every chunk
        # reuses one compiled program.
        pad = pair_chunk - (end - start)
        if pad:
            pad_rows = np.zeros((pad, 3), np.int32)
            args = [np.concatenate([a[sl], pad_rows]) for a in
                    (lo_a, hi_a, lo_b, hi_b)]
        else:
            args = [lo_a[sl], hi_a[sl], lo_b[sl], hi_b[sl]]
        outs.append(prog(
            stack_dev, *map(jnp.asarray, args), u_init,
            jax.random.key(seed),
        ))
    vals = np.concatenate([np.asarray(o) for o in outs])
    return vals[:p]


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
    """Max |corr| over A×B via GP-UCB on the 6D pair-position space.

    With ``absolute=False`` in ``measure_kw`` the GP still maximizes
    |corr| but the return value keeps the sign at the winning probe
    (matching the batched path and the other samplers).
    """
    stack = np.asarray(stack)
    absolute = bool(measure_kw.pop("absolute", True))

    def evaluate(u6: np.ndarray) -> np.ndarray:
        pa = _region_points(region_a, u6[:, :3])
        pb = _region_points(region_b, u6[:, 3:])
        sa = stack[pa[:, 2], pa[:, 1], pa[:, 0]]
        sb = stack[pb[:, 2], pb[:, 1], pb[:, 0]]
        vals = np.asarray(
            ops.correlate_jit(
                jnp.asarray(sa), jnp.asarray(sb), measure,
                absolute=False, **measure_kw,
            )
        )
        return np.nan_to_num(vals, nan=0.0)

    # Fixed-capacity masked buffers: every GP call sees one static
    # shape, so the jitted posterior/refit compile exactly once.
    cap = num_init + num_iters
    x = np.zeros((cap, 6), np.float32)
    y = np.zeros(cap, np.float32)  # |corr| — the GP's objective
    ysgn = np.zeros(cap, np.float32)  # signed value at the same probe
    x[:num_init] = plastic_sequence(num_init, 6)
    ysgn[:num_init] = evaluate(x[:num_init])
    y[:num_init] = np.abs(ysgn[:num_init])
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
        ysgn[count] = evaluate(x_new)[0]
        y[count] = abs(ysgn[count])
        count += 1

    if absolute:
        return float(y[:count].max())
    return float(ysgn[:count][int(np.argmax(y[:count]))])
