"""Block-pair maximum-correlation samplers for the HEB chart.

Reference: src/Renderers/Diagram/Sampling.{hpp,cpp} — estimating
``max_{(i,j) ∈ A×B} |corr(i, j)|`` for a pair of octree regions
without evaluating all |A|·|B| voxel pairs. Methods (Sampling.hpp:34-40):
Mean (on downscaled block means), Random-Uniform, Quasirandom Halton,
Quasirandom Plastic, and Bayesian Optimization (bayopt.py).

All samplers evaluate their probe batches through one vectorized
estimator call — the TPU replacement for the reference's per-pair GPU
request buffers (CorrelationMain.glsl request mode).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from correrender_tpu import ops


def halton(index: np.ndarray, base: int) -> np.ndarray:
    """Halton low-discrepancy sequence values for 1-based indices."""
    result = np.zeros(index.shape, np.float64)
    f = 1.0 / base
    i = index.astype(np.int64).copy()
    while np.any(i > 0):
        result += f * (i % base)
        i //= base
        f /= base
    return result


def plastic_sequence(n: int, dim: int) -> np.ndarray:
    """R_d quasirandom ('plastic') sequence in [0,1)^dim."""
    # Generalized golden ratio: x^(dim+1) = x + 1.
    phi = 2.0
    for _ in range(30):
        phi = (1 + phi) ** (1.0 / (dim + 1))
    alpha = np.array([1.0 / phi ** (k + 1) for k in range(dim)])
    idx = np.arange(1, n + 1)[:, None]
    return (0.5 + idx * alpha[None, :]) % 1.0


def _region_points(region, u: np.ndarray) -> np.ndarray:
    """Map unit-cube samples to integer voxel coords of a region."""
    lo = np.array([region.x_min, region.y_min, region.z_min])
    hi = np.array([region.x_max, region.y_max, region.z_max])
    return np.minimum(
        (lo + u * (hi - lo + 1)).astype(np.int64), hi
    )


def _pairs_to_series(stack, region_a, region_b, ua, ub):
    pa = _region_points(region_a, ua)
    pb = _region_points(region_b, ub)
    sa = stack[pa[:, 2], pa[:, 1], pa[:, 0]]  # (S, n)
    sb = stack[pb[:, 2], pb[:, 1], pb[:, 0]]
    return sa, sb


def _eval_max(sa, sb, measure, **kw):
    vals = np.asarray(
        ops.correlate_jit(jnp.asarray(sa), jnp.asarray(sb), measure,
                          absolute=True, **kw)
    )
    vals = vals[np.isfinite(vals)]
    return float(vals.max()) if len(vals) else float("nan")


def sample_mean(stack, region_a, region_b, measure, num_samples=None,
                seed=None, subsample: int = 1, **kw):
    """Mean method: correlation of the two regions' block-mean series
    (computeCorrelationsMean on downscaled fields,
    HEBChartCorrelation.cpp:457). ``subsample`` strides the voxels
    entering the mean — the reference's mean-field subsampling factor
    f (SamplingTest.cpp test-case parameter)."""

    def region_mean_series(r):
        sub = stack[
            r.z_min : r.z_max + 1 : subsample,
            r.y_min : r.y_max + 1 : subsample,
            r.x_min : r.x_max + 1 : subsample,
        ]
        with np.errstate(invalid="ignore"):
            return np.nanmean(
                np.asarray(sub).reshape(-1, sub.shape[-1]), axis=0
            )

    sa = region_mean_series(region_a)[None]
    sb = region_mean_series(region_b)[None]
    return _eval_max(sa, sb, measure, **kw)


def sample_random(stack, region_a, region_b, measure, num_samples=100,
                  seed=0, **kw):
    rng = np.random.default_rng(seed)
    ua = rng.random((num_samples, 3))
    ub = rng.random((num_samples, 3))
    sa, sb = _pairs_to_series(stack, region_a, region_b, ua, ub)
    return _eval_max(sa, sb, measure, **kw)


def sample_halton(stack, region_a, region_b, measure, num_samples=100,
                  seed=None, **kw):
    idx = np.arange(1, num_samples + 1)
    ua = np.stack([halton(idx, b) for b in (2, 3, 5)], axis=-1)
    ub = np.stack([halton(idx, b) for b in (7, 11, 13)], axis=-1)
    sa, sb = _pairs_to_series(stack, region_a, region_b, ua, ub)
    return _eval_max(sa, sb, measure, **kw)


def sample_plastic(stack, region_a, region_b, measure, num_samples=100,
                   seed=None, **kw):
    u = plastic_sequence(num_samples, 6)
    sa, sb = _pairs_to_series(stack, region_a, region_b, u[:, :3], u[:, 3:])
    return _eval_max(sa, sb, measure, **kw)


def sample_bayopt(stack, region_a, region_b, measure, num_samples=100,
                  num_init=20, seed=0, **kw):
    from correrender_tpu.diagrams.bayopt import bayesian_opt_max

    return bayesian_opt_max(
        stack, region_a, region_b, measure,
        num_init=min(num_init, num_samples),
        num_iters=max(num_samples - num_init, 0),
        seed=seed, **kw,
    )


SAMPLING_METHODS = {
    "mean": sample_mean,
    "random": sample_random,
    "halton": sample_halton,
    "plastic": sample_plastic,
    "bayesian": sample_bayopt,
}


def sample_block_pair_max(
    stack, region_a, region_b, measure="pearson", method="plastic",
    stack_means=None, **kw,
):
    """Estimate max |corr| between two regions with the chosen method.

    ``stack_means`` is accepted for API compatibility but unused — the
    mean method derives region means from the stack directly.
    """
    del stack_means
    return SAMPLING_METHODS[method](stack, region_a, region_b, measure, **kw)


def batched_block_pairs_max(
    stack,
    regions_a,
    regions_b,
    measure="pearson",
    method="plastic",
    num_samples=100,
    seed=0,
    request_chunk=None,
    **kw,
):
    """Max |corr| for MANY region pairs in batched device dispatches.

    The reference batches all block-pair probes of a sampling round
    through one GPU request-mode dispatch
    (HEBChartCorrelation.cpp:1261); the per-pair Python loop this
    replaces cost one device round-trip per pair (130k sequential
    dispatches at 512 leaves). Quasirandom sample positions are shared
    across pairs — exactly what the per-pair path produced with its
    fixed seeds.

    Args:
      regions_a / regions_b: sequences of GridRegion (len P).
      method: "random" | "halton" | "plastic".
      seed: affects sample positions for method="random" only; the
        halton/plastic sequences are deterministic by construction.
      **kw: forwarded to ``correlate_requests``; a caller-supplied
        ``absolute`` overrides the default of True.

    Returns:
      (P,) float max |corr| per pair (NaN where all probes are NaN).
    """
    from correrender_tpu.calculators.correlation import (
        correlate_requests,
    )

    if request_chunk is None:
        # Chunk by a series-bytes budget, not a fixed request count:
        # at n=20 members a 16384-request chunk is ~2.6 MB — pure
        # dispatch overhead on the tunneled chip — while at n=1000 a
        # 256k chunk would blow the KSG band workspace. ~128 MB of
        # gathered pair series per chunk, clamped to [16384, 262144].
        n_members = int(stack.shape[-1])
        budget = 128 << 20
        request_chunk = int(
            min(262144, max(16384, budget // (2 * 4 * n_members)))
        )
        request_chunk = 1 << (request_chunk.bit_length() - 1)

    s = num_samples
    if method == "random":
        rng = np.random.default_rng(seed)
        ua = rng.random((s, 3))
        ub = rng.random((s, 3))
    elif method == "halton":
        idx = np.arange(1, s + 1)
        ua = np.stack([halton(idx, b) for b in (2, 3, 5)], axis=-1)
        ub = np.stack([halton(idx, b) for b in (7, 11, 13)], axis=-1)
    elif method == "plastic":
        u = plastic_sequence(s, 6)
        ua, ub = u[:, :3], u[:, 3:]
    else:
        raise ValueError(f"batched sampling: unknown method {method!r}")

    def coords(regions, u):
        lo = np.array([[r.x_min, r.y_min, r.z_min] for r in regions])
        hi = np.array([[r.x_max, r.y_max, r.z_max] for r in regions])
        pts = np.minimum(
            (lo[:, None, :] + u[None] * (hi - lo + 1)[:, None, :])
            .astype(np.int64),
            hi[:, None, :],
        )  # (P, S, 3) xyz
        return pts[..., ::-1]  # zyx for correlate_requests

    pa = coords(regions_a, ua).reshape(-1, 3)
    pb = coords(regions_b, ub).reshape(-1, 3)
    p = len(regions_a)
    total = p * s
    # Pad the request buffer to a canonical size (multiple of the
    # chunk, or the next power of two below it) so repeated diagram
    # levels reuse a handful of compiled shapes instead of compiling a
    # fresh remainder-sized program each time.
    if total >= request_chunk:
        padded = -(-total // request_chunk) * request_chunk
    else:
        padded = 1 << (total - 1).bit_length()
    if padded > total:
        pad = np.zeros((padded - total, 3), pa.dtype)
        pa = np.concatenate([pa, pad])
        pb = np.concatenate([pb, pad])
    absolute = kw.pop("absolute", True)
    # Device-put the stack ONCE and enqueue every chunk before the
    # first sync: per-chunk np.asarray paid one tunnel round-trip per
    # chunk (~0.3 s each — 160 chunks = 50 s at 512 leaves), and an
    # np stack argument was re-transferred with every call.
    stack_dev = jax.device_put(jnp.asarray(stack))
    outs = [
        correlate_requests(
            stack_dev,
            jnp.asarray(pa[start : start + request_chunk]),
            jnp.asarray(pb[start : start + request_chunk]),
            measure,
            absolute=absolute,
            **kw,
        )
        for start in range(0, padded, request_chunk)
    ]
    vals = np.concatenate([np.asarray(o) for o in outs])
    vals = vals[:total].reshape(p, s)
    with np.errstate(invalid="ignore"):
        out = np.nanmax(
            np.where(np.isfinite(vals), vals, np.nan), axis=1
        )
    return out


def exhaustive_block_pair_max(stack, region_a, region_b, measure="pearson",
                              **kw):
    """Ground truth: evaluate ALL voxel pairs (test harness use only)."""
    def region_series(r):
        sub = stack[
            r.z_min : r.z_max + 1,
            r.y_min : r.y_max + 1,
            r.x_min : r.x_max + 1,
        ]
        return sub.reshape(-1, sub.shape[-1])

    sa = region_series(region_a)
    sb = region_series(region_b)
    vals = np.asarray(
        ops.correlate_jit(
            jnp.asarray(sa)[:, None, :], jnp.asarray(sb)[None, :, :],
            measure, absolute=True, **kw,
        )
    )
    vals = vals[np.isfinite(vals)]
    return float(vals.max())
