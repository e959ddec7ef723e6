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

import functools

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
    """Map unit-cube samples to integer voxel coords of a region.

    The lo + u·(hi−lo+1) map is evaluated in float32 so the host
    per-pair path and the on-device batched programs (which run f32)
    place samples at bit-identical voxels.
    """
    lo = np.array([region.x_min, region.y_min, region.z_min])
    hi = np.array([region.x_max, region.y_max, region.z_max])
    pts = (lo.astype(np.float32)
           + u.astype(np.float32) * (hi - lo + 1).astype(np.float32))
    return np.minimum(pts.astype(np.int64), hi)


def _pairs_to_series(stack, region_a, region_b, ua, ub):
    pa = _region_points(region_a, ua)
    pb = _region_points(region_b, ub)
    sa = stack[pa[:, 2], pa[:, 1], pa[:, 0]]  # (S, n)
    sb = stack[pb[:, 2], pb[:, 1], pb[:, 0]]
    return sa, sb


def _eval_max(sa, sb, measure, **kw):
    absolute = kw.pop("absolute", True)
    vals = np.asarray(
        ops.correlate_jit(jnp.asarray(sa), jnp.asarray(sb), measure,
                          absolute=absolute, **kw)
    )
    vals = vals[np.isfinite(vals)]
    if not len(vals):
        return float("nan")
    if absolute:
        return float(vals.max())
    # Signed mode: the "maximum correlation" of a block pair is the
    # strongest RELATIONSHIP — select by |value|, return the signed
    # value (a signed max would report one weak positive probe over a
    # dominant anti-correlation; round-3 review).
    return float(vals[np.abs(vals).argmax()])


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
      **kw: measure kwargs baked into the jitted per-chunk program
        (scalar values only — non-scalar arrays raise ValueError); a
        caller-supplied ``absolute`` overrides the default of True.

    Returns:
      (P,) float max |corr| per pair (NaN where all probes are NaN).
    """
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

    from correrender_tpu.ops.registry import (
        is_measure_kraskov_mi,
        measure_from_id,
    )

    m = measure_from_id(measure)
    p = len(regions_a)
    n_members = int(stack.shape[-1])
    if request_chunk is None:
        # Chunk by the dominant per-request working set: the gathered
        # pair series are 2·n·4 bytes each (~128 MB budget), and the
        # dense request-mode KSG additionally materializes an
        # (R, n, n) neighbour problem — three f32 arrays — which is
        # what actually bounds R at moderate-to-large member counts
        # (128 members: ~200 KB per request).
        budget = 128 << 20
        request_chunk = budget // (2 * 4 * n_members)
        if is_measure_kraskov_mi(m):
            ksg_budget = 4 << 30  # transient; HBM is 16 GB
            request_chunk = min(
                request_chunk, ksg_budget // (3 * 4 * n_members ** 2)
            )
        request_chunk = int(min(262144, max(256, request_chunk)))
        request_chunk = 1 << (request_chunk.bit_length() - 1)
    pair_chunk = max(request_chunk // s, 1)
    # Canonical chunk shapes: pad the pair list to a multiple of the
    # chunk (or the next power of two below it) so repeated diagram
    # levels reuse a handful of compiled programs.
    if p >= pair_chunk:
        padded = -(-p // pair_chunk) * pair_chunk
    else:
        padded = 1 << (p - 1).bit_length() if p > 1 else 1
        pair_chunk = padded

    def bounds(regions):
        lo = np.array(
            [[r.x_min, r.y_min, r.z_min] for r in regions], np.int32
        )
        hi = np.array(
            [[r.x_max, r.y_max, r.z_max] for r in regions], np.int32
        )
        if padded > p:
            pad = np.zeros((padded - p, 3), np.int32)
            lo = np.concatenate([lo, pad])
            hi = np.concatenate([hi, pad])
        return lo, hi

    lo_a, hi_a = bounds(regions_a)
    lo_b, hi_b = bounds(regions_b)
    absolute = kw.pop("absolute", True)
    from correrender_tpu.ops.registry import hashable_kwargs

    key = hashable_kwargs({**kw, "absolute": absolute})
    if key is None:
        raise ValueError(
            "batched_block_pairs_max bakes measure kwargs into a "
            "compiled program; pass scalar values (e.g. float "
            "mi_bounds), not arrays"
        )
    prog = _pairs_max_program(m, key)
    # Only the region bounds (P×6 int32) and the SHARED sample
    # positions cross the host↔device link: sample-coordinate
    # generation, series gather, correlation, and the per-pair max all
    # run in one program per chunk. (The previous request-buffer
    # design shipped P·S explicit voxel coords — 125 MB at 512 leaves
    # — over a ~0.2 GiB/s tunnel, and fetched P·S values back.)
    stack_dev = jax.device_put(jnp.asarray(stack))
    ua_dev = jnp.asarray(ua, jnp.float32)
    ub_dev = jnp.asarray(ub, jnp.float32)
    outs = [
        prog(
            stack_dev,
            jnp.asarray(lo_a[c : c + pair_chunk]),
            jnp.asarray(hi_a[c : c + pair_chunk]),
            jnp.asarray(lo_b[c : c + pair_chunk]),
            jnp.asarray(hi_b[c : c + pair_chunk]),
            ua_dev,
            ub_dev,
        )
        for c in range(0, padded, pair_chunk)
    ]
    return np.concatenate([np.asarray(o) for o in outs])[:p]


@functools.lru_cache(maxsize=64)
def _pairs_max_program(measure, kw_items):
    """One jitted program: region samples → gather → correlate → max.

    ``kw_items`` carries the correlate kwargs plus the ``absolute``
    flag; per-pair NaN-only sample sets return NaN (matching the old
    host-side nanmax semantics).
    """
    kw = dict(kw_items)
    absolute = kw.pop("absolute", True)

    @jax.jit
    def run(stack, lo_a, hi_a, lo_b, hi_b, ua, ub):
        zs, ys, xs = stack.shape[:3]
        n = stack.shape[-1]
        flat = stack.reshape(-1, n)

        def idx(lo, hi, u):
            # Same f32 lo + u·width map as _region_points.
            width = (hi - lo + 1).astype(jnp.float32)
            pts = jnp.minimum(
                (lo.astype(jnp.float32)[:, None, :]
                 + u[None, :, :] * width[:, None, :]).astype(jnp.int32),
                hi[:, None, :],
            )  # (P, S, 3) xyz
            return (pts[..., 2] * ys + pts[..., 1]) * xs + pts[..., 0]

        ia = idx(lo_a, hi_a, ua).reshape(-1)
        ib = idx(lo_b, hi_b, ub).reshape(-1)
        vals = ops.correlate(
            flat[ia], flat[ib], measure, absolute=absolute, **kw
        )
        vals = vals.reshape(lo_a.shape[0], -1)
        finite = jnp.isfinite(vals)
        if absolute:
            best = jnp.max(jnp.where(finite, vals, -jnp.inf), axis=1)
        else:
            # Signed mode: strongest relationship by |value|, signed
            # value returned (see _eval_max).
            mag = jnp.where(finite, jnp.abs(vals), -jnp.inf)
            best = jnp.take_along_axis(
                vals, mag.argmax(axis=1)[:, None], axis=1
            )[:, 0]
        return jnp.where(jnp.any(finite, axis=1), best, jnp.nan)

    return run


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
    absolute = kw.pop("absolute", True)
    vals = np.asarray(
        ops.correlate_jit(
            jnp.asarray(sa)[:, None, :], jnp.asarray(sb)[None, :, :],
            measure, absolute=absolute, **kw,
        )
    )
    vals = vals[np.isfinite(vals)]
    if not len(vals):
        return float("nan")  # all-NaN region pair, like _eval_max
    if absolute:
        return float(vals.max())
    return float(vals[np.abs(vals).argmax()])
