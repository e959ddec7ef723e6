"""Distribution-similarity feature builders + embedding pipeline.

Reference: src/Renderers/Diagram/DistributionSimilarity/
(DistributionSimilarityRenderer.hpp:49-66,114-117) — three feature
modes over a sampled point set, embedded with t-SNE and clustered with
DBSCAN, colored back into the 3D view:

* grid-cell neighborhood-correlation vectors,
* grid-cell member-value vectors,
* member grid-cell-value vectors,

sampling patterns {all, quasirandom plastic}.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.diagrams.sampling import plastic_sequence
from correrender_tpu.diagrams.tsne import tsne
from correrender_tpu.diagrams.dbscan import dbscan

FEATURE_MODES = (
    "cell_neighborhood_correlations",
    "cell_member_values",
    "member_cell_values",
)


def sample_cells(shape_zyx, max_points: int = 2000, pattern: str = "plastic"):
    """Sample voxel coordinates: 'all' or quasirandom 'plastic'."""
    zs, ys, xs = shape_zyx
    total = zs * ys * xs
    if pattern == "all" or total <= max_points:
        idx = np.arange(total)
    elif pattern == "plastic":
        u = plastic_sequence(max_points, 3)
        coords = np.minimum(
            (u * np.array([zs, ys, xs])).astype(np.int64),
            np.array([zs - 1, ys - 1, xs - 1]),
        )
        idx = np.unique(
            (coords[:, 0] * ys + coords[:, 1]) * xs + coords[:, 2]
        )
    else:
        raise ValueError(f"unknown sampling pattern {pattern!r}")
    z = idx // (ys * xs)
    y = (idx // xs) % ys
    x = idx % xs
    return np.stack([z, y, x], axis=-1)


def build_features(
    stack: np.ndarray,
    mode: str = "cell_member_values",
    max_points: int = 2000,
    pattern: str = "plastic",
    neighborhood: int = 2,
    measure: str = "pearson",
):
    """Feature matrix (N, D) + the sampled cell coords (or member ids)."""
    stack = np.asarray(stack)
    zs, ys, xs, n = stack.shape
    if mode == "cell_member_values":
        cells = sample_cells((zs, ys, xs), max_points, pattern)
        feats = stack[cells[:, 0], cells[:, 1], cells[:, 2]]  # (N, n)
        # Drop NaN-carrying cells (masked/fill voxels): one NaN row
        # poisons every pairwise t-SNE distance and the whole
        # embedding comes back NaN (round-3 review finding).
        ok = np.isfinite(feats).all(axis=-1)
        return feats[ok].astype(np.float32), cells[ok]
    if mode == "member_cell_values":
        cells = sample_cells((zs, ys, xs), max_points, pattern)
        vals = stack[cells[:, 0], cells[:, 1], cells[:, 2]]  # (N, n)
        # Feature axis = sampled cells: keep members comparable by
        # dropping CELLS with any non-finite value across members.
        ok = np.isfinite(vals).all(axis=-1)
        return vals[ok].T.astype(np.float32), np.arange(n)  # (n, N_ok)
    if mode == "cell_neighborhood_correlations":
        cells = sample_cells((zs, ys, xs), max_points, pattern)
        r = neighborhood
        offsets = [
            (dz, dy, dx)
            for dz in (-r, 0, r)
            for dy in (-r, 0, r)
            for dx in (-r, 0, r)
            if (dz, dy, dx) != (0, 0, 0)
        ]
        center = jnp.asarray(
            stack[cells[:, 0], cells[:, 1], cells[:, 2]]
        )  # (N, n)
        feats = []
        for dz, dy, dx in offsets:
            zq = np.clip(cells[:, 0] + dz, 0, zs - 1)
            yq = np.clip(cells[:, 1] + dy, 0, ys - 1)
            xq = np.clip(cells[:, 2] + dx, 0, xs - 1)
            neigh = jnp.asarray(stack[zq, yq, xq])
            feats.append(
                np.asarray(ops.correlate_jit(center, neigh, measure))
            )
        return np.nan_to_num(np.stack(feats, axis=-1)).astype(np.float32), cells
    raise ValueError(f"unknown feature mode {mode!r}")


def distribution_similarity(
    stack: np.ndarray,
    mode: str = "cell_member_values",
    max_points: int = 1000,
    perplexity: float = 30.0,
    eps: float | None = None,
    min_samples: int = 8,
    seed: int = 0,
    num_iters: int = 500,
):
    """Full pipeline: features → t-SNE 2D embedding → DBSCAN labels.

    Returns (embedding (N, 2), labels (N,), ids) where ids are the
    sampled cell coords (or member indices for member mode).
    """
    feats, ids = build_features(stack, mode, max_points)
    emb = tsne(feats, perplexity=perplexity, seed=seed,
               num_iters=num_iters)
    if eps is None:
        span = emb.max(axis=0) - emb.min(axis=0)
        eps = 0.05 * float(np.linalg.norm(span))
    labels = dbscan(emb, eps=eps, min_samples=min_samples)
    return emb, labels, ids
