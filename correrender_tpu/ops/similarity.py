"""Whole-field similarity between two scalar fields.

Reference: src/Calculators/Similarity.cpp:36-188 — flattens the voxels
of two fields (optionally across all time steps/members) into one long
sample series each and evaluates any correlation measure on the pair;
drives the "Compute Field Similarity" dialog (MainApp.hpp:181-186).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from correrender_tpu import ops


def field_similarity(
    field_a,
    field_b,
    measure: str = "pearson",
    max_samples: int = 200_000,
    seed: int = 0,
    **measure_kw,
) -> float:
    """Similarity of two equally-shaped fields under a measure.

    NaN positions in either field are excluded; for very large fields a
    deterministic subsample bounds the O(n²) measures.

    Note: Kendall self-similarity is < 1 on data containing repeated
    values — the reference's forced n3 = 0 tie convention
    (Correlation.cpp:444) yields (n0 − 2t)/(n0 − t) for t joint-tied
    pairs, and this implementation matches the reference exactly.
    """
    a = np.asarray(field_a, np.float32).ravel()
    b = np.asarray(field_b, np.float32).ravel()
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    ok = np.isfinite(a) & np.isfinite(b)
    a, b = a[ok], b[ok]
    from correrender_tpu.ops.registry import (
        CorrelationMeasure,
        is_measure_kraskov_mi,
        measure_from_id,
    )

    m = measure_from_id(measure)
    if is_measure_kraskov_mi(m):
        # The single-pair KSG path materializes an (n, n) neighbour
        # problem — n = 55k already needs ~23 GB of HBM. 16384 keeps
        # the working set ~3 GB and the estimate stable (the reference
        # walks k-d trees instead and has no such wall).
        max_samples = min(max_samples, 16384)
    if m == CorrelationMeasure.KENDALL and "dtype" not in measure_kw:
        # Kendall auto-switches to int32 pair counts past n ≈ 4000
        # (exact to n ≤ 46340, see ops/kendall.py); cap at the int32
        # exactness boundary. The O(n²) sweep at 46k is ~1.3e10 ops —
        # still interactive on the MXU-free VPU path.
        max_samples = min(max_samples, 46340)
    if len(a) > max_samples:
        idx = np.random.default_rng(seed).choice(
            len(a), max_samples, replace=False
        )
        a, b = a[idx], b[idx]
    return float(
        ops.correlate_jit(
            jnp.asarray(a), jnp.asarray(b), measure, **measure_kw
        )
    )


def volume_field_similarity(volume_data, name_a, name_b,
                            measure="pearson", all_members=False, **kw):
    """Similarity between two named fields of a VolumeData, optionally
    concatenating all members (Similarity.cpp all-t/e mode)."""
    g = volume_data.grid
    members = range(g.es) if all_members else [0]
    va, vb = [], []
    for e in members:
        va.append(np.asarray(volume_data.get_field(name_a, 0, e)).ravel())
        vb.append(np.asarray(volume_data.get_field(name_b, 0, e)).ravel())
    return field_similarity(
        np.concatenate(va), np.concatenate(vb), measure, **kw
    )
