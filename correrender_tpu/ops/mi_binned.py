"""Binned (histogram) mutual information over the member axis.

Semantics follow the reference ``computeMutualInformationBinned``
(reference: src/Calculators/MutualInformation.cpp:45-143):

* inputs are expected pre-normalized to [0, 1] (the calculator layer
  normalizes by the *global* field min/max, mirroring
  CorrelationCalculator.cpp:820-845);
* bin index = clamp(int(v · B), 0, B-1);
* NaN pairs are skipped;
* MI = H(x) + H(y) − H(x,y) with probability cutoffs 0.5/n (marginals)
  and 0.5/n² (joint) below which terms are dropped.

TPU-native formulation: the joint histogram is built as a one-hot
matmul ``one_hot(bx)ᵀ · one_hot(by)`` — an MXU contraction batched over
voxels — rather than scatter-adds.

Note: this XLA path IS the fast path. A Pallas kernel (VMEM-resident
one-hots, all joint histograms of a voxel tile in one MXU contraction)
measured 0.75–0.83× this formulation across interleaved reps — the
measure is entropy/VPU-bound (member-count-independent ~30 ms per 32³
field) and XLA schedules the per-cell ``p·log p`` pass better. The
kernel lives in git history ("Add Pallas binned-MI kernel").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_bins", "dtype"))
def mutual_information_binned(
    x: jnp.ndarray,
    y: jnp.ndarray,
    num_bins: int = 80,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Binned MI between ``x`` and ``y`` (both in [0,1]) along the last axis.

    Args:
      x, y: ``(..., n)`` values normalized to [0, 1].
      num_bins: number of histogram bins per axis (reference default 80,
        CorrelationCalculator.hpp:209).
      dtype: accumulator dtype.

    Returns:
      ``(...)`` float32 MI in nats.
    """
    x, y = jnp.broadcast_arrays(x, y)
    n = x.shape[-1]
    b = num_bins
    ok = jnp.isfinite(x) & jnp.isfinite(y)
    bx = jnp.clip((x * b).astype(jnp.int32), 0, b - 1)
    by = jnp.clip((y * b).astype(jnp.int32), 0, b - 1)
    ox = jax.nn.one_hot(bx, b, dtype=dtype) * ok[..., None].astype(dtype)
    oy = jax.nn.one_hot(by, b, dtype=dtype) * ok[..., None].astype(dtype)
    joint = jnp.einsum(
        "...ni,...nj->...ij", ox, oy, preferred_element_type=dtype
    )
    total = jnp.sum(joint, axis=(-2, -1), keepdims=True)
    p_xy = joint / total
    p_x = jnp.sum(p_xy, axis=-1)  # (..., b)
    p_y = jnp.sum(p_xy, axis=-2)
    eps1 = 0.5 / n
    eps2 = 0.5 / (n * n)
    h_x = -jnp.sum(jnp.where(p_x > eps1, p_x * jnp.log(p_x), 0.0), axis=-1)
    h_y = -jnp.sum(jnp.where(p_y > eps1, p_y * jnp.log(p_y), 0.0), axis=-1)
    h_xy = -jnp.sum(
        jnp.where(p_xy > eps2, p_xy * jnp.log(p_xy), 0.0), axis=(-2, -1)
    )
    return (h_x + h_y - h_xy).astype(jnp.float32)


def binned_mi_correlation_coefficient(mi: jnp.ndarray) -> jnp.ndarray:
    """Linfoot's informational correlation coefficient.

    sqrt(1 − exp(−2·MI)); reference: CorrelationCalculator.cpp:1071-1072.
    """
    return jnp.sqrt(jnp.maximum(1.0 - jnp.exp(-2.0 * mi), 0.0))
