"""Pallas binned mutual-information kernel (single reference series).

Same estimator as ops/mi_binned.py (reference semantics:
src/Calculators/MutualInformation.cpp:45-143 — bin = clamp(int(v·B)),
NaN pairs skipped, probability cutoffs 0.5/n and 0.5/n²), specialised
for the SINGLE correlation mode where every voxel correlates against
one reference series:

* the reference one-hot matrix ``ox`` is voxel-independent — it is
  built once on the XLA side as a ``(bins, n)`` bf16 matrix and stays
  VMEM-resident across the whole grid (constant index map);
* per grid step the kernel builds the one-hots of TILE_V query voxels
  directly in VMEM via an integer tent (``max(1 − |bin − iota|, 0)``
  is exactly the one-hot for integer-valued bins, and invalid/padded
  entries encoded as bin −1 vanish), concatenated along lanes;
* all TILE_V joint histograms come out of ONE MXU contraction
  ``(bpad, npad) · (npad, TILE_V·bpad)`` — bf16 inputs, f32
  accumulation (0/1 values ⇒ exact integer counts);
* entropies (marginals + joint, with the reference's probability
  cutoffs) are reduced in-register; only the (V,) MI field ever
  touches HBM.

The XLA path materialises two ``(V, n, bins)`` one-hot tensors in HBM
per chunk; this kernel's HBM traffic is the ``(V, n)`` bin indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up

_TILE_V = 32


def _make_kernel(n: int, npad: int, bsub: int, bpad: int, tile_v: int):
    # The reference's probability cutoffs (p_marginal > 0.5/n,
    # p_joint > 0.5/n²) are NO-OPS on exact integer counts: the joint
    # total T ≤ n, so eps·T < 1 ≤ any nonzero count. That lets the
    # entropies collapse to Σ p·log p = (1/T)·Σ c·log(max(c,1)) − log T
    # — one log + one mul per cell, no divisions or selects.

    def kernel(ox_ref, by_ref, out_ref):
        ox = ox_ref[:]  # (bsub, npad) bf16, reference one-hot (transposed)
        by = by_ref[0]  # (npad, tile_v) f32 bin ids, −1 ⇒ invalid/padded
        bin_iota = jax.lax.broadcasted_iota(
            jnp.int32, (npad, bpad), 1
        ).astype(jnp.float32)
        cols = []
        for v in range(tile_v):
            diff = by[:, v : v + 1] - bin_iota  # (npad, bpad)
            cols.append(
                jnp.maximum(1.0 - jnp.abs(diff), 0.0).astype(jnp.bfloat16)
            )
        oy = jnp.concatenate(cols, axis=1)  # (npad, tile_v·bpad)
        joint = jax.lax.dot_general(
            ox,
            oy,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bsub, tile_v·bpad): tile_v joint histograms side by side

        def clogc(c):
            return c * jnp.log(jnp.maximum(c, 1.0))

        # One elementwise pass over the whole tile; per-voxel sums below.
        e_xy = clogc(joint)
        c_y = jnp.sum(joint, axis=0, keepdims=True)  # all voxels at once
        e_y = clogc(c_y)

        mis = []
        for v in range(tile_v):
            sl = slice(v * bpad, (v + 1) * bpad)
            c_x = jnp.sum(joint[:, sl], axis=1, keepdims=True)
            total = jnp.maximum(jnp.sum(c_x), 1.0)
            log_t = jnp.log(total)
            inv_t = 1.0 / total
            h_x = log_t - inv_t * jnp.sum(clogc(c_x))
            h_y = log_t - inv_t * jnp.sum(e_y[:, sl])
            h_xy = log_t - inv_t * jnp.sum(e_xy[:, sl])
            mis.append(h_x + h_y - h_xy)
        out_ref[...] = jnp.stack(mis).reshape(1, 1, tile_v)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_bins", "interpret", "tile_v")
)
def _mi_flat(series, ref, num_bins, mi_lo, mi_hi, interpret,
             tile_v=_TILE_V):
    v, n = series.shape
    b = num_bins
    npad = round_up(n, 128)
    bpad = round_up(b, 128)  # lane dim of the per-voxel one-hots
    bsub = round_up(b, 8)  # sublane dim of the joint (31% less entropy
    # work than padding bins to 128 when b=80)
    num_tiles = -(-v // tile_v)
    vpad = num_tiles * tile_v

    def bin_ids(values, lo, hi):
        norm = (values - lo) / (hi - lo)
        ids = jnp.clip((norm * b).astype(jnp.int32), 0, b - 1)
        return jnp.where(jnp.isfinite(norm), ids.astype(jnp.float32), -1.0)

    bx = bin_ids(ref.astype(jnp.float32), mi_lo[0], mi_hi[0])  # (n,)
    by = bin_ids(series.astype(jnp.float32), mi_lo[1], mi_hi[1])  # (v, n)

    # Reference one-hot, transposed: (bsub, npad) with invalid/padded 0.
    bins = jnp.arange(bsub, dtype=jnp.float32)[:, None]
    bxp = jnp.pad(bx, (0, npad - n), constant_values=-1.0)[None, :]
    ox = jnp.maximum(1.0 - jnp.abs(bins - bxp), 0.0).astype(jnp.bfloat16)

    byp = jnp.pad(
        by, ((0, vpad - v), (0, npad - n)), constant_values=-1.0
    )
    byt = byp.reshape(num_tiles, tile_v, npad).transpose(0, 2, 1)

    out = pl.pallas_call(
        _make_kernel(n, npad, bsub, bpad, tile_v),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 1, tile_v),
                                       jnp.float32),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((bsub, npad), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, tile_v), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_v), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ox, byt)
    return out.reshape(vpad)[:v]


def mi_binned_pallas(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    num_bins: int = 80,
    mi_bounds=None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Binned-MI field of every series in ``stack`` vs one ``ref`` series.

    Args:
      stack: ``(..., n)`` member series (raw values, NOT pre-normalized).
      ref: ``(n,)`` reference series.
      num_bins: histogram bins per axis.
      mi_bounds: ``((ref_min, ref_max), (query_min, query_max))`` global
        normalization bounds (CorrelationCalculator.cpp:820-845); if
        None, per-series min/max is used like ops/registry.py.

    Returns:
      ``(...)`` float32 MI in nats.
    """
    if interpret is None:
        interpret = not on_tpu()
    n = stack.shape[-1]
    lead = stack.shape[:-1]
    series = stack.reshape(-1, n)
    ref = jnp.asarray(ref)
    if mi_bounds is not None:
        if isinstance(mi_bounds[0], (tuple, list)):
            (xmin, xmax), (ymin, ymax) = mi_bounds
        else:
            (xmin, xmax) = (ymin, ymax) = mi_bounds
        lo = jnp.stack([jnp.asarray(xmin, jnp.float32),
                        jnp.asarray(ymin, jnp.float32)])
        hi = jnp.stack([jnp.asarray(xmax, jnp.float32),
                        jnp.asarray(ymax, jnp.float32)])
        out = _mi_flat(series, ref, num_bins, lo, hi, interpret)
    else:
        # Per-series normalization (registry._normalize01 semantics):
        # fold it into the bin ids by normalizing here on the XLA side.
        def norm01(x):
            lo_ = jnp.min(x, axis=-1, keepdims=True)
            hi_ = jnp.max(x, axis=-1, keepdims=True)
            return (x - lo_) / jnp.maximum(hi_ - lo_, 1e-30)

        lo = jnp.zeros(2, jnp.float32)
        hi = jnp.ones(2, jnp.float32)
        out = _mi_flat(norm01(series), norm01(ref), num_bins, lo, hi,
                       interpret)
    return out.reshape(lead)
