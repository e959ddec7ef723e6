"""Pallas KSG mutual-information kernel (estimator 1).

The XLA formulation of KSG (ops/mi_ksg.py) materializes (V, n, n)
pairwise-distance intermediates in HBM — at n = 1000 members the HBM
traffic, not compute, bounds throughput. This kernel keeps everything
per-voxel in VMEM:

* grid = (voxels, row-chunks); per step a (ROWS, n) slice of the
  pairwise Chebyshev distance matrix is formed in VMEM and consumed
  immediately;
* the k-th-neighbour distance is found *without sorting* (Mosaic has no
  sort) by k+1 rounds of extract-min-above-threshold with duplicate
  counting — exact order statistics, ties included;
* per-axis neighbour counts use the same half-open interval
  ``[v_i − r, v_i + r)`` as the reference's binary searches
  (reference src/Calculators/MutualInformation.cpp:201-233);
* ψ(count) is a one-hot MXU lookup into a precomputed digamma table.

The in-register k-d tree of the reference's GPU path
(Data/Shaders/Correlation/MutualInformationKraskov.glsl:179-389) is a
pointer machine the VPU can't vectorize; dense distance rows at
VMEM bandwidth are the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up
from correrender_tpu.ops.mi_ksg import (
    COUNT_EPSILON,
    NOISE_AMPLITUDE,
    _key_query,
    _key_ref,
)

_BIG = 1e30
_ROWS = 256  # rows of the pairwise matrix per grid step


def _make_kernel(k: int, n: int, npad: int, rows: int):
    num_chunks = npad // rows

    def kernel(x_ref, dxs_ref, psi_ref, y_ref, out_ref):
        c = pl.program_id(1)
        x = x_ref[0, :]  # (npad,) reference series (padded with BIG)
        y = y_ref[0, 0, :]  # (npad,) this voxel's series
        row0 = c * rows
        # Slice the row block from the refs (Mosaic supports pl.ds on
        # refs but not value-level dynamic_slice).
        xi = x_ref[0, pl.ds(row0, rows)].reshape(rows, 1)
        yi = y_ref[0, 0, pl.ds(row0, rows)].reshape(rows, 1)
        dxs = dxs_ref[:]  # (rows, npad) signed x_j - x_i for this chunk
        dys = y.reshape(1, npad) - yi  # (rows, npad) signed y_j - y_i
        dch = jnp.maximum(jnp.abs(dxs), jnp.abs(dys))

        # k-th order statistic per row (incl. self-distance 0) via
        # extract-min-above-threshold with duplicate counting.
        thresh = jnp.full((rows, 1), -1.0, jnp.float32)
        cnt = jnp.zeros((rows, 1), jnp.float32)
        for _ in range(k + 1):
            active = cnt < (k + 1)
            masked = jnp.where(dch > thresh, dch, _BIG)
            m = jnp.min(masked, axis=1, keepdims=True)
            dup = jnp.sum(
                (dch == m).astype(jnp.float32), axis=1, keepdims=True
            )
            thresh = jnp.where(active, m, thresh)
            cnt = jnp.where(active, cnt + dup, cnt)

        r = thresh - COUNT_EPSILON  # (rows, 1) est-1 radius
        cx = jnp.sum(
            ((dxs >= -r) & (dxs < r)).astype(jnp.float32),
            axis=1, keepdims=True,
        )
        cy = jnp.sum(
            ((dys >= -r) & (dys < r)).astype(jnp.float32),
            axis=1, keepdims=True,
        )
        cx = jnp.maximum(cx, 1.0)
        cy = jnp.maximum(cy, 1.0)

        # ψ lookup: one_hot(count-1) @ psi_table  (MXU).
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (rows, npad), 1
        ).astype(jnp.float32)
        psi = psi_ref[0, :].reshape(npad, 1)
        psix = jnp.dot(
            (cols == (cx - 1.0)).astype(jnp.float32), psi,
            preferred_element_type=jnp.float32,
        )
        psiy = jnp.dot(
            (cols == (cy - 1.0)).astype(jnp.float32), psi,
            preferred_element_type=jnp.float32,
        )

        # Mask padded rows (global row index >= n).
        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0).astype(
                jnp.float32
            )
            + row0
        )
        valid = (row_ids < n).astype(jnp.float32)
        partial = jnp.sum(valid * (psix + psiy))

        partial2d = partial.reshape(1, 1)  # VMEM stores must be ≥2D

        @pl.when(c == 0)
        def _():
            out_ref[0] = jnp.zeros((1, 1), jnp.float32)

        out_ref[0] += partial2d

    return kernel, num_chunks


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _mi_ksg_flat(series, x, k, interpret):
    v, n = series.shape
    npad = round_up(n, 128)
    rows = min(_ROWS, npad)
    npad = round_up(npad, rows)
    pad_n = npad - n

    xp = jnp.pad(x.astype(jnp.float32), (0, pad_n),
                 constant_values=_BIG)
    sp = jnp.pad(series.astype(jnp.float32), ((0, 0), (0, pad_n)),
                 constant_values=_BIG)
    # Signed pairwise x differences, precomputed once: dxs[i, j] = x_j - x_i.
    dxs = xp[None, :] - xp[:, None]
    # Keep padded-row interactions inert.
    dxs = jnp.where(jnp.isnan(dxs), _BIG, dxs)

    import scipy.special

    psi_table = jnp.asarray(
        scipy.special.digamma(np.arange(1, npad + 1)).astype(np.float32)
    ).reshape(1, npad)

    kernel, num_chunks = _make_kernel(k, n, npad, rows)
    # Per-voxel blocks carry a singleton middle axis so Mosaic's
    # block-shape constraint (trailing dims divisible by (8, 128) or
    # equal to the array dims) is satisfied with one voxel per step.
    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((v, 1, 1), jnp.float32),
        grid=(v, num_chunks),
        in_specs=[
            pl.BlockSpec((1, npad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, npad), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp.reshape(1, npad), dxs, psi_table, sp.reshape(v, 1, npad))

    import jax.scipy.special as jss

    mi = -acc[:, 0, 0] / n + jss.digamma(float(k)) + jss.digamma(float(n))
    return jnp.maximum(mi, 0.0)


def mi_ksg_pallas(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    k: int = 3,
    use_noise: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """KSG estimator-1 MI field via the Pallas kernel.

    Args:
      stack: ``(..., n)`` member series.
      ref: ``(n,)`` reference series.
      k: neighbour count.
      use_noise: add the deterministic tie-breaking noise (same keys as
        ops/mi_ksg.py so both paths agree bitwise on inputs).
      interpret: force interpreter mode (auto: off-TPU only).

    Returns:
      ``(...)`` float32 MI field.
    """
    if interpret is None:
        interpret = not on_tpu()
    n = stack.shape[-1]
    lead = stack.shape[:-1]
    series = stack.reshape(-1, n)
    x = ref
    if use_noise:
        nx = jax.random.uniform(_key_ref(), (n,), jnp.float32)
        ny = jax.random.uniform(_key_query(), (n,), jnp.float32)
        x = x + nx * NOISE_AMPLITUDE
        series = series + ny[None, :] * NOISE_AMPLITUDE
    out = _mi_ksg_flat(series, x, k, interpret)
    return out.reshape(lead)
