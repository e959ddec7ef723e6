"""Pallas KSG mutual-information kernel (estimators 1 and 2).

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
  (reference src/Calculators/MutualInformation.cpp:201-233); estimator
  2 derives per-axis radii as masked maxes of |d| over the (k+1)-NN
  set (MutualInformation.cpp:465-509 semantics);
* ψ(count) is evaluated in-register with a branch-free recurrence +
  asymptotic series (``common.digamma_vpu``). A one-hot MXU table
  lookup was the original design, but Mosaic lowers default f32
  matmuls as a single bf16 pass on v5e, rounding ψ values to ~0.4%
  relative (up to 1.3e-3 absolute on MI fields) — the VPU series is
  exact to f32 and removes a kernel input.

The in-register k-d tree of the reference's GPU path
(Data/Shaders/Correlation/MutualInformationKraskov.glsl:179-389) is a
pointer machine the VPU can't vectorize; dense distance rows at
VMEM bandwidth are the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import select_kth
from correrender_tpu.ops.pallas.common import digamma_vpu, on_tpu, round_up
from correrender_tpu.ops.mi_ksg import (
    COUNT_EPSILON,
    NOISE_AMPLITUDE,
    _key_query,
    _key_ref,
)

_BIG = 1e30
_ROWS = 256  # rows of the pairwise matrix per grid step


def _make_kernel(k: int, n: int, npad: int, rows: int, estimator: int):
    num_chunks = npad // rows

    def kernel(x_ref, dxs_ref, y_ref, out_ref):
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

        # k-th order statistic per row (incl. self-distance 0):
        # tie-aware selection shared with ksg_banded's repair
        # (common.select_kth) so the equality invariant between the
        # two kernels has one definition.
        thresh = select_kth(dch, k, axis=1)

        if estimator == 1:
            rx = thresh - COUNT_EPSILON  # (rows, 1) joint-space radius
            ry = rx
        else:
            # Estimator 2: per-axis radii are the max |d| over the
            # (k+1)-NN set {j : dcheb_j ≤ thresh} (tie-breaking noise
            # makes the set exactly k+1 points; padded columns carry
            # dcheb ≈ BIG and are excluded).
            nbr = dch <= thresh
            rx = jnp.max(
                jnp.where(nbr, jnp.abs(dxs), -1.0), axis=1, keepdims=True
            ) + COUNT_EPSILON
            ry = jnp.max(
                jnp.where(nbr, jnp.abs(dys), -1.0), axis=1, keepdims=True
            ) + COUNT_EPSILON
        # Count with VALUE boundaries [v_i − r, v_i + r) — not the
        # algebraically equal difference form [−r, r): the reference's
        # binary searches compare against the rounded endpoint values,
        # and matching that float form keeps boundary points bitwise
        # consistent with the XLA path.
        xrow = x.reshape(1, npad)
        yrow = y.reshape(1, npad)
        cx = jnp.sum(
            ((xrow >= xi - rx) & (xrow < xi + rx)).astype(jnp.float32),
            axis=1, keepdims=True,
        )
        cy = jnp.sum(
            ((yrow >= yi - ry) & (yrow < yi + ry)).astype(jnp.float32),
            axis=1, keepdims=True,
        )
        if estimator == 1:
            # Counts include the centre ⇒ ψ(nx + 1) of the paper.
            psix = digamma_vpu(jnp.maximum(cx, 1.0))
            psiy = digamma_vpu(jnp.maximum(cy, 1.0))
        else:
            # ψ(count − 1): centre excluded (MutualInformation.cpp:489).
            psix = digamma_vpu(jnp.maximum(cx - 1.0, 1.0))
            psiy = digamma_vpu(jnp.maximum(cy - 1.0, 1.0))

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


@functools.partial(jax.jit, static_argnames=("k", "estimator", "interpret"))
def _mi_ksg_flat(series, x, k, estimator, interpret):
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

    kernel, num_chunks = _make_kernel(k, n, npad, rows, estimator)
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
            pl.BlockSpec((1, 1, npad), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp.reshape(1, npad), dxs, sp.reshape(v, 1, npad))

    import jax.scipy.special as jss

    const = jss.digamma(float(k)) + jss.digamma(float(n))
    if estimator == 2:
        const = const - 1.0 / k
    mi = -acc[:, 0, 0] / n + const
    return jnp.maximum(mi, 0.0)


def mi_ksg_pallas(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    k: int = 3,
    estimator: int = 1,
    use_noise: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """KSG MI field via the Pallas kernel (estimators 1 and 2).

    Args:
      stack: ``(..., n)`` member series.
      ref: ``(n,)`` reference series.
      k: neighbour count.
      estimator: Kraskov estimator 1 or 2.
      use_noise: add the deterministic tie-breaking noise (same keys as
        ops/mi_ksg.py so both paths agree bitwise on inputs).
      interpret: force interpreter mode (auto: off-TPU only).

    Returns:
      ``(...)`` float32 MI field.
    """
    if estimator not in (1, 2):
        raise ValueError(f"estimator must be 1 or 2, got {estimator}")
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
    out = _mi_ksg_flat(series, x, k, estimator, interpret)
    return out.reshape(lead)
