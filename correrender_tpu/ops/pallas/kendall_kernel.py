"""Pallas Kendall tau-b kernel.

Same pairwise formulation as ops/kendall.py (pairwise sum
Σ_{i<j} sign(x_i−x_j)·sign(y_i−y_j) minus the joint-tie count, to
reproduce the reference's forced n3 = 0 convention —
src/Calculators/Correlation.cpp:305-465), with the
(n, n) pair matrix kept in VMEM row-chunks per voxel instead of the
XLA path's (V, n, chunk) HBM intermediates. The reference series'
pairwise signs are precomputed once (voxel-independent) and streamed
as blocks; padded columns carry sign 0 so they contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up

_BIG = 1e30
_ROWS = 256


def _make_kernel(n: int, npad: int, rows: int):
    num_chunks = npad // rows

    def kernel(sx_ref, y_ref, out_ref):
        c = pl.program_id(1)
        y = y_ref[0, 0, :]  # (npad,) this voxel's series (padded BIG)
        row0 = c * rows
        yi = y_ref[0, 0, pl.ds(row0, rows)].reshape(rows, 1)
        sx = sx_ref[:]  # (rows, npad) sign(x_i − x_j), 0 on padding
        dys = yi - y.reshape(1, npad)  # (rows, npad) y_i − y_j
        sy = jnp.sign(dys)
        # Row validity (padded rows contribute nothing).
        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0).astype(
                jnp.float32
            )
            + row0
        )
        valid = (row_ids < n).astype(jnp.float32)
        num_partial = jnp.sum(valid * jnp.sum(sx * sy, axis=1,
                                              keepdims=True))
        # Ties in y: pairs with dys == 0 among real columns (the
        # diagonal self-pair is included; the host subtracts n).
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (rows, npad), 1
        ).astype(jnp.float32)
        real_col = (col_ids < n).astype(jnp.float32)
        ty = (dys == 0.0).astype(jnp.float32) * real_col
        ty_partial = jnp.sum(valid * jnp.sum(ty, axis=1, keepdims=True))
        # Joint ties: for real pairs sign(dx)==0 ⟺ dx==0 (padding is
        # excluded by real_col/valid), so (sx==0)&(dy==0) counts n3.
        txy = (sx == 0.0).astype(jnp.float32) * ty
        txy_partial = jnp.sum(valid * jnp.sum(txy, axis=1, keepdims=True))
        partial = jnp.stack(
            [num_partial, ty_partial, txy_partial]
        ).reshape(1, 3)

        @pl.when(c == 0)
        def _():
            out_ref[0] = jnp.zeros((1, 3), jnp.float32)

        out_ref[0] += partial

    return kernel, num_chunks


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kendall_flat(series, x, interpret):
    v, n = series.shape
    npad = round_up(n, 128)
    rows = min(_ROWS, npad)
    npad = round_up(npad, rows)
    pad_n = npad - n

    xp = jnp.pad(x.astype(jnp.float32), (0, pad_n), constant_values=_BIG)
    sp = jnp.pad(series.astype(jnp.float32), ((0, 0), (0, pad_n)),
                 constant_values=_BIG)
    # sign(x_i − x_j) with padded rows/cols zeroed (inert).
    dxs = xp[:, None] - xp[None, :]
    sx = jnp.sign(dxs)
    real = jnp.arange(npad) < n
    sx = jnp.where(real[:, None] & real[None, :], sx, 0.0)
    # Ties in x (pair count, excluding self): voxel-independent.
    tie_x_pairs = (
        jnp.sum(
            (dxs == 0.0) & real[:, None] & real[None, :]
        ).astype(jnp.float32)
        - n
    ) * 0.5

    kernel, num_chunks = _make_kernel(n, npad, rows)
    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((v, 1, 3), jnp.float32),
        grid=(v, num_chunks),
        in_specs=[
            pl.BlockSpec((rows, npad), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 3), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(sx, sp.reshape(v, 1, npad))

    num = acc[:, 0, 0] * 0.5  # double-counted symmetric sum
    n1 = tie_x_pairs
    n2 = (acc[:, 0, 1] - n) * 0.5
    # Reference forces n3 = 0 in its numerator (Correlation.cpp:444):
    # subtract the joint-tie count from the pairwise sum to match.
    n3 = (acc[:, 0, 2] - n) * 0.5
    num = num - n3
    n0 = 0.5 * n * (n - 1)
    den = jnp.sqrt(n0 - n1) * jnp.sqrt(n0 - n2)
    return (num / den).astype(jnp.float32)


def kendall_pallas(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Kendall tau-b field via the Pallas kernel.

    Args:
      stack: ``(..., n)`` member series.
      ref: ``(n,)`` reference series.

    Returns:
      ``(...)`` float32 tau-b.
    """
    if interpret is None:
        interpret = not on_tpu()
    n = stack.shape[-1]
    lead = stack.shape[:-1]
    return _kendall_flat(stack.reshape(-1, n), ref, interpret).reshape(lead)
