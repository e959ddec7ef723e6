"""Pallas Spearman kernel: sortless ranks + fused Pearson moments.

The XLA Spearman path (ops/ranks.py + ops/pearson.py) sorts each
voxel's member series and scatters ranks back — both sort and scatter
are slow on TPU. This kernel computes tie-averaged fractional ranks by
*pairwise counting* instead (reference semantics,
src/Calculators/Correlation.cpp:277-303):

    rank_i = #{j: v_j < v_i} + (#{j: v_j == v_i} + 1) / 2

(#equal includes the element itself), which matches mean-of-tie-run
ranking exactly. The rank comparisons stream through VMEM row-chunks
like the Kendall kernel, and the Pearson moments of the ranks
(Σr, Σr², Σ r·r_ref) accumulate in the same pass — the correlation is
assembled on the host from five scalars per voxel.
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

    def kernel(xrank_ref, y_ref, out_ref):
        c = pl.program_id(1)
        y = y_ref[0, 0, :]  # (npad,) this voxel's series (padded BIG)
        row0 = c * rows
        yi = y_ref[0, 0, pl.ds(row0, rows)].reshape(rows, 1)
        xr_i = xrank_ref[0, pl.ds(row0, rows)].reshape(rows, 1)
        dys = y.reshape(1, npad) - yi  # (rows, npad) y_j − y_i
        col_ids = jax.lax.broadcasted_iota(
            jnp.int32, (rows, npad), 1
        ).astype(jnp.float32)
        real_col = (col_ids < n).astype(jnp.float32)
        less = jnp.sum((dys < 0.0).astype(jnp.float32) * real_col,
                       axis=1, keepdims=True)
        equal = jnp.sum((dys == 0.0).astype(jnp.float32) * real_col,
                        axis=1, keepdims=True)
        rank = less + (equal + 1.0) * 0.5  # (rows, 1), 1-based

        row_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0).astype(
                jnp.float32
            )
            + row0
        )
        valid = (row_ids < n).astype(jnp.float32)
        rank = rank * valid
        s_r = jnp.sum(rank)
        s_rr = jnp.sum(rank * rank)
        s_rx = jnp.sum(rank * xr_i * valid)
        partial = jnp.stack(
            [s_r, s_rr, s_rx, jnp.float32(0.0)]
        ).reshape(1, 4)

        @pl.when(c == 0)
        def _():
            out_ref[0] = jnp.zeros((1, 4), jnp.float32)

        out_ref[0] += partial

    return kernel, num_chunks


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spearman_flat(series, x, interpret):
    v, n = series.shape
    npad = round_up(n, 128)
    rows = min(_ROWS, npad)
    npad = round_up(npad, rows)
    pad_n = npad - n

    # Reference-series fractional ranks (one series — the XLA rank path
    # is fine here).
    from correrender_tpu.ops.ranks import fractional_ranks

    xrank = fractional_ranks(x.astype(jnp.float32))
    xrank_p = jnp.pad(xrank, (0, pad_n))
    sp = jnp.pad(series.astype(jnp.float32), ((0, 0), (0, pad_n)),
                 constant_values=_BIG)

    kernel, num_chunks = _make_kernel(n, npad, rows)
    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((v, 1, 4), jnp.float32),
        grid=(v, num_chunks),
        in_specs=[
            pl.BlockSpec((1, npad), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xrank_p.reshape(1, npad), sp.reshape(v, 1, npad))

    s_r = acc[:, 0, 0]
    s_rr = acc[:, 0, 1]
    s_rx = acc[:, 0, 2]
    s_x = jnp.sum(xrank)
    s_xx = jnp.sum(xrank * xrank)
    nn = jnp.float32(n)
    num = nn * s_rx - s_x * s_r
    den = jnp.sqrt((nn * s_xx - s_x * s_x) * (nn * s_rr - s_r * s_r))
    return (num / den).astype(jnp.float32)


def spearman_pallas(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Spearman rho field via the fused Pallas kernel.

    Args:
      stack: ``(..., n)`` member series.
      ref: ``(n,)`` reference series.

    Returns:
      ``(...)`` float32 Spearman rho.
    """
    if interpret is None:
        interpret = not on_tpu()
    n = stack.shape[-1]
    lead = stack.shape[:-1]
    return _spearman_flat(
        stack.reshape(-1, n), ref, interpret
    ).reshape(lead)
