"""Kendall rank correlation (tau-b) over the member axis.

The reference counts discordant pairs with an O(n log n) merge-sort
inversion counter and assembles

    tau = (n0 - n1 - n2 - 2·S) / (sqrt(n0-n1) · sqrt(n0-n2))

with n0 = n(n-1)/2 pair count, n1/n2 = tied-pair counts of x/y, and
joint ties n3 deliberately set to 0 (reference:
src/Calculators/Correlation.cpp:305-465, note ``IntType n3 = 0``).

A per-voxel merge sort is a poor fit for the VPU. Instead we evaluate
the *pairwise* form directly:

    sum_{i<j} sign(x_i - x_j) · sign(y_i - y_j) = n0 - n1 - n2 + n3 - 2·S

The reference forces n3 = 0 (``IntType n3 = 0; // TODO``), so we count
the joint-tie pairs in the same sweep ((dx==0) & (dy==0)) and subtract
them from the numerator, reproducing the reference's convention exactly
— including on quantized/integer ensembles where pairs tie in both
variables. The O(n²) pair sweep vectorizes perfectly and is tiled over
the member axis to bound memory: per step we materialize
``(..., n, chunk)`` sign products only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pad_to(v: jnp.ndarray, size: int) -> jnp.ndarray:
    pad = size - v.shape[-1]
    if pad == 0:
        return v
    widths = [(0, 0)] * (v.ndim - 1) + [(0, pad)]
    return jnp.pad(v, widths)


@functools.partial(jax.jit, static_argnames=("chunk", "dtype"))
def kendall(
    x: jnp.ndarray,
    y: jnp.ndarray,
    dtype=None,
    *,
    chunk: int = 128,
) -> jnp.ndarray:
    """Kendall tau-b between ``x`` and ``y`` along the last axis.

    Args:
      x, y: ``(..., n)`` values; leading axes broadcast (they are
        broadcast to a common shape internally).
      dtype: accumulator dtype for the pair counts. Default (None)
        picks float32 while the double-counted sum n(n−1) stays below
        2^24 (n ≲ 4000) and int32 beyond (exact to n ≤ 46340 — the
        summands are exact signs/indicators, so integer accumulation
        is exact until n² overflows; the final tau assembly converts
        the exact counts to float32, a ≤6e-8 relative rounding).
      chunk: member-axis tile width of the pair sweep.

    Returns:
      ``(...)`` float32 tau-b.
    """
    x, y = jnp.broadcast_arrays(x, y)
    n = x.shape[-1]
    if dtype is None:
        if n * (n - 1) < 2 ** 24:
            dtype = jnp.float32
        elif n <= 46340:
            dtype = jnp.int32
        else:
            raise ValueError(
                f"kendall: n={n} overflows int32 pair counts; pass an "
                "explicit accumulator dtype (e.g. float64 with x64 on)"
            )
    chunk = min(chunk, n)
    num_chunks = -(-n // chunk)
    padded = num_chunks * chunk
    xp = _pad_to(x, padded)
    yp = _pad_to(y, padded)
    valid = jnp.arange(padded) < n  # (padded,)

    batch_shape = x.shape[:-1]
    zero = jnp.zeros(batch_shape, dtype)

    def body(c, acc):
        num, tie_x, tie_y, tie_xy = acc
        start = c * chunk
        xs = jax.lax.dynamic_slice_in_dim(xp, start, chunk, axis=-1)
        ys = jax.lax.dynamic_slice_in_dim(yp, start, chunk, axis=-1)
        ms = jax.lax.dynamic_slice_in_dim(valid, start, chunk, axis=0)
        dx = x[..., :, None] - xs[..., None, :]  # (..., n, chunk)
        dy = y[..., :, None] - ys[..., None, :]
        sx = jnp.sign(dx).astype(dtype)
        sy = jnp.sign(dy).astype(dtype)
        tx = (dx == 0).astype(dtype)
        ty = (dy == 0).astype(dtype)
        m = ms.astype(dtype)  # (chunk,) masks padded columns
        num = num + jnp.sum(sx * sy * m, axis=(-2, -1))
        tie_x = tie_x + jnp.sum(tx * m, axis=(-2, -1))
        tie_y = tie_y + jnp.sum(ty * m, axis=(-2, -1))
        tie_xy = tie_xy + jnp.sum(tx * ty * m, axis=(-2, -1))
        return num, tie_x, tie_y, tie_xy

    num, tie_x, tie_y, tie_xy = jax.lax.fori_loop(
        0, num_chunks, body, (zero, zero, zero, zero)
    )
    # Full double sum counted both (i,j) and (j,i); diagonal is zero for
    # num and n for the tie counts (every element ties with itself).
    num = num * 0.5
    n1 = (tie_x - n) * 0.5
    n2 = (tie_y - n) * 0.5
    n3 = (tie_xy - n) * 0.5
    # The pairwise sum equals n0-n1-n2+n3-2S, but the reference forces
    # n3 = 0 in its numerator (Correlation.cpp:444) — subtract the
    # joint-tie count to match its convention bit-for-bit.
    num = num - n3
    n0 = 0.5 * n * (n - 1)
    den = jnp.sqrt(n0 - n1) * jnp.sqrt(n0 - n2)
    tau = (num / den).astype(jnp.float32)
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        # Integer accumulation swallows NaNs (casting NaN signs to int
        # is silent garbage); re-apply the float path's NaN semantics.
        has_nan = jnp.isnan(x).any(-1) | jnp.isnan(y).any(-1)
        tau = jnp.where(has_nan, jnp.nan, tau)
    return tau
