"""Pallas transfer-function classification kernel.

The XLA two-hot formulation (render/classify.py) materializes a
(voxels, R) weight tensor through HBM per slab. This kernel builds the
tent weights in VMEM per tile and contracts them with the (R, 4) LUT on
the MXU immediately — the volume is read once and the RGBA volume
written once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up


def _make_kernel(res: int, tile_v: int):
    def kernel(domain_ref, lut_ref, v_ref, out_ref):
        lo = domain_ref[0, 0]
        hi = domain_ref[0, 1]
        v = v_ref[0, 0, :]  # (tile_v,)
        # Degenerate-domain guard (hi == lo, constant field): map
        # finite values to bin 0 instead of 0/0 = NaN weights — same
        # semantics as render/classify.two_hot_weights.
        span = hi - lo
        safe_span = jnp.where(span > 0, span, 1.0)
        u = jnp.clip((v - lo) / safe_span, 0.0, 1.0) * (res - 1)
        u = jnp.where(span > 0, u, 0.0)
        u = jnp.where(jnp.isnan(v), -2.0, u)  # NaN → zero weights
        bins = jax.lax.broadcasted_iota(
            jnp.int32, (tile_v, res), 1
        ).astype(jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(u[:, None] - bins), 0.0)
        out_ref[0] = jnp.dot(
            w.astype(jnp.bfloat16),
            lut_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("premultiply", "interpret"))
def classify_pallas(
    scalars: jnp.ndarray,
    lut: jnp.ndarray,
    domain: jnp.ndarray,
    premultiply: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """TF classification via the Pallas kernel (see render/classify.py
    for semantics — linear LUT interpolation, NaN → transparent).

    Args:
      scalars: any-shape scalar field.
      lut: (R, 4) RGBA LUT.
      domain: (2,) value range.

    Returns:
      ``scalars.shape + (4,)`` float32.
    """
    if interpret is None:
        interpret = not on_tpu()
    res = lut.shape[0]
    lead = scalars.shape
    v = 1
    for d in lead:
        v *= int(d)
    tile_v = 2048
    flat = scalars.reshape(v)
    padded = round_up(max(v, tile_v), tile_v)
    if padded != v:
        flat = jnp.pad(flat, (0, padded - v), constant_values=jnp.nan)

    out_lut = lut
    if premultiply:
        out_lut = jnp.concatenate(
            [lut[:, :3] * lut[:, 3:4], lut[:, 3:4]], axis=-1
        )

    grid = (padded // tile_v,)
    out = pl.pallas_call(
        _make_kernel(res, tile_v),
        out_shape=jax.ShapeDtypeStruct((padded // tile_v, tile_v, 4),
                                       jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((res, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_v), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_v, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        domain.astype(jnp.float32).reshape(1, 2),
        out_lut.astype(jnp.float32),
        flat.reshape(padded // tile_v, 1, tile_v),
    )
    return out.reshape(padded, 4)[:v].reshape(lead + (4,))
