"""Pallas Pearson kernel: fused five-moment reduction over members.

One pass over the member stack in VMEM tiles computes Σy, Σy², Σxy
simultaneously (Σx, Σx² of the reference series are scalars hoisted
out), so the stack crosses HBM exactly once — the TPU analogue of the
reference's one-pass ``computePearson1``
(src/Calculators/Correlation.cpp:42-63) and its GLSL twin's
per-workgroup member loop (PearsonCorrelation.glsl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up


def _kernel(ref_ref, y_ref, stats_ref, out_ref):
    """Grid step over a (TILE_V, n) voxel tile."""
    y = y_ref[:]  # (TILE_V, n) f32
    x = ref_ref[:]  # (1, n)
    n = y.shape[-1]
    sum_y = jnp.sum(y, axis=-1)
    sum_yy = jnp.sum(y * y, axis=-1)
    # Σxy via MXU: (TILE_V, n) @ (n, 1). precision=HIGHEST is
    # load-bearing: Mosaic lowers a default f32 matmul as a single
    # bf16 pass on v5e, which cost up to 3.4e-4 absolute error vs
    # float64 on measured fields; the 3-pass decomposition restores
    # f32 accuracy and is free here (the kernel is HBM-bound).
    sum_xy = jax.lax.dot_general(
        y, x.reshape(n, 1), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )[:, 0]
    sum_x = stats_ref[0, 0]
    sum_xx = stats_ref[0, 1]
    nn = stats_ref[0, 2]
    num = nn * sum_xy - sum_x * sum_y
    den = jnp.sqrt((nn * sum_xx - sum_x * sum_x) * (nn * sum_yy - sum_y * sum_y))
    out_ref[:] = (num / den).reshape(out_ref.shape)


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret"))
def _pearson_pallas_flat(series, ref, tile_v, interpret):
    v, n = series.shape
    padded_v = round_up(v, tile_v)
    if padded_v != v:
        series = jnp.pad(series, ((0, padded_v - v), (0, 0)))
    x = ref.astype(jnp.float32)
    stats = jnp.stack(
        [jnp.sum(x), jnp.sum(x * x), jnp.float32(n)]
    ).reshape(1, 3)

    grid = (padded_v // tile_v,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((padded_v, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_v, n), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_v, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x.reshape(1, n), series, stats)
    return out[:v, 0]


def pearson_pallas(
    stack: jnp.ndarray, ref: jnp.ndarray, tile_v: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pearson field via the fused Pallas kernel.

    Args:
      stack: ``(..., n)`` member series (any leading shape).
      ref: ``(n,)`` reference series.
      tile_v: voxels per grid step (VMEM tile = tile_v × n × 4 B).
      interpret: force interpreter mode (defaults to auto: interpret
        off-TPU so CPU tests run the same code).

    Returns:
      ``(...)`` float32 correlation field.
    """
    if interpret is None:
        interpret = not on_tpu()
    n = stack.shape[-1]
    lead = stack.shape[:-1]
    series = stack.reshape(-1, n).astype(jnp.float32)
    # Keep the VMEM tile under ~4 MB.
    while tile_v > 8 and tile_v * n * 4 > (4 << 20):
        tile_v //= 2
    out = _pearson_pallas_flat(series, ref, tile_v, interpret)
    return out.reshape(lead)
