"""Pallas per-row 1D resampling kernel for the two-pass homography warp.

Both Catmull–Smith warp passes (render/dvr_fast.py::_warp_matmul) are
the same primitive: for every row r of a channel-major image, resample
the K source texels onto Wo output positions given per-(row, output)
fractional source coordinates, with linear-tent weights:

    out[c, r, a] = Σ_k max(1 − |u[r, a] − k|, 0) · img[c, r, k]

The XLA scan formulation materializes the (rows, Wo, K) bf16 tent
tensors through HBM (~2 GB per 1080p frame across both passes), which
bounds the warp at ~25 ms. Here each (K, TILE_W) weight block is built
in VMEM and consumed immediately by a (4, K)·(K, TILE_W) MXU dot —
the weights never touch HBM. Mirrors the role of the reference's
output gather in DvrShader.glsl's final blit; the two-pass matmul
factorization itself is documented in render/dvr_fast.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up

_ROWS = 8
_TILE_W = 512


def _make_kernel(rows: int, kpad: int, tile_w: int, channels: int):
    def kernel(img_ref, u_ref, out_ref):
        # img_ref: (C, rows, kpad) f32; u_ref: (rows, tile_w) f32;
        # out_ref: (C, rows, tile_w) f32.
        k_iota = jax.lax.broadcasted_iota(
            jnp.int32, (kpad, tile_w), 0
        ).astype(jnp.float32)
        for r in range(rows):
            u_r = u_ref[pl.ds(r, 1), :]  # (1, tile_w)
            w = jnp.maximum(1.0 - jnp.abs(u_r - k_iota), 0.0).astype(
                jnp.bfloat16
            )  # (kpad, tile_w)
            img_r = img_ref[:, r, :].astype(jnp.bfloat16)  # (C, kpad)
            out_ref[:, r, :] = jax.lax.dot_general(
                img_r,
                w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("out_w", "interpret"))
def _resample_rows(img, u, out_w, interpret):
    c, r, k = img.shape
    kpad = round_up(k, 128)
    rpad = round_up(r, _ROWS)
    wpad = round_up(out_w, _TILE_W)
    img_p = jnp.pad(img, ((0, 0), (0, rpad - r), (0, kpad - k)))
    # Padded coordinates land outside every tent (weight 0).
    u_p = jnp.pad(
        u, ((0, rpad - r), (0, wpad - out_w)), constant_values=-2.0
    )
    out = pl.pallas_call(
        _make_kernel(_ROWS, kpad, _TILE_W, c),
        out_shape=jax.ShapeDtypeStruct((c, rpad, wpad), jnp.float32),
        grid=(rpad // _ROWS, wpad // _TILE_W),
        in_specs=[
            pl.BlockSpec((c, _ROWS, kpad), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, _TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, _ROWS, _TILE_W),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_p.astype(jnp.float32), u_p)
    return out[:, :r, :out_w]


def resample_rows_pallas(
    img: jnp.ndarray,
    u: jnp.ndarray,
    out_w: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Tent-resample every row of a channel-major image.

    Args:
      img: ``(C, R, K)`` channel-major rows.
      u: ``(R, out_w)`` fractional source coordinates per output texel;
        coordinates outside [0, K) contribute weight 0 (clamp-free).
      out_w: output width.

    Returns:
      ``(C, R, out_w)`` float32.
    """
    if interpret is None:
        interpret = not on_tpu()
    return _resample_rows(img, u, out_w, interpret)
