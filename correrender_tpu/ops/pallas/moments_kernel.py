"""One-pass streaming Pearson moment accumulator (member-major chunks).

The BASELINE headline streams (E_chunk, Z, Y, X) member chunks through
a three-moment accumulate (Σy, Σy², Σxy). The XLA formulation
(bench.py::make_pearson_bench) materializes each reduction separately
— the round-4 roofline reconciliation measured its effective bandwidth
at ~230-260 GB/s while pure reads hit ~700 GB/s, the signature of the
chunk being READ ONCE PER REDUCTION rather than once in total.

This kernel is the true one-pass form: each (E_pad, TILE_V) tile is
read from HBM exactly once and all three moments come out of that one
read (two VPU reductions + one broadcast-multiply reduction over the
member sublanes). The round-1 attempt at this was 5× SLOWER because it
tiled the member axis onto lanes (sublane-strided voxel access); here
members sit on sublanes (≤ ~56 rows after padding) and voxels stream
along lanes — the natural layout of a member-major chunk.

Semantics match the XLA accumulate exactly (f32 accumulation; bf16
chunks upcast on read), so the two paths A/B against each other on
hardware (bench.py pearson_roofline) and in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up


def _kernel(r_ref, c_ref, out_ref):
    c = c_ref[:].astype(jnp.float32)       # (E_pad, TILE_V)
    r = r_ref[:].astype(jnp.float32)       # (E_pad, 1)
    out_ref[0] = jnp.sum(c, axis=0, keepdims=True)
    out_ref[1] = jnp.sum(c * c, axis=0, keepdims=True)
    out_ref[2] = jnp.sum(c * r, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret"))
def chunk_moments(chunk, ref_chunk, tile_v: int = 16384,
                  interpret: bool | None = None):
    """Three Pearson moments of one member chunk in ONE HBM pass.

    Args:
      chunk: ``(E, Z, Y, X)`` member-major slab (f32 or bf16).
      ref_chunk: ``(E,)`` reference-series slice.
      tile_v: voxels per grid step (lanes; VMEM tile = E_pad × tile_v).

    Returns:
      ``(sum_y, sum_yy, sum_xy)``, each ``(Z, Y, X)`` float32 — add
      into the stream accumulator exactly like the XLA formulation.
    """
    if interpret is None:
        interpret = not on_tpu()
    e = chunk.shape[0]
    spatial = chunk.shape[1:]
    v = 1
    for d in spatial:
        v *= int(d)
    e_pad = round_up(e, 8)
    flat = chunk.reshape(e, v)
    vp = round_up(v, tile_v)
    flat = jnp.pad(flat, ((0, e_pad - e), (0, vp - v)))
    rp = jnp.pad(ref_chunk.astype(jnp.float32),
                 (0, e_pad - e)).reshape(e_pad, 1)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((3, 1, vp), jnp.float32),
        grid=(vp // tile_v,),
        in_specs=[
            pl.BlockSpec((e_pad, 1), lambda i: (0, 0)),
            pl.BlockSpec((e_pad, tile_v), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((3, 1, tile_v), lambda i: (0, 0, i)),
        interpret=interpret,
    )(rp, flat)
    out = out.reshape(3, vp)[:, :v].reshape((3,) + spatial)
    return out[0], out[1], out[2]
