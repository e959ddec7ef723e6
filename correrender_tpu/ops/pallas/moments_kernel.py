"""One-pass streaming Pearson moment accumulator (member-major chunks).

The BASELINE headline streams (E_chunk, Z, Y, X) member chunks through
a three-moment accumulate (Σy, Σy², Σxy). The XLA formulation
(bench.py::make_pearson_bench) reads the chunk once PER REDUCTION —
measured on silicon this round: pure read 735 GB/s, +Σy 563, +Σy² 305,
all three 219 GB/s — i.e. the chunk crosses HBM ~3 times.

This kernel reads it exactly once. Layout lessons (both measured):

* round 1: members on lanes → sublane-strided voxel tiles, 5× slower;
* round 5 first cut: members on sublanes with a voxel-tiled grid →
  every (E, TILE_V) tile gathers E segments of TILE_V·4 bytes at a
  ~62 MB row stride; at 64 KB segments the per-segment DMA overhead
  capped it at 19 GB/s.

The shape that works: grid = (voxel_tiles, member_blocks) with the
member axis INNERMOST, so each step reads a few LONG contiguous rows
((e_blk, TILE_V) with TILE_V ≈ 64K → ¼ MB segments) and the output
tile stays VMEM-resident across the member-block loop (the matmul
reduction-dim pattern: revisited out block, zero-initialized at the
first member step).

Semantics match the XLA accumulate exactly (f32 accumulation; bf16
chunks upcast on read), so the two paths A/B against each other on
hardware (bench.py) and in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up


def _make_kernel():
    def kernel(r_ref, c_ref, out_ref):
        ie = pl.program_id(1)

        @pl.when(ie == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        c = c_ref[:].astype(jnp.float32)       # (e_blk, TILE_V)
        r = r_ref[0]                            # (e_blk, 1) VMEM block
        out_ref[0] += jnp.sum(c, axis=0, keepdims=True)
        out_ref[1] += jnp.sum(c * c, axis=0, keepdims=True)
        out_ref[2] += jnp.sum(c * r, axis=0, keepdims=True)

    return kernel


def _pick_e_block(e: int) -> int:
    # Mosaic block constraint: the second-minor block dim must be a
    # multiple of 8 (or the whole axis). Zero-padded member rows with
    # zero ref entries contribute nothing to any of the three sums.
    for b in (8, 16):
        if e % b == 0:
            return b
    return e


@functools.partial(jax.jit, static_argnames=("tile_v", "interpret"))
def chunk_moments_flat(flat, ref_chunk, tile_v: int = 65536,
                       interpret: bool | None = None):
    """Moments of a pre-flattened ``(E, Vp)`` chunk, ``Vp % tile_v == 0``.

    The zero-copy entry for streaming callers that keep resident
    chunk buffers in this layout (bench.py does): no pad, no reshape
    — one HBM pass total.
    """
    if interpret is None:
        interpret = not on_tpu()
    e, vp = flat.shape
    if vp % tile_v:
        raise ValueError(f"Vp={vp} not a multiple of tile_v={tile_v}")
    if e % 8 and e != _pick_e_block(e):
        raise ValueError(
            f"E={e} must be a multiple of 8 (pad member rows with "
            "zeros and the ref slice with zeros — the sums are "
            "unaffected) or pass the unpadded chunk to chunk_moments")
    e_blk = _pick_e_block(e)
    ne = e // e_blk
    rp = ref_chunk.astype(jnp.float32).reshape(ne, e_blk, 1)
    out = pl.pallas_call(
        _make_kernel(),
        out_shape=jax.ShapeDtypeStruct((3, 1, vp), jnp.float32),
        grid=(vp // tile_v, ne),  # member blocks innermost: the out
        #                            tile stays resident across them
        in_specs=[
            pl.BlockSpec((1, e_blk, 1), lambda iv, ie: (ie, 0, 0)),
            pl.BlockSpec((e_blk, tile_v), lambda iv, ie: (ie, iv)),
        ],
        out_specs=pl.BlockSpec((3, 1, tile_v),
                               lambda iv, ie: (0, 0, iv)),
        interpret=interpret,
    )(rp, flat)
    return out.reshape(3, vp)


def chunk_moments(chunk, ref_chunk, tile_v: int = 65536,
                  interpret: bool | None = None):
    """Three Pearson moments of one member chunk in ONE HBM pass.

    Args:
      chunk: ``(E, Z, Y, X)`` member-major slab (f32 or bf16).
      ref_chunk: ``(E,)`` reference-series slice.

    Returns:
      ``(sum_y, sum_yy, sum_xy)``, each ``(Z, Y, X)`` float32.

    Note: a non-multiple voxel count pays one pad copy of the chunk —
    streaming callers should keep resident buffers pre-flattened and
    use :func:`chunk_moments_flat` instead.
    """
    e = chunk.shape[0]
    spatial = chunk.shape[1:]
    v = 1
    for d in spatial:
        v *= int(d)
    vp = round_up(v, tile_v)
    ep = round_up(e, 8)
    flat = chunk.reshape(e, v)
    if vp != v or ep != e:
        flat = jnp.pad(flat, ((0, ep - e), (0, vp - v)))
        ref_chunk = jnp.pad(ref_chunk, (0, ep - e))
    out = chunk_moments_flat(flat, ref_chunk, tile_v=tile_v,
                             interpret=interpret)
    out = out[:, :v].reshape((3,) + spatial)
    return out[0], out[1], out[2]
