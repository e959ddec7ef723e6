"""Pallas fused shear-warp compositor.

The XLA composite (render/dvr_fast.py::_composite_scan) materializes a
(chunk, Hi, Wi, 4) resampled slab per slice chunk in HBM — ~3× the
intermediate image per slice in write+read traffic. This kernel fuses
resample + opacity + OVER into VMEM:

* grid = row-tiles of the intermediate image; the classified volume
  (channel-first, padded) streams through a double-buffered DMA, one
  slice per step;
* per slice: separable tent-weight matmuls resample the slice onto the
  tile, opacity correction + front-to-back OVER accumulate in VMEM;
* only the final tile leaves the chip.

HBM traffic: stack × num_row_tiles + output (vs. ~3 × S × image for
the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up

_EPS = 1e-6


def _make_kernel(s: int, yv: int, xv: int, tile_h: int, wi: int,
                 use_kstop: bool = False):
    def kernel(
        scalars_ref,  # SMEM (1, 8): e_u, e_v, dy, dx, slab_thk, atten, y0, x0
        g_ref,  # SMEM (1, S)
        grid_v_ref,  # VMEM (1, tile_h) — this tile's grid coords
        grid_u_ref,  # VMEM (1, wi)
        len_ref,  # VMEM (tile_h, wi) — this tile's Δs factors
        *rest,  # [kstop_ref] cvol_hbm out_ref slice_buf sem
    ):
        if use_kstop:
            # Fractional stop-slice per intermediate pixel — the
            # shared per-view depth buffer pulled into slice units
            # (reference DvrShader.glsl depth test).
            kstop_ref, cvol_hbm, out_ref, slice_buf, sem = rest
        else:
            kstop_ref = None
            cvol_hbm, out_ref, slice_buf, sem = rest
        e_u = scalars_ref[0, 0]
        e_v = scalars_ref[0, 1]
        dy = scalars_ref[0, 2]
        dx = scalars_ref[0, 3]
        slab_thk = scalars_ref[0, 4]
        atten = scalars_ref[0, 5]
        y0 = scalars_ref[0, 6]  # first voxel-center coord along v
        x0 = scalars_ref[0, 7]  # first voxel-center coord along u

        gv = grid_v_ref[0, 0, :]  # (tile_h,)
        gu = grid_u_ref[0, :]  # (wi,)

        ycoords = y0 + dy * jax.lax.broadcasted_iota(
            jnp.int32, (1, yv), 1
        ).astype(jnp.float32)  # (1, Yv)
        xcoords = x0 + dx * jax.lax.broadcasted_iota(
            jnp.int32, (1, xv), 1
        ).astype(jnp.float32)  # (1, Xv)

        def dma(k, slot):
            return pltpu.make_async_copy(
                cvol_hbm.at[k], slice_buf.at[slot], sem.at[slot]
            )

        dma(0, 0).start()
        # out_ref doubles as the accumulator (channel-first layout) —
        # keeping the OVER state in the output block halves VMEM
        # pressure vs. a separate fori carry.
        out_ref[0] = jnp.zeros((4, tile_h, wi), jnp.float32)

        def body(k, _):
            slot = k % 2

            @pl.when(k + 1 < s)
            def _():
                dma(k + 1, (k + 1) % 2).start()

            dma(k, slot).wait()
            gk = g_ref[0, k]
            qv = e_v + (gv - e_v) * gk  # (tile_h,)
            qu = e_u + (gu - e_u) * gk  # (wi,)
            wv = jnp.maximum(
                1.0 - jnp.abs(qv[:, None] - ycoords) / dy, 0.0
            ).astype(jnp.bfloat16)  # (tile_h, Yv)
            wu = jnp.maximum(
                1.0 - jnp.abs(qu[:, None] - xcoords) / dx, 0.0
            ).astype(jnp.bfloat16)  # (wi, Xv)
            slice_c = slice_buf[slot]  # (4, Yv, Xv) bf16
            t1 = jax.lax.dot_general(
                slice_c, wv,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # (4, Xv, tile_h)
            # lhs free dims (4, tile_h) + rhs free (wi) → (4, tile_h, wi).
            slab = jax.lax.dot_general(
                t1, wu,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            tau = slab[3]  # (tile_h, wi)
            valid = (gk > _EPS).astype(jnp.float32)
            thickness = slab_thk * len_ref[:]
            if use_kstop:
                # Scale the slab's optical thickness by how much of it
                # lies in front of the depth limit (fractional at the
                # boundary slice, 0 beyond it).
                thickness = thickness * jnp.clip(
                    kstop_ref[:] - k.astype(jnp.float32), 0.0, 1.0
                )
            alpha = (
                1.0 - jnp.exp(-tau * thickness * atten)
            ) * valid
            inv_tau = alpha / jnp.maximum(tau, _EPS)
            acc_a = out_ref[0, 3]
            w = (1.0 - acc_a) * inv_tau  # premult contribution scale
            out_ref[0, 0:3] += w[None] * slab[0:3]
            out_ref[0, 3] = acc_a + (1.0 - acc_a) * alpha
            return 0

        jax.lax.fori_loop(0, s, body, 0)

    return kernel


def _make_classify_cf_kernel(res: int, tile_v: int):
    def kernel(domain_ref, lutt_ref, v_ref, out_ref):
        lo = domain_ref[0, 0]
        hi = domain_ref[0, 1]
        v = v_ref[0, 0, :].reshape(1, tile_v)
        u = jnp.clip((v - lo) / (hi - lo), 0.0, 1.0) * (res - 1)
        u = jnp.where(jnp.isnan(v), -2.0, u)  # NaN → zero weights
        bins = jax.lax.broadcasted_iota(
            jnp.int32, (res, 1), 0
        ).astype(jnp.float32)
        # Tent weights TRANSPOSED (bins on sublanes, voxels on lanes):
        # both the construction and the (4, res) @ (res, tile) MXU
        # contraction are transpose-free this way.
        w_t = jnp.maximum(1.0 - jnp.abs(u - bins), 0.0)
        out_ref[0] = jnp.dot(
            lutt_ref[:].astype(jnp.bfloat16),
            w_t.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def classify_to_cf(svol, lut, domain, interpret: bool | None = None):
    """Fused classification → compositor layout.

    (S, Yv, Xv) scalar slices (already in shear-warp orientation) →
    (S, 4, Yv_pad, Xv_pad) premultiplied bf16, channel-first — the
    layout :func:`shearwarp_composite_pallas` streams. Padding is
    filled with NaN scalars, which classify to transparent black.

    This is the transfer-function-change path: with the scalar layout
    resident, a new TF costs ONE fused pass (read the scalars, write
    the bf16 classified volume) instead of classify + transpose +
    cast (~100 ms at 250³ in round 1).
    """
    if interpret is None:
        interpret = not on_tpu()
    res = lut.shape[0]
    s, yv, xv = svol.shape
    yv_pad = round_up(yv, 8)
    xv_pad = round_up(xv, 128)
    svol_p = jnp.pad(
        svol,
        ((0, 0), (0, yv_pad - yv), (0, xv_pad - xv)),
        constant_values=jnp.nan,
    )
    plane = yv_pad * xv_pad
    tile_v = min(plane, 32768)
    while plane % tile_v:
        tile_v //= 2
    nt = plane // tile_v
    flat = svol_p.reshape(s, 1, plane)

    lutp = jnp.concatenate([lut[:, :3] * lut[:, 3:4], lut[:, 3:4]], -1)
    lutt = jnp.transpose(lutp.astype(jnp.float32))  # (4, res)

    out = pl.pallas_call(
        _make_classify_cf_kernel(res, tile_v),
        out_shape=jax.ShapeDtypeStruct((s, 4, plane), jnp.bfloat16),
        grid=(s, nt),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, res), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_v), lambda i, t: (i, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, tile_v), lambda i, t: (i, 0, t),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        jnp.asarray(domain, jnp.float32).reshape(1, 2),
        lutt,
        flat,
    )
    return out.reshape(s, 4, yv_pad, xv_pad)


def prepare_cvol_cf(cvol):
    """Pre-compute the compositor's resident layout.

    (S, Yv, Xv, 4) float32 → (S, 4, Yv_pad, Xv_pad) bf16. The layout
    transform + cast stream ~3× the volume through HBM — paid once per
    TF/field/camera-axis change instead of per frame when the caller
    passes the result via ``cvol_cf`` (the reference's classified
    texture is resident the same way).
    """
    s, yv, xv, _ = cvol.shape
    yv_pad = round_up(yv, 8)
    xv_pad = round_up(xv, 128)
    cf = jnp.transpose(cvol, (0, 3, 1, 2))
    return jnp.pad(
        cf, ((0, 0), (0, 0), (0, yv_pad - yv), (0, xv_pad - xv))
    ).astype(jnp.bfloat16)


@functools.partial(
    jax.jit, static_argnames=("hi", "wi", "vu", "interpret")
)
def shearwarp_composite_pallas(
    cvol,  # (S, Yv, Xv, 4) classified slices, near→far
    g,  # (S,)
    coords_y,  # (Yv,) voxel-center world coords (v axis)
    coords_x,  # (Xv,)
    grid_v,  # (hi,)
    grid_u,  # (wi,)
    eye_uv,  # (2,)
    len_factor,  # (hi, wi)
    slab_thickness,
    attenuation,
    hi: int,
    wi: int,
    cvol_cf=None,  # optional prepare_cvol_cf result (resident layout)
    vu: tuple | None = None,  # (Yv, Xv) when cvol_cf is passed
    kstop=None,  # optional (hi, wi) fractional stop-slice indices
    interpret: bool = False,
):
    """Fused composite; returns (rgb (hi, wi, 3), alpha (hi, wi)).

    Pass ``cvol`` for one-shot use, or ``cvol_cf``/``vu`` (see
    :func:`prepare_cvol_cf`) to skip the per-call layout transform —
    then ``cvol`` may be None. ``kstop`` clips the march against a
    shared depth buffer expressed in slice units (see
    render/dvr_fast.py::dvr_shearwarp's ``depth_limit``).
    """
    if cvol_cf is not None:
        s = cvol_cf.shape[0]
        yv, xv = vu
        yv_pad = round_up(yv, 8)
        xv_pad = round_up(xv, 128)
    else:
        s, yv, xv, _ = cvol.shape
        yv_pad = round_up(yv, 8)
        xv_pad = round_up(xv, 128)
    hi_pad = round_up(hi, 128)
    wi_pad = round_up(wi, 128)
    tile_h = 128
    num_tiles = hi_pad // tile_h

    if cvol_cf is None:
        cvol_cf = prepare_cvol_cf(cvol)
    dy = (coords_y[1] - coords_y[0]) if yv > 1 else jnp.float32(1.0)
    dx = (coords_x[1] - coords_x[0]) if xv > 1 else jnp.float32(1.0)
    # Padded voxel centers continue the spacing — their classified
    # values are zero, so tent weights reaching them contribute nothing.
    scalars = jnp.stack(
        [
            eye_uv[0], eye_uv[1],
            jnp.float32(dy), jnp.float32(dx),
            jnp.asarray(slab_thickness, jnp.float32),
            jnp.asarray(attenuation, jnp.float32),
            coords_y[0], coords_x[0],
        ]
    ).reshape(1, 8)
    grid_v_p = jnp.pad(grid_v, (0, hi_pad - hi),
                       constant_values=grid_v[-1] + 1e6).reshape(
        num_tiles, 1, tile_h
    )
    grid_u_p = jnp.pad(grid_u, (0, wi_pad - wi),
                       constant_values=grid_u[-1] + 1e6).reshape(1, wi_pad)
    len_p = jnp.pad(
        len_factor, ((0, hi_pad - hi), (0, wi_pad - wi)),
        constant_values=1.0,
    )

    use_kstop = kstop is not None
    kernel = _make_kernel(s, yv_pad, xv_pad, tile_h, wi_pad,
                          use_kstop=use_kstop)
    in_specs = [
        pl.BlockSpec((1, 8), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, s), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, tile_h), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wi_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_h, wi_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [scalars, g.reshape(1, s), grid_v_p, grid_u_p, len_p]
    if use_kstop:
        in_specs.append(pl.BlockSpec((tile_h, wi_pad), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.pad(
            jnp.asarray(kstop, jnp.float32),
            ((0, hi_pad - hi), (0, wi_pad - wi)),
            constant_values=float(s),
        ))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(cvol_cf)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 4, tile_h, wi_pad),
                                       jnp.float32),
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 4, tile_h, wi_pad),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 4, yv_pad, xv_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args)
    img = out.transpose(0, 2, 1, 3).reshape(hi_pad, 4, wi_pad)[:hi, :, :wi]
    rgb = img[:, :3, :].transpose(0, 2, 1)  # (hi, wi, 3)
    alpha = img[:, 3, :]
    return rgb, alpha


def composite_available() -> bool:
    return on_tpu()
