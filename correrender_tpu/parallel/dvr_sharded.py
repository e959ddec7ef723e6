"""Multi-chip shear-warp DVR: volume Z-sharded over the mesh.

New TPU-native design (the reference is single-GPU). The shear-warp
composite is a front-to-back OVER fold over slices — and OVER is
associative, so it *factors across the mesh*: each shard composites
its own slab of slices onto the shared intermediate grid locally, then
the per-shard partial images are ordered-OVER-combined with one
``all_gather`` (one (Hi, Wi, 4) image per shard crosses the ICI instead
of any volume data). The final homography warp runs on the replicated
intermediate.

Cameras whose principal axis is X or Y re-shard the classified volume
over their compositing axis with ONE all-to-all (a (slice, v, u)
transpose under GSPMD) — (N−1)/N of the volume crosses the ICI once,
instead of every chip holding a full copy. Non-divisible extents pad
with inert slices (alpha 0, g = -1), keeping the 1/N per-device memory
invariant at odd real-world sizes like 250³; only eye-inside cameras
fall back to a gathered single-device render.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from correrender_tpu.render.camera import default_render_box
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from correrender_tpu.render.classify import classify_volume
from correrender_tpu.render.dvr_fast import (
    shearwarp_viable,
    _composite_scan,
    _principal_axis,
    dvr_shearwarp,
)


@functools.lru_cache(maxsize=32)
def _sharded_render_fn(mesh: Mesh, axis_name: str, flip: bool,
                       n_shards: int, hi_res: int, wi_res: int,
                       use_pallas: bool):
    """Build + jit the per-shard composite once per static signature.

    All camera-dependent geometry enters as ARRAYS so camera motion
    reuses the compiled executable — a fresh shard_map closure per
    frame recompiled every call (measured ~20 s/frame in round 1's
    config-5 batch)."""

    def local_render(cvol_blk, g_blk, coords_v, coords_u, grid_v,
                     grid_u, e, len_f, slab_thk, atten):
        # cvol_blk: (S_loc, Y, X, 4) — this shard's slab (global order).
        cvol_loc = cvol_blk
        g_loc = g_blk[0]
        if flip:
            cvol_loc = jnp.flip(cvol_loc, axis=0)
            g_loc = jnp.flip(g_loc, axis=0)
        args = (cvol_loc, g_loc, coords_v, coords_u, grid_v, grid_u,
                e, len_f, slab_thk, atten)
        if use_pallas:
            from correrender_tpu.ops.pallas.shearwarp_kernel import (
                shearwarp_composite_pallas,
            )

            rgb, alpha = shearwarp_composite_pallas(
                *args, hi=hi_res, wi=wi_res
            )
        else:
            rgb, alpha = _composite_scan(*args, hi=hi_res, wi=wi_res)
        # One image per shard over the ICI.
        rgbs = jax.lax.all_gather(rgb, axis_name)  # (N, hi, wi, 3)
        alphas = jax.lax.all_gather(alpha, axis_name)  # (N, hi, wi)
        order = range(n_shards - 1, -1, -1) if flip else range(n_shards)
        acc_rgb = jnp.zeros_like(rgb)
        acc_a = jnp.zeros_like(alpha)
        for i in order:  # static unroll, front-to-back
            w = (1.0 - acc_a)
            acc_rgb = acc_rgb + w[..., None] * rgbs[i]
            acc_a = acc_a + w * alphas[i]
        return acc_rgb, acc_a

    return jax.jit(shard_map(
        local_render,
        mesh=mesh,
        in_specs=(
            P(axis_name, None, None, None),
            P(axis_name, None),
            P(None), P(None), P(None), P(None), P(None),
            P(None, None), P(), P(),
        ),
        out_specs=(P(None, None, None), P(None, None)),
        check_vma=False,
    ))


def dvr_shearwarp_sharded(
    volume: jnp.ndarray,
    camera,
    transfer_function,
    mesh: Mesh,
    image_size=(1920, 1080),
    box=None,
    attenuation: float = 100.0,
    background=(0.0, 0.0, 0.0, 1.0),
    intermediate_scale: float = 1.0,
    axis_name: str = "space",
) -> jnp.ndarray:
    """Render a Z-sharded volume with distributed shear-warp DVR."""
    zs, ys, xs = volume.shape
    if box is None:
        box = default_render_box((zs, ys, xs))
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)

    eye = np.asarray(camera.position, np.float32)
    forward = np.asarray(camera.look_at_point, np.float32) - eye
    forward /= np.linalg.norm(forward)
    a = _principal_axis(forward)
    in_plane = [i for i in range(3) if i != a]
    # Array axes in (slice, v, u) order for this camera.
    world_to_arr = {2: 0, 1: 1, 0: 2}
    perm = (world_to_arr[a], world_to_arr[in_plane[1]],
            world_to_arr[in_plane[0]])
    n_shards = mesh.shape[axis_name]
    dims_zyx = (zs, ys, xs)
    s = dims_zyx[perm[0]]
    if not shearwarp_viable(camera, box):
        # Eye-inside cameras: exact fallback.
        gathered = jax.device_put(
            volume, NamedSharding(mesh, P(None, None, None))
        )
        return dvr_shearwarp(
            gathered, camera, transfer_function, image_size=image_size,
            box=box, attenuation=attenuation, background=background,
            intermediate_scale=intermediate_scale,
        )
    # Compositing extents that don't divide the shard count (e.g. 250
    # slices on 8 shards) pad with INERT slices (alpha 0, g = -1 —
    # both composite paths skip g ≤ 0) instead of falling back to a
    # fully replicated render, which would break the 1/N per-device
    # memory invariant exactly at odd real-world sizes.
    s_pad = -(-s // n_shards) * n_shards

    # --- single-device setup math, shared (dvr_fast) ------------------
    nv, nu = dims_zyx[perm[1]], dims_zyx[perm[2]]
    flip = forward[a] < 0
    from correrender_tpu.render.dvr_fast import shearwarp_geometry

    geo = shearwarp_geometry(
        camera, box_min, box_max, a, in_plane, bool(flip), s, nv, nu,
        image_size, intermediate_scale,
    )
    coords_v, coords_u = geo["coords_v"], geo["coords_u"]
    g, z_ref, e_u, e_v = (geo["g"].astype(np.float32), geo["z_ref"],
                          geo["e_u"], geo["e_v"])
    grid_u, grid_v = geo["grid_u"], geo["grid_v"]
    hi_res, wi_res = geo["hi_res"], geo["wi_res"]
    len_factor, slab_thickness = (
        geo["len_factor"], geo["slab_thickness"])
    width, height = image_size

    # --- classification stays sharded (elementwise) --------------------
    # The classify stage shards along z, so a non-divisible zs pads
    # with WRAP rows (discarded after classification by [:zs]; wrap
    # reproduces the dense jnp.roll boundary semantics if anything
    # downstream ever reads them).
    z_pad = -(-zs // n_shards) * n_shards
    vol_in = volume
    if z_pad != zs:
        vol_in = jnp.pad(volume, ((0, z_pad - zs), (0, 0), (0, 0)),
                         mode="wrap")
    vol_sharding = NamedSharding(mesh, P(axis_name, None, None))
    vol_in = jax.device_put(vol_in, vol_sharding)
    classified = classify_volume(
        vol_in, transfer_function.lut,
        jnp.asarray(transfer_function.domain, jnp.float32),
    )[:zs]  # (Z, Y, X, 4), Z-sharded
    # Re-layout to (slice, v, u, 4) sharded along the compositing axis.
    # For non-Z-principal cameras this is ONE all-to-all over the ICI
    # ((N−1)/N of the volume moves, vs N× memory for a full gather).
    classified = jnp.transpose(classified, perm + (3,))
    if s_pad != s:
        classified = jnp.pad(
            classified,
            ((0, s_pad - s), (0, 0), (0, 0), (0, 0)),
        )
    classified = jax.device_put(
        classified,
        NamedSharding(mesh, P(axis_name, None, None, None)),
    )

    # Per-shard g blocks in *unflipped global z order*; each shard flips
    # locally, and the combine order accounts for the global flip.
    g_unflipped = g[::-1] if flip else g
    if s_pad != s:
        g_unflipped = np.concatenate(
            [g_unflipped, np.full(s_pad - s, -1.0, np.float32)]
        )
    g_blocks = jnp.asarray(
        g_unflipped.reshape(n_shards, s_pad // n_shards)
    )

    from correrender_tpu.ops.pallas.common import on_tpu

    fn = _sharded_render_fn(
        mesh, axis_name, bool(flip), n_shards, hi_res, wi_res, on_tpu()
    )
    inter_rgb, inter_a = fn(
        classified, g_blocks,
        jnp.asarray(coords_v, jnp.float32),
        jnp.asarray(coords_u, jnp.float32),
        jnp.asarray(grid_v), jnp.asarray(grid_u),
        jnp.asarray([e_u, e_v], jnp.float32),
        jnp.asarray(len_factor, jnp.float32),
        jnp.float32(slab_thickness), jnp.float32(attenuation),
    )

    # Final warp on the replicated intermediate (variant selection and
    # all — shared with the dense path).
    from correrender_tpu.render import dvr_fast as df

    return df.warp_to_screen(
        inter_rgb, inter_a, camera, width, height, in_plane, a, eye,
        z_ref, grid_u, grid_v, jnp.asarray(background, jnp.float32),
    )
