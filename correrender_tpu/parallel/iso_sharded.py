"""Multi-chip shear-warp isosurface rendering: volume Z-sharded.

New TPU-native design (the reference is single-GPU). "First hit along
the ray" is an associative fold like OVER, so it factors across the
mesh the same way parallel/dvr_sharded.py factors compositing:

* each shard runs the first-hit scan (render/iso_fast.py) over its own
  slab of slices, prefixed with a ONE-SLICE HALO from its near-side
  neighbour (``lax.ppermute``) so iso-crossings that span the shard
  boundary are still detected by exactly one shard;
* per-shard (found, gradient) intermediate images cross the ICI with
  one ``all_gather``; the combine picks, per ray, the nearest shard
  (near→far static unroll) that found a hit — the "first-found"
  monoid;
* Blinn–Phong shading + the homography warp run replicated via
  ``render.iso_fast.shade_and_warp``.

X/Y-principal cameras re-shard the 4-channel (value, gradient) volume
over their scan axis with one all-to-all, like parallel/dvr_sharded.py;
only uneven shard counts fall back to a gathered render.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from correrender_tpu.render.camera import default_render_box
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from correrender_tpu.render.dvr_fast import (
    _principal_axis,
    shearwarp_viable,
)
from correrender_tpu.render.iso_fast import (
    _axial_interleave,
    _first_hit_scan,
    _gradient_volume,
    iso_shearwarp,
    shade_and_warp,
)


def _interleave_g(g, m):
    """m× supersample a per-slice g sequence (affine in the slice
    coordinate → exact lerp) — sub-slabs adjacent to an INVALID slice
    (g ≤ 0: missing first-shard halo, divisibility padding) get
    g = −1 so the scan's inside-gate rejects them, matching the dense
    path's no-predecessor boundary semantics."""
    base, nxt = g[:-1], g[1:]
    valid = (base > 0.0) & (nxt > 0.0)
    # j = 0 is the original slice (its own validity); j ≥ 1 are true
    # midpoints and need BOTH bracketing slices valid.
    subs = [base] + [
        jnp.where(valid, (1.0 - j / m) * base + (j / m) * nxt, -1.0)
        for j in range(1, m)
    ]
    body = jnp.stack(subs, axis=1).reshape(-1)
    return jnp.concatenate([body, g[-1:]])


def iso_shearwarp_sharded(
    volume: jnp.ndarray,
    camera,
    iso_value: float,
    mesh: Mesh,
    surface_color=(0.9, 0.4, 0.2, 1.0),
    image_size=(1920, 1080),
    box=None,
    background=(0.0, 0.0, 0.0, 1.0),
    intermediate_scale: float = 1.0,
    axis_name: str = "space",
    axial_supersample: int = 1,
) -> jnp.ndarray:
    """Render a Z-sharded volume's isosurface distributedly.

    ``axial_supersample`` matches the dense path's exact trilinear
    sub-slabs (render/iso_fast.py): each shard interleaves AFTER the
    halo exchange, so cross-shard midpoints use the true neighbour
    slice and output equals the dense supersampled render."""
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
    world_to_arr = {2: 0, 1: 1, 0: 2}
    perm = (world_to_arr[a], world_to_arr[in_plane[1]],
            world_to_arr[in_plane[0]])
    n_shards = mesh.shape[axis_name]
    dims_zyx = (zs, ys, xs)
    s = dims_zyx[perm[0]]
    if not shearwarp_viable(camera, box):
        gathered = jax.device_put(
            volume, NamedSharding(mesh, P(None, None, None))
        )
        return iso_shearwarp(
            gathered, camera, iso_value, surface_color=surface_color,
            image_size=image_size, box=box, background=background,
            intermediate_scale=intermediate_scale,
            axial_supersample=axial_supersample,
        )

    nv, nu = dims_zyx[perm[1]], dims_zyx[perm[2]]
    flip = bool(forward[a] < 0)
    # Non-divisible scan extents pad with inert slices (g = -1: the
    # first-hit inside-gate rejects either pair member with g ≤ 0,
    # which matches the dense path's no-predecessor boundary) instead
    # of replicating the whole volume per device (see dvr_sharded).
    s_pad = -(-s // n_shards) * n_shards
    s_loc = s_pad // n_shards

    from correrender_tpu.render.dvr_fast import shearwarp_geometry

    geo = shearwarp_geometry(
        camera, box_min, box_max, a, in_plane, flip, s, nv, nu,
        image_size, intermediate_scale,
    )
    coords_v, coords_u = geo["coords_v"], geo["coords_u"]
    g, z_ref, e_u, e_v = (geo["g"].astype(np.float32), geo["z_ref"],
                          geo["e_u"], geo["e_v"])
    grid_u, grid_v = geo["grid_u"], geo["grid_v"]
    hi_res, wi_res = geo["hi_res"], geo["wi_res"]
    width, height = image_size

    # Gradient on the sharded volume with plain ops — GSPMD inserts the
    # halo exchange for the rolls automatically. Non-divisible zs pads
    # with WRAP rows: the padded array's rolls then produce exactly
    # the dense jnp.roll values at the real boundary, and the pad rows
    # are discarded by [:zs].
    z_pad = -(-zs // n_shards) * n_shards
    vol_in = volume
    if z_pad != zs:
        vol_in = jnp.pad(volume, ((0, z_pad - zs), (0, 0), (0, 0)),
                         mode="wrap")
    vol_sharding = NamedSharding(mesh, P(axis_name, None, None))
    vol_in = jax.device_put(vol_in, vol_sharding)
    grad = _gradient_volume(vol_in, box_min, box_max,
                            n_real_z=zs if z_pad != zs else None)
    cvol = jnp.concatenate([vol_in[..., None], grad], axis=-1)[:zs]
    # Re-layout to (slice, v, u, 4) sharded along the scan axis (one
    # all-to-all when the camera is not Z-principal).
    cvol = jnp.transpose(cvol, perm + (3,))
    if s_pad != s:
        cvol = jnp.pad(cvol, ((0, s_pad - s), (0, 0), (0, 0), (0, 0)))
    cvol = jax.device_put(
        cvol,
        NamedSharding(mesh, P(axis_name, None, None, None)),
    )

    # Per-shard g blocks in unflipped global z order (like dvr_sharded).
    g_unflipped = g[::-1] if flip else g
    if s_pad != s:
        g_unflipped = np.concatenate(
            [g_unflipped, np.full(s_pad - s, -1.0, np.float32)]
        )
    g_blocks = jnp.asarray(g_unflipped.reshape(n_shards, s_loc))

    fn = _sharded_first_hit_fn(mesh, axis_name, flip, n_shards,
                               hi_res, wi_res,
                               int(axial_supersample))
    found, grad_hit = fn(
        cvol, g_blocks,
        jnp.asarray(coords_v, jnp.float32),
        jnp.asarray(coords_u, jnp.float32),
        jnp.asarray(grid_v), jnp.asarray(grid_u),
        jnp.asarray([e_u, e_v], jnp.float32),
        jnp.float32(iso_value),
    )

    return shade_and_warp(
        found, grad_hit, camera, grid_u, grid_v, in_plane, a, eye,
        z_ref, surface_color, background, width, height,
    )

@functools.lru_cache(maxsize=32)
def _sharded_first_hit_fn(mesh: Mesh, axis_name: str, flip: bool,
                          n_shards: int, hi_res: int, wi_res: int,
                          axial_supersample: int = 1):
    """Build + jit the per-shard first-hit program once per static
    signature — camera geometry enters as ARRAYS so frames reuse the
    compiled executable (a fresh un-jitted shard_map closure per call
    retraced + recompiled every frame; dvr_sharded.py measured the
    identical trap at ~20 s/frame in round 1)."""

    def local_first_hit(cvol_blk, g_blk, coords_v, coords_u, grid_v,
                        grid_u, euv, iso_value):
        cvol_loc = cvol_blk  # (s_loc, Y, X, 4), global (unflipped) order
        g_loc = g_blk[0]
        if flip:
            cvol_loc = jnp.flip(cvol_loc, axis=0)
            g_loc = jnp.flip(g_loc, axis=0)
        # One-slice near-side halo: in near→far order, shard p's
        # predecessor slice is the last in-order slice of the previous
        # shard. ppermute leaves the first in-order shard's halo as
        # zeros (g = 0 ⇒ the scan's inside-gate rejects it).
        perm = (
            [(i, i - 1) for i in range(1, n_shards)]
            if flip
            else [(i, i + 1) for i in range(n_shards - 1)]
        )
        halo_slice = jax.lax.ppermute(
            cvol_loc[-1:], axis_name, perm
        )
        halo_g = jax.lax.ppermute(g_loc[-1:], axis_name, perm)
        cvol_h = jnp.concatenate([halo_slice, cvol_loc], axis=0)
        g_h = jnp.concatenate([halo_g, g_loc], axis=0)
        if axial_supersample > 1:
            # Interleave AFTER the halo so cross-shard midpoints use
            # the true neighbour slice; the missing first-shard halo
            # (g = 0) invalidates its midpoints via _interleave_g.
            cvol_h = _axial_interleave(cvol_h, axial_supersample)
            g_h = _interleave_g(g_h, axial_supersample)
        found, depth, grad_hit = _first_hit_scan(
            cvol_h, g_h, coords_v, coords_u, grid_v, grid_u, euv,
            iso_value, hi_res, wi_res,
        )
        del depth  # the combine is ordered; no global depth needed
        founds = jax.lax.all_gather(found, axis_name)  # (N, hi, wi)
        grads = jax.lax.all_gather(grad_hit, axis_name)
        order = range(n_shards - 1, -1, -1) if flip else range(n_shards)
        acc_found = jnp.zeros_like(found)
        acc_grad = jnp.zeros_like(grad_hit)
        for i in order:  # static unroll, near→far: first found wins
            take = founds[i] & ~acc_found
            acc_grad = jnp.where(take[..., None], grads[i], acc_grad)
            acc_found = acc_found | founds[i]
        return acc_found, acc_grad

    return jax.jit(shard_map(
        local_first_hit,
        mesh=mesh,
        in_specs=(P(axis_name, None, None, None), P(axis_name, None),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(None, None), P(None, None, None)),
        check_vma=False,
    ))
