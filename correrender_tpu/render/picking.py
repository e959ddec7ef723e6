"""Reference-point picking and marker rendering.

Reference: src/Calculators/PointPicker.*,
ReferencePointSelectionRenderer.* — mouse picking of the correlation
reference point (ray → voxel, with an optional fixed-z-plane mode) and
an auxiliary renderer drawing the reference-point sphere into the view
(driven via VolumeData::renderViewCalculator, VolumeData.cpp:1948).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from correrender_tpu.render.sampling import ray_box_intersect


def pick_voxel(
    camera,
    pixel_xy,
    image_size,
    grid_shape_zyx,
    box,
    fixed_z_fraction: float | None = None,
):
    """Pick the voxel under a pixel.

    Args:
      pixel_xy: (px, py) pixel coordinates (origin top-left).
      grid_shape_zyx: volume dims.
      box: (box_min, box_max) render AABB.
      fixed_z_fraction: if set, intersect the ray with the plane at this
        normalized world-z instead of the box entry face (the
        reference's ``fixPickingZPlane`` mode,
        CorrelationCalculator.hpp:130-133).

    Returns:
      (x, y, z) voxel indices, or None if the ray misses.
    """
    width, height = image_size
    origin, dirs = camera.rays(width, height)
    px, py = int(pixel_xy[0]), int(pixel_xy[1])
    d = np.asarray(dirs)[py, px]
    o = np.asarray(origin)
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)

    if fixed_z_fraction is not None:
        z_plane = box_min[2] + fixed_z_fraction * (box_max[2] - box_min[2])
        if abs(d[2]) < 1e-12:
            return None
        t = (z_plane - o[2]) / d[2]
        if t <= 0:
            return None
        p = o + d * t
        if not (
            box_min[0] <= p[0] <= box_max[0]
            and box_min[1] <= p[1] <= box_max[1]
        ):
            return None
    else:
        t_near, t_far, hit = ray_box_intersect(
            jnp.asarray(o), jnp.asarray(d[None, None]),
            jnp.asarray(box_min), jnp.asarray(box_max),
        )
        if not bool(hit[0, 0]):
            return None
        t = max(float(t_near[0, 0]), 0.0)
        p = o + d * t

    return world_to_voxel(p, grid_shape_zyx, box)


def world_to_voxel(p, grid_shape_zyx, box):
    """World point → voxel index under the cell-center convention the
    marker/renderers use ((idx+0.5)/dims; the reference rounds to node
    coordinates instead, PointPicker.cpp:142-151 — a half-voxel
    convention difference applied consistently on both sides here)."""
    zs, ys, xs = grid_shape_zyx
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)
    tex = (np.asarray(p, np.float32) - box_min) / (box_max - box_min)
    vox = np.floor(tex * np.array([xs, ys, zs])).astype(int)
    vox = np.clip(vox, 0, np.array([xs - 1, ys - 1, zs - 1]))
    return int(vox[0]), int(vox[1]), int(vox[2])


def pick_hit_points(
    camera,
    pixel_xy,
    image_size,
    box,
    fixed_z_fraction: float | None = None,
):
    """Pick-ray hit information for depth scrubbing.

    The reference keeps (firstHit, lastHit, hitLookingDirection,
    focusPoint) from the last successful pick so the scroll wheel can
    scrub the focus point through the volume along the pick ray
    (PointPicker.cpp:88-135). Returns a dict with those four world-
    space entries, or None if the ray misses.

    In fixed-z-plane mode the scrub axis is the world z column through
    the hit (firstHit at the z face nearest the camera, lastHit at the
    far face, direction following the pick ray's z sign —
    PointPicker.cpp:96-100).
    """
    width, height = image_size
    origin, dirs = camera.rays(width, height)
    px = max(0, min(width - 1, int(pixel_xy[0])))
    py = max(0, min(height - 1, int(pixel_xy[1])))
    d = np.asarray(dirs)[py, px].astype(np.float64)
    o = np.asarray(origin, np.float64)
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)

    if fixed_z_fraction is not None:
        z_plane = box_min[2] + fixed_z_fraction * (box_max[2] - box_min[2])
        if abs(d[2]) < 1e-12:
            return None
        t = (z_plane - o[2]) / d[2]
        if t <= 0:
            return None
        p = o + d * t
        if not (
            box_min[0] <= p[0] <= box_max[0]
            and box_min[1] <= p[1] <= box_max[1]
        ):
            return None
        # Scrub along world z following the viewing direction: first is
        # the z face the pick ray crosses first, last the far face, so
        # dot(last - first, direction) spans the full z extent and the
        # scrub_focus clamp stays inside the box for cameras above OR
        # below the volume (sign(d.z), not sign(eye.z) — an eye below
        # z=0 would otherwise invert the clamp and pin the focus to the
        # top face).
        sz = 1.0 if d[2] > 0 else -1.0
        near_z, far_z = (
            (box_min[2], box_max[2]) if sz > 0 else (box_max[2], box_min[2])
        )
        first = np.array([p[0], p[1], near_z], np.float64)
        last = np.array([p[0], p[1], far_z], np.float64)
        direction = np.array([0.0, 0.0, sz], np.float64)
        focus = p
    else:
        t_near, t_far, hit = ray_box_intersect(
            jnp.asarray(o), jnp.asarray(d[None, None], jnp.float32),
            jnp.asarray(box_min), jnp.asarray(box_max),
        )
        if not bool(hit[0, 0]):
            return None
        t0 = max(float(t_near[0, 0]), 0.0)
        t1 = float(t_far[0, 0])
        first = o + d * t0
        last = o + d * t1
        norm = np.linalg.norm(d)
        direction = d / (norm if norm > 0 else 1.0)
        focus = first
    return {
        "first": first,
        "last": last,
        "direction": direction,
        "focus": focus,
    }


def scrub_focus(hit: dict, amount: float) -> dict:
    """Move the focus point ``amount`` world units along the pick ray,
    clamped between firstHit and lastHit (the reference's scroll
    handling, PointPicker.cpp:128-134). Returns the updated hit dict
    (same object, mutated)."""
    first = np.asarray(hit["first"], np.float64)
    last = np.asarray(hit["last"], np.float64)
    direction = np.asarray(hit["direction"], np.float64)
    new_focus = np.asarray(hit["focus"], np.float64) + amount * direction
    t = float(np.dot(new_focus - first, direction))
    t = min(max(t, 0.0), float(np.linalg.norm(last - first)))
    hit["focus"] = first + t * direction
    return hit


def marker_screen_center(camera, reference_point_xyz, grid_shape_zyx,
                         box, image_size):
    """Project a reference voxel to screen pixel ``(cx, cy)``; None if
    it is behind the camera."""
    width, height = image_size
    zs, ys, xs = grid_shape_zyx
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)
    x, y, z = reference_point_xyz
    world = box_min + (np.array([x + 0.5, y + 0.5, z + 0.5])
                       / np.array([xs, ys, zs])) * (box_max - box_min)

    view = camera.view_matrix()
    proj = camera.projection_matrix(width / height)
    clip = proj @ (view @ np.append(world, 1.0))
    if clip[3] <= 0:
        return None
    ndc = clip[:3] / clip[3]
    cx = (ndc[0] * 0.5 + 0.5) * width
    cy = (0.5 - ndc[1] * 0.5) * height
    return float(cx), float(cy)


def overlay_reference_point_marker_np(
    arr: np.ndarray,
    camera,
    reference_point_xyz,
    grid_shape_zyx,
    box,
    color=(1.0, 0.1, 0.1, 1.0),
    radius_px: float = 6.0,
):
    """In-place numpy marker overlay on a host float RGBA image — the
    interactive viewer's fast path (the device variant below costs a
    dispatch chain per frame over a tunneled chip; the marker is a
    ~15px disc, pure host math)."""
    h, w = arr.shape[:2]
    center = marker_screen_center(
        camera, reference_point_xyz, grid_shape_zyx, box, (w, h))
    if center is None:
        return arr
    cx, cy = center
    r = radius_px + 3.0
    x0 = int(max(0, np.floor(cx - r)))
    x1 = int(min(w, np.ceil(cx + r)))
    y0 = int(max(0, np.floor(cy - r)))
    y1 = int(min(h, np.ceil(cy + r)))
    if x0 >= x1 or y0 >= y1:
        return arr
    gx, gy = np.meshgrid(np.arange(x0, x1, dtype=np.float32) + 0.5,
                         np.arange(y0, y1, dtype=np.float32) + 0.5)
    dist = np.hypot(gx - cx, gy - cy)
    disc = np.clip(radius_px + 0.5 - dist, 0.0, 1.0)
    rim = np.clip(radius_px + 2.5 - dist, 0.0, 1.0) - disc
    col = np.asarray(color, np.float32)
    a = (disc * col[3] + rim * 0.5)[..., None]
    win = arr[y0:y1, x0:x1]
    win[..., :3] = disc[..., None] * col[:3] + (1 - a) * win[..., :3]
    win[..., 3] = np.maximum(a[..., 0], win[..., 3])
    return arr


def render_reference_point_marker(
    camera,
    reference_point_xyz,
    grid_shape_zyx,
    box,
    image_size=(512, 512),
    color=(1.0, 0.1, 0.1, 1.0),
    radius_px: float = 6.0,
    base_image=None,
):
    """Draw the reference-point sphere marker over a view
    (ReferencePointSelectionRenderer analogue, screen-space disc with a
    shadow rim like ShadowCircleRasterPass)."""
    width, height = image_size
    center = marker_screen_center(
        camera, reference_point_xyz, grid_shape_zyx, box, image_size)
    if center is None:
        return (
            base_image
            if base_image is not None
            else jnp.zeros((height, width, 4), jnp.float32)
        )
    cx, cy = center

    gx, gy = jnp.meshgrid(
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        jnp.arange(height, dtype=jnp.float32) + 0.5,
    )
    dist = jnp.sqrt((gx - cx) ** 2 + (gy - cy) ** 2)
    disc = jnp.clip(radius_px + 0.5 - dist, 0.0, 1.0)
    rim = jnp.clip(radius_px + 2.5 - dist, 0.0, 1.0) - disc  # shadow ring
    col = jnp.asarray(color, jnp.float32)
    if base_image is None:
        base_image = jnp.zeros((height, width, 4), jnp.float32)
    a = (disc * col[3] + rim * 0.5)[..., None]
    rgb = disc[..., None] * col[:3]  # rim stays black (shadow)
    out_rgb = rgb + (1 - a) * base_image[..., :3]
    out_a = jnp.maximum(a[..., 0], base_image[..., 3])
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)
