"""Slice renderer: transfer-function-mapped planes through the volume.

Reference: src/Renderers/SliceRenderer.* + Slice.glsl — an axis-aligned
or OBLIQUE textured plane (settings ``normal_x/y/z`` + ``plane_dist``,
SliceRenderer.cpp:360-368), optional Blinn-Phong shading blended by
``lighting_factor`` (Slice.glsl:88), NaN handling {ignore, yellow}, and
``fix_on_ground`` (plane drawn at the domain floor while sampling at
its true position, Slice.glsl vertex stage). Two modes here:

* :func:`slice_image` — direct 2D extraction of an axis-aligned slice
  (the common headless use);
* :func:`slice_render_3d` — the plane embedded in the 3D scene via a
  one-step ray/plane intersection, composited over a background image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from correrender_tpu.render.camera import default_render_box
from correrender_tpu.render.sampling import sample_trilinear

_AXES = {"x": 0, "y": 1, "z": 2}


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "return_depth", "nan_yellow", "fix_on_ground",
    ),
)
def _slice3d_core(
    volume, inv_view, inv_proj, box_min, box_max, nrm, plane_d,
    lighting_factor, lut, domain, background,
    width, height, return_depth, nan_yellow, fix_on_ground,
):
    """Whole slice frame as ONE compiled program (rays → plane hit →
    trilinear sample → LUT → composite): eagerly this was ~40 small
    dispatches, and per-dispatch overhead on the tunneled device made
    a trivial slice frame cost 5× a full DVR frame (round-3 perf
    sweep, 357 ms vs 72 ms at 640×480)."""
    from correrender_tpu.render.camera import _rays_core

    origin, directions = _rays_core(inv_view, inv_proj, width, height)

    def _guard(x):
        return jnp.where(jnp.abs(x) < 1e-9, 1e-9, x)

    if fix_on_ground:
        # Geometry drawn at the domain floor z = zmin (Slice.glsl
        # vertex stage projects positionOut.z), texture sampled at the
        # plane's TRUE position above the same (x, y).
        t = (box_min[2] - origin[2]) / _guard(directions[..., 2])
        pg = origin + directions * t[..., None]
        z_true = (
            plane_d - nrm[0] * pg[..., 0] - nrm[1] * pg[..., 1]
        ) / _guard(nrm[2])
        p = jnp.stack([pg[..., 0], pg[..., 1], z_true], axis=-1)
    else:
        denom = (
            directions[..., 0] * nrm[0]
            + directions[..., 1] * nrm[1]
            + directions[..., 2] * nrm[2]
        )
        t = (
            plane_d
            - (origin[0] * nrm[0] + origin[1] * nrm[1]
               + origin[2] * nrm[2])
        ) / _guard(denom)
        p = origin + directions * t[..., None]
    tex = (p - box_min) / (box_max - box_min)
    in_bounds = (
        (t > 0)
        & jnp.all(tex >= 0.0, axis=-1)
        & jnp.all(tex <= 1.0, axis=-1)
    )
    scalars = sample_trilinear(volume, tex)
    vmin, vmax = domain[0], domain[1]
    res = lut.shape[0]
    tt = jnp.clip((scalars - vmin) / (vmax - vmin), 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(tt).astype(jnp.int32), 0, res - 2)
    frac = (tt - i0.astype(jnp.float32))[..., None]
    rgba = lut[i0] * (1.0 - frac) + lut[i0 + 1] * frac
    nan_mask = jnp.isnan(scalars)[..., None]
    if nan_yellow:
        # NaNHandling::NAN_YELLOW (Renderer.hpp NAN_HANDLING_IDS):
        # same convention as the DVR marcher's yellow mode.
        rgba = jnp.where(
            nan_mask, jnp.asarray([1.0, 1.0, 0.0, 1.0], rgba.dtype), rgba
        )
    else:
        rgba = jnp.where(nan_mask, jnp.zeros_like(rgba), rgba)

    # Blinn-Phong surface shading with the PLANE normal, blended by
    # lighting_factor (Slice.glsl:86-88 `mix(volumeColor, color,
    # lightingFactor)`; constants from the reference Lighting.glsl —
    # same ones the iso ray-caster uses). Headlight: light == view.
    view = -directions
    ndv = (
        view[..., 0] * nrm[0] + view[..., 1] * nrm[1]
        + view[..., 2] * nrm[2]
    )
    # |n·view| for a two-sided plane; with light == view the half
    # vector is the view vector, so diffuse and specular share it.
    diffuse = 0.7 * jnp.abs(ndv)
    spec = 0.1 * jnp.abs(ndv) ** 32
    intensity = (0.2 + diffuse + spec)[..., None]
    shaded = rgba[..., :3] * intensity
    rgb_plane = (
        rgba[..., :3] * (1.0 - lighting_factor)
        + shaded * lighting_factor
    )

    bg = jnp.broadcast_to(background, rgba.shape)
    mask = (in_bounds.astype(jnp.float32) * rgba[..., 3])[..., None]
    rgb = mask * rgb_plane + (1 - mask) * bg[..., :3]
    alpha = jnp.maximum(mask[..., 0], bg[..., 3])
    img = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    if return_depth:
        depth = jnp.where(in_bounds & (rgba[..., 3] > 0.0), t, jnp.inf)
        return img, depth
    return img


def slice_image(
    volume: jnp.ndarray,
    transfer_function,
    axis: str = "z",
    position: float = 0.5,
    resolution=None,
) -> jnp.ndarray:
    """Extract an axis-aligned slice, TF-mapped to RGBA.

    Args:
      volume: ``(Z, Y, X)``.
      axis: "x", "y" or "z" (slice normal).
      position: normalized [0, 1] position along the axis.
      resolution: optional (W, H) of the output; defaults to grid dims.
    """
    a = _AXES[axis]
    zs, ys, xs = volume.shape
    plane_dims = {
        0: (ys, zs),  # x-normal: (y, z) plane
        1: (xs, zs),
        2: (xs, ys),
    }[a]
    w, h = resolution or plane_dims
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    v = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    gu, gv = jnp.meshgrid(u, v)
    p = jnp.full_like(gu, position)
    if a == 0:
        coords = jnp.stack([p, gu, gv], axis=-1)
    elif a == 1:
        coords = jnp.stack([gu, p, gv], axis=-1)
    else:
        coords = jnp.stack([gu, gv, p], axis=-1)
    scalars = sample_trilinear(volume, coords)
    return transfer_function(scalars)


def slice_render_3d(
    volume: jnp.ndarray,
    camera,
    transfer_function,
    axis: str = "z",
    position: float = 0.5,
    normal=None,
    plane_dist: float | None = None,
    lighting_factor: float = 0.0,
    nan_handling: str = "ignore",
    fix_on_ground: bool = False,
    image_size=(512, 512),
    box=None,
    background=(0.0, 0.0, 0.0, 1.0),
    return_depth: bool = False,
) -> jnp.ndarray:
    """Render the slice plane into a 3D view (single intersection).

    The plane is either axis-aligned (``axis`` + normalized
    ``position``) or OBLIQUE: pass ``normal=(nx, ny, nz)`` — the
    reference's ``normal_x/y/z`` settings — with the plane defined by
    ``dot(p, n) == plane_dist`` in world coordinates
    (SliceRenderer.hpp:75-77). When ``plane_dist`` is omitted,
    ``position`` interpolates the plane across the box's extent along
    ``normal``. ``lighting_factor`` blends Blinn-Phong plane shading
    over the flat TF color (Slice.glsl:88; reference default 0.5 —
    kept at 0.0 here so headless renders stay flat unless asked).
    ``nan_handling``: "ignore" (transparent) or "yellow".
    ``fix_on_ground`` draws the plane at the domain floor while
    sampling at its true position (SliceRenderer.hpp:79).

    With ``return_depth`` also returns the (H, W) eye distance of the
    plane where it is visibly hit (+inf elsewhere) — for the shared
    per-view depth buffer (reference SceneData.hpp)."""
    zs, ys, xs = volume.shape
    if box is None:
        box = default_render_box((zs, ys, xs))
    bmin = np.asarray(box[0], np.float32)
    bmax = np.asarray(box[1], np.float32)
    if normal is not None:
        n = np.asarray(normal, np.float32)
        nn = float(np.linalg.norm(n))
        if nn < 1e-12:
            raise ValueError("slice normal must be non-zero")
        n = n / nn
        if plane_dist is None:
            # position ∈ [0,1] sweeps the plane across the box along n:
            # project the 8 corners onto n and interpolate.
            corners = np.array(
                [[bx, by, bz]
                 for bx in (bmin[0], bmax[0])
                 for by in (bmin[1], bmax[1])
                 for bz in (bmin[2], bmax[2])], np.float32,
            )
            proj = corners @ n
            d = float(proj.min() + position * (proj.max() - proj.min()))
        else:
            d = float(plane_dist)
    else:
        a = _AXES[axis]
        n = np.zeros(3, np.float32)
        n[a] = 1.0
        d = float(bmin[a] + position * (bmax[a] - bmin[a]))
    if fix_on_ground and abs(float(n[2])) < 1e-6:
        raise ValueError(
            "fix_on_ground needs a plane with a z component "
            "(a vertical plane has no single ground footprint)"
        )
    if nan_handling not in ("ignore", "yellow"):
        raise ValueError(
            f"nan_handling must be 'ignore' or 'yellow', "
            f"got {nan_handling!r}"
        )
    width, height = image_size
    return _slice3d_core(
        volume,
        jnp.asarray(camera.inverse_view_matrix()),
        jnp.asarray(camera.inverse_projection_matrix(width / height)),
        jnp.asarray(bmin), jnp.asarray(bmax),
        jnp.asarray(n), jnp.float32(d),
        jnp.float32(lighting_factor),
        transfer_function.lut,
        jnp.asarray(transfer_function.domain, jnp.float32),
        jnp.asarray(background, jnp.float32),
        width, height, return_depth,
        nan_handling == "yellow", bool(fix_on_ground),
    )
