"""Matmul-based isosurface rendering: shear-warp first-hit.

The gather-bound iso raycaster (render/iso.py) is exact but slow on
TPU for the same reason as the DVR marcher. This renderer reuses the
shear-warp machinery: the volume's value + world-space gradient are
packed as a 4-channel volume, slices are resampled onto the
intermediate grid with tent-weight matmuls, and the scan tracks the
*first* iso-crossing per intermediate ray ("first hit" is an
associative fold like OVER). The crossing is refined by linear
interpolation between slices (the value is piecewise-linear along the
ray anyway), the surface normal comes from the interpolated gradient,
Blinn-Phong shading matches render/iso.py, and the homography warp
maps to the screen.

Boundary semantics: like the exact marcher's default, surfaces are
OPEN at the box boundary — the resampling clamps to edge and the scan
only fires on crossings between in-box samples, so no box-face caps
are generated. Users needing the reference's "closed surface" option
use render/iso.py with closed_surface=True.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from correrender_tpu.render.camera import default_render_box

from correrender_tpu.render import dvr_fast as df

_EPS = 1e-6


def _gradient_volume(volume: jnp.ndarray, box_min, box_max,
                     n_real_z: int | None = None):
    """Central-difference gradient in world units, (Z, Y, X, 3) xyz.

    ``n_real_z``: when the z axis carries shard-divisibility padding
    (iso_sharded), the REAL extent — spacing and the one-sided
    boundary rows then match the dense unpadded computation exactly on
    rows [0, n_real_z); pad-row gradients are garbage by contract
    (the caller discards them).
    """
    zs, ys, xs = volume.shape
    zs_eff = zs if n_real_z is None else n_real_z
    ext = np.asarray(box_max) - np.asarray(box_min)
    spacing = np.array([ext[0] / xs, ext[1] / ys, ext[2] / zs_eff])

    def diff(axis, h):
        upper = jnp.roll(volume, -1, axis)
        lower = jnp.roll(volume, 1, axis)
        g = (upper - lower) / (2.0 * h)
        # One-sided at the boundary slices.
        n = volume.shape[axis] if axis != 0 else zs_eff
        idx = jnp.arange(volume.shape[axis]).reshape(
            [-1 if a == axis else 1 for a in range(3)]
        )
        fwd = (upper - volume) / h
        bwd = (volume - lower) / h
        g = jnp.where(idx == 0, fwd, g)
        return jnp.where(idx == n - 1, bwd, g)

    gx = diff(2, spacing[0])
    gy = diff(1, spacing[1])
    gz = diff(0, spacing[2])
    return jnp.stack([gx, gy, gz], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "hi", "wi", "ip0", "ip1", "ax", "refine"))
def _first_hit_scan(
    cvol,  # (S, Yv, Xv, 4): [value, gx, gy, gz], near→far
    g,  # (S,)
    axis_coords_y,
    axis_coords_x,
    grid_v,
    grid_u,
    eye_uv,
    iso_value,
    hi: int,
    wi: int,
    ip0: int = 0,
    ip1: int = 1,
    ax: int = 2,
    ds=0.0,
    refine: int = 0,
):
    """First iso-crossing per intermediate ray.

    ``refine > 0`` enables Hermite sub-slab refinement (VERDICT r3 #3,
    the shear-warp analogue of IsoSurfaceRayCasting.glsl:119's hit
    refinement): the value along the ray between two slice planes is
    reconstructed as a cubic Hermite from the endpoint values AND the
    endpoint directional derivatives (the world-space gradients are
    already resident in the scan), evaluated at ``refine`` interior
    points. That both refines the crossing position (cubic vs linear)
    and DETECTS crossings the endpoint sign test misses — thin
    features whose entry+exit lie between consecutive planes, the
    dominant term in the fast-vs-exact gap. Pure VPU work on carries;
    no extra HBM traffic. ``ip0/ip1/ax`` are the world axes of the
    intermediate u, v, and slice directions; ``ds`` the signed world
    step between slices.
    """
    s, yv, xv, _ = cvol.shape
    dy = axis_coords_y[1] - axis_coords_y[0] if yv > 1 else 1.0
    dx = axis_coords_x[1] - axis_coords_x[0] if xv > 1 else 1.0

    y0, y1 = axis_coords_y[0], axis_coords_y[-1]
    x0, x1 = axis_coords_x[0], axis_coords_x[-1]

    def first_crossing(samples, ts):
        """First sign change over consecutive sample pairs →
        (crossing?, frac in [0, 1])."""
        crossing = jnp.zeros(samples[0].shape, bool)
        frac = jnp.zeros(samples[0].shape, jnp.float32)
        for j in range(len(samples) - 1):
            sj, sk = samples[j], samples[j + 1]
            cj = (sj * sk <= 0.0) & (jnp.abs(sj) + jnp.abs(sk) > 0.0)
            sub = sj / jnp.where(jnp.abs(sj - sk) < _EPS, _EPS, sj - sk)
            fj = ts[j] + (ts[j + 1] - ts[j]) * jnp.clip(sub, 0.0, 1.0)
            take = cj & ~crossing
            frac = jnp.where(take, fj, frac)
            crossing = crossing | cj
        return crossing, frac

    def step(carry, inputs):
        (found, depth, grad, prev_val, prev_grad, prev_in, prev_gk,
         k) = carry
        slice_c, gk = inputs
        qv = eye_uv[1] + (grid_v - eye_uv[1]) * gk
        qu = eye_uv[0] + (grid_u - eye_uv[0]) * gk
        # Clamp-to-edge sampling (the marcher's texture semantics) with
        # an explicit in-box mask so crossings only count inside.
        in_v = (qv >= y0) & (qv <= y1)
        in_u = (qu >= x0) & (qu <= x1)
        qvc = jnp.clip(qv, y0, y1)
        quc = jnp.clip(qu, x0, x1)
        wv = jnp.maximum(
            1.0 - jnp.abs(qvc[:, None] - axis_coords_y[None, :]) / dy, 0.0
        ).astype(jnp.bfloat16)
        wu = jnp.maximum(
            1.0 - jnp.abs(quc[:, None] - axis_coords_x[None, :]) / dx, 0.0
        ).astype(jnp.bfloat16)
        slab = jnp.einsum(
            "iy,yxc->ixc", wv, slice_c.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        slab = jnp.einsum(
            "ixc,jx->ijc", slab, wu, preferred_element_type=jnp.float32
        )  # (hi, wi, 4)
        cur = slab[..., 0] - iso_value
        # bf16 gradient carries: 6 of the 10 carry channels at half
        # the HBM traffic (+ unroll=4 below) — measured 61.9 → 59 ms
        # per 1080p frame at 250³; shading normalizes the normals, so
        # bf16 precision is invisible there.
        cur_grad = slab[..., 1:].astype(jnp.bfloat16)
        inside = in_v[:, None] & in_u[None, :] & (gk > _EPS)
        if refine > 0:
            # Ray displacement from plane k−1 to k, world space.
            dgk = gk - prev_gk
            du = (grid_u[None, :] - eye_uv[0]) * dgk
            dv = (grid_v[:, None] - eye_uv[1]) * dgk
            pg = prev_grad.astype(jnp.float32)
            cg = cur_grad.astype(jnp.float32)
            d0 = pg[..., ip0] * du + pg[..., ip1] * dv + pg[..., ax] * ds
            d1 = cg[..., ip0] * du + cg[..., ip1] * dv + cg[..., ax] * ds
            samples, ts = [prev_val], [0.0]
            for j in range(1, refine + 1):
                t = j / (refine + 1.0)
                h00 = (1 + 2 * t) * (1 - t) ** 2
                h10 = t * (1 - t) ** 2
                h01 = t * t * (3 - 2 * t)
                h11 = t * t * (t - 1)
                samples.append(h00 * prev_val + h10 * d0
                               + h01 * cur + h11 * d1)
                ts.append(t)
            samples.append(cur)
            ts.append(1.0)
            crossed, frac = first_crossing(samples, ts)
        else:
            crossed, frac = first_crossing([prev_val, cur], [0.0, 1.0])
        crossing = crossed & (k > 0) & inside & prev_in
        newly = crossing & ~found
        hit_depth = (k - 1).astype(jnp.float32) + frac
        depth = jnp.where(newly, hit_depth, depth)
        lerped = (
            prev_grad.astype(jnp.float32) * (1.0 - frac)[..., None]
            + cur_grad.astype(jnp.float32) * frac[..., None]
        )
        grad = jnp.where(newly[..., None], lerped.astype(jnp.bfloat16),
                         grad)
        found = found | newly
        return (found, depth, grad, cur, cur_grad, inside, gk,
                k + 1), None

    init = (
        jnp.zeros((hi, wi), bool),
        jnp.zeros((hi, wi), jnp.float32),
        jnp.zeros((hi, wi, 3), jnp.bfloat16),
        jnp.zeros((hi, wi), jnp.float32),
        jnp.zeros((hi, wi, 3), jnp.bfloat16),
        jnp.zeros((hi, wi), bool),
        jnp.float32(0.0),
        jnp.int32(0),
    )
    (found, depth, grad, _, _, _, _, _), _ = jax.lax.scan(
        step, init, (cvol, g), unroll=4
    )
    return found, depth, grad.astype(jnp.float32)


def _axial_interleave(cvol: jnp.ndarray, m: int) -> jnp.ndarray:
    """m× axial supersampling with EXACT trilinear sub-slabs: the
    field at a fractional slice position is the lerp of the bracketing
    planes at the same (u, v)."""
    base, nxt = cvol[:-1], cvol[1:]
    subs = [(1.0 - j / m) * base + (j / m) * nxt for j in range(m)]
    body = jnp.stack(subs, axis=1).reshape((-1,) + cvol.shape[1:])
    return jnp.concatenate([body, cvol[-1:]], axis=0)


def prepare_iso_shearwarp(
    volume: jnp.ndarray, camera, box=None, axial_supersample: int = 1
) -> dict:
    """Resident first-hit volume: value + world-space gradient in
    (slice, v, u, 4) near→far order (axially interleaved when
    ``axial_supersample > 1`` so the per-frame scan pays no interleave
    cost).

    The gradient alone streams ~9 volume passes through HBM; in
    steady-state interactive use it only changes with the field or
    when the camera crosses an axis/order boundary. Pass to
    :func:`iso_shearwarp` via ``prepared=`` (keyed like
    dvr_fast.prepare_shearwarp, rebuilt automatically on mismatch).
    """
    zs, ys, xs = volume.shape
    if box is None:
        box = default_render_box((zs, ys, xs))
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)
    eye = np.asarray(camera.position, np.float32)
    forward = np.asarray(camera.look_at_point, np.float32) - eye
    forward /= np.linalg.norm(forward)
    a = df._principal_axis(forward)
    in_plane = [i for i in range(3) if i != a]
    flip = bool(forward[a] < 0)
    grad = _gradient_volume(volume, box_min, box_max)
    cvol = jnp.concatenate([volume[..., None], grad], axis=-1)
    world_to_arr = {2: 0, 1: 1, 0: 2}
    cvol = jnp.transpose(
        cvol,
        (world_to_arr[a], world_to_arr[in_plane[1]],
         world_to_arr[in_plane[0]], 3),
    )
    if flip:
        cvol = cvol[::-1]
    m = int(axial_supersample)
    n_base = cvol.shape[0]
    if m > 1 and n_base > 1:
        cvol = _axial_interleave(cvol, m)
    return {"key": (a, flip, m), "cvol": cvol, "n_base": n_base}


def iso_shearwarp(
    volume: jnp.ndarray,
    camera,
    iso_value: float,
    surface_color=(0.9, 0.4, 0.2, 1.0),
    image_size=(1920, 1080),
    box=None,
    background=(0.0, 0.0, 0.0, 1.0),
    intermediate_scale: float = 1.0,
    prepared: dict | None = None,
    return_depth: bool = False,
    refine: int = 0,
    axial_supersample: int = 1,
) -> jnp.ndarray:
    """Fast isosurface rendering (see module docstring).

    With ``return_depth`` also returns the (H, W) screen-space eye
    distance of the first hit (+inf where none): the fractional
    hit-slice index is converted to a world distance on the
    intermediate grid (depth is linear in the slice coordinate along
    each ray) and warped through the same homography as the color."""
    zs, ys, xs = volume.shape
    if box is None:
        box = default_render_box((zs, ys, xs))
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)

    eye = np.asarray(camera.position, np.float32)
    forward = np.asarray(camera.look_at_point, np.float32) - eye
    forward /= np.linalg.norm(forward)
    a = df._principal_axis(forward)
    in_plane = [i for i in range(3) if i != a]
    flip = bool(forward[a] < 0)
    # Eye inside/past the slab: behind-eye slices flip the projection
    # sign (see dvr_fast.dvr_shearwarp) — use the exact raycaster.
    if (eye[a] >= box_min[a]) if not flip else (eye[a] <= box_max[a]):
        from correrender_tpu.render.iso import iso_render

        return iso_render(
            volume, camera, iso_value, surface_color=surface_color,
            image_size=image_size, box=box, background=background,
            return_depth=return_depth,
        )

    m = int(axial_supersample)
    if prepared is not None and prepared["key"] != (a, flip, m):
        prepared = None  # camera crossed an axis/order boundary
    if prepared is not None:
        cvol = prepared["cvol"]  # already (slice, v, u, 4), near→far
        n_base = prepared["n_base"]
    else:
        grad = _gradient_volume(volume, box_min, box_max)
        cvol = jnp.concatenate([volume[..., None], grad], axis=-1)

        world_to_arr = {2: 0, 1: 1, 0: 2}
        cvol = jnp.transpose(
            cvol,
            (world_to_arr[a], world_to_arr[in_plane[1]],
             world_to_arr[in_plane[0]], 3),
        )
        if flip:
            cvol = cvol[::-1]
        n_base = cvol.shape[0]
        if m > 1 and n_base > 1:
            cvol = _axial_interleave(cvol, m)
    nv, nu = cvol.shape[1], cvol.shape[2]

    from correrender_tpu.render.dvr_fast import shearwarp_geometry

    # Geometry is that of the ORIGINAL planes; supersampled
    # slice_coords/g are derived by the same exact subdivision below
    # (g is affine in the slice coordinate). Feeding the supersampled
    # count to shearwarp_geometry instead would shift every plane by
    # up to half a voxel (measured: SSIM *dropped* with m until this
    # was fixed).
    geo = shearwarp_geometry(
        camera, box_min, box_max, a, in_plane, flip, n_base, nv, nu,
        image_size, intermediate_scale,
    )
    slice_coords = geo["slice_coords"]
    n_slices = n_base
    if m > 1 and n_base > 1:
        n_slices = (n_base - 1) * m + 1
        step0 = (slice_coords[1] - slice_coords[0]) / m
        slice_coords = slice_coords[0] + np.arange(n_slices) * step0
        g0 = geo["g"]
        gstep = (g0[1] - g0[0]) / m
        geo = dict(geo)
        geo["g"] = g0[0] + np.arange(n_slices) * gstep
    assert cvol.shape[0] == n_slices
    coords_v, coords_u = geo["coords_v"], geo["coords_u"]
    g, z_ref, e_u, e_v = geo["g"], geo["z_ref"], geo["e_u"], geo["e_v"]
    grid_u, grid_v = geo["grid_u"], geo["grid_v"]
    hi_res, wi_res = geo["hi_res"], geo["wi_res"]
    width, height = image_size
    e_a = eye[a]

    # Note: a Pallas VMEM variant of this scan was measured 3x SLOWER
    # than the XLA formulation (the 10-plane fori carry spills; XLA's
    # scan keeps the per-slice slabs fused) — see git history for the
    # kernel. The XLA scan is the fast path here.
    ds_world = float(slice_coords[1] - slice_coords[0]) if (
        len(slice_coords) > 1
    ) else 0.0
    found, depth, grad_hit = _first_hit_scan(
        cvol,
        jnp.asarray(g),
        jnp.asarray(coords_v, jnp.float32),
        jnp.asarray(coords_u, jnp.float32),
        jnp.asarray(grid_v),
        jnp.asarray(grid_u),
        jnp.asarray([e_u, e_v], jnp.float32),
        jnp.float32(iso_value),
        hi_res,
        wi_res,
        ip0=in_plane[0],
        ip1=in_plane[1],
        ax=a,
        ds=jnp.float32(ds_world),
        refine=int(refine),
    )

    img = shade_and_warp(
        found, grad_hit, camera, grid_u, grid_v, in_plane, a, eye,
        z_ref, surface_color, background, width, height,
    )
    if not return_depth:
        return img

    # Eye distance on the intermediate grid: the ray through pixel
    # (u, v) passes (grid_u[u], grid_v[v]) on the z_ref plane, so the
    # hit at slice coordinate s sits at |s − e_a| / |z_ref − e_a| of
    # the reference-plane distance L(u, v).
    step_slice = float(slice_coords[1] - slice_coords[0]) if (
        len(slice_coords) > 1
    ) else 1.0
    dist = _depth_intermediate(
        found, depth, jnp.asarray(grid_u), jnp.asarray(grid_v),
        jnp.float32(e_u), jnp.float32(e_v), jnp.float32(e_a),
        jnp.float32(slice_coords[0]), jnp.float32(step_slice),
        jnp.float32(z_ref - e_a),
    )
    # Warp depth through the same homography: depth rides channel 0
    # with coverage as alpha; un-premultiplied by warp_to_screen.
    dimg = df.warp_to_screen(
        jnp.stack([dist, jnp.zeros_like(dist), jnp.zeros_like(dist)],
                  axis=-1),
        found.astype(jnp.float32), camera, width, height, in_plane, a,
        eye, z_ref, grid_u, grid_v,
        jnp.zeros(4, jnp.float32),
    )
    screen_depth = jnp.where(dimg[..., 3] > 0.5, dimg[..., 0], jnp.inf)
    return img, screen_depth


@jax.jit
def _depth_intermediate(found, depth, grid_u, grid_v, e_u, e_v, e_a,
                        s0, step_slice, dz):
    s_hit = s0 + depth * step_slice
    du = grid_u[None, :] - e_u
    dv = grid_v[:, None] - e_v
    ref_len = jnp.sqrt(du * du + dv * dv + dz * dz)
    dist = jnp.abs(s_hit - e_a) / jnp.abs(dz) * ref_len
    return jnp.where(found, dist, 0.0)


@functools.partial(jax.jit, static_argnames=("ip0", "ip1", "a"))
def _shade_intermediate(
    found, grad_hit, grid_u, grid_v, e_u, e_v, dz, col, ip0, ip1, a
):
    """Blinn–Phong shade a first-hit map on the intermediate grid.

    One compiled program for the ~30 elementwise ops: shading runs
    eagerly otherwise, and per-dispatch overhead on the tunneled
    device dwarfs the actual VPU work for half-resolution
    intermediates."""
    shape2 = (grid_v.shape[0], grid_u.shape[0])
    # Directions are broadcast ON DEVICE from the 1D grids — a host
    # meshgrid would upload two full-image arrays per frame.
    dir_u = jnp.broadcast_to(grid_u[None, :] - e_u, shape2)
    dir_v = jnp.broadcast_to(grid_v[:, None] - e_v, shape2)
    dir_a = jnp.full(shape2, dz, jnp.float32)
    d3 = jnp.zeros(shape2 + (3,))
    d3 = d3.at[..., ip0].set(dir_u)
    d3 = d3.at[..., ip1].set(dir_v)
    d3 = d3.at[..., a].set(dir_a)
    d3 = d3 / jnp.maximum(
        jnp.linalg.norm(d3, axis=-1, keepdims=True), 1e-9
    )
    n_vec = grad_hit / jnp.maximum(
        jnp.linalg.norm(grad_hit, axis=-1, keepdims=True), 1e-9
    )
    view = -d3
    n_facing = jnp.where(
        jnp.sum(n_vec * view, axis=-1, keepdims=True) < 0, -n_vec, n_vec
    )
    light = view  # headlight (matches iso.py default)
    ambient = 0.2
    diffuse = 0.7 * jnp.abs(jnp.sum(n_facing * light, axis=-1))
    half_v = (light + view) / jnp.maximum(
        jnp.linalg.norm(light + view, axis=-1, keepdims=True), 1e-9
    )
    spec = 0.1 * jnp.abs(jnp.sum(n_facing * half_v, axis=-1)) ** 32
    intensity = (ambient + diffuse + spec)[..., None]
    found_f = found.astype(jnp.float32)
    inter_rgb = found_f[..., None] * col[:3] * intensity  # premultiplied
    return inter_rgb, found_f


def shade_and_warp(
    found, grad_hit, camera, grid_u, grid_v, in_plane, a, eye, z_ref,
    surface_color, background, width, height,
):
    """Blinn–Phong shade a first-hit map on the intermediate grid and
    homography-warp it to the screen (shared with the sharded path)."""
    e_u, e_v = eye[in_plane[0]], eye[in_plane[1]]
    e_a = eye[a]
    inter_rgb, inter_a = _shade_intermediate(
        found, grad_hit, jnp.asarray(grid_u), jnp.asarray(grid_v),
        jnp.float32(e_u), jnp.float32(e_v), jnp.float32(z_ref - e_a),
        jnp.asarray(surface_color, jnp.float32),
        in_plane[0], in_plane[1], a,
    )
    return df.warp_to_screen(
        inter_rgb, inter_a, camera, width, height, in_plane, a, eye,
        z_ref, grid_u, grid_v, jnp.asarray(background, jnp.float32),
    )
