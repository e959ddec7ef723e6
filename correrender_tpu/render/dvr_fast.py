"""Matmul-based direct volume rendering: perspective shear-warp.

The naive ray-marcher (dvr.py) is exact but gather-bound: XLA gather on
TPU sustains only ~100 M elem/s, so 1080p × 2000 steps × 8 corners is
seconds-per-frame. This renderer restructures DVR so the hot loop is
matrix multiplication:

1. **Classify**: transfer function applied to the whole volume as a
   two-hot MXU contraction (render/classify.py) — no gathers.
2. **Shear (composite)**: slices of the classified volume along the
   principal axis are projected *through the eye* onto the reference
   plane (the nearest slice plane). That projection is a per-slice
   uniform scale about the eye's in-plane point — axis-separable — so
   each slice is resampled onto the intermediate grid with two small
   dense matmuls (tent-weight matrices), then composited front-to-back
   with the OVER operator. Every intermediate pixel corresponds to an
   exact eye ray, and slice-plane intersections are exact sample
   points of that ray (step Δs = Δz·|d|/|d_a|), so this computes the
   same volume-rendering integral as the marcher — perspective-correct,
   not the classic parallel-projection approximation.
3. **Warp**: one 2D homography from the reference plane to the screen.
   (The only gather left: 4/pixel, ~10⁷ total instead of ~10¹⁰.)

Reference semantics matched: DvrShader.glsl compositing
(alpha = 1 − exp(−τ·Δs·attenuation), premultiplied OVER, background
blend, un-premultiply — Data/Shaders/Renderers/DVR/DvrShader.glsl:103-137),
with the volume treated as zero outside the box (exact box clipping via
zero tent weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from correrender_tpu.render.camera import default_render_box

from correrender_tpu.render.classify import classify_volume

_EPS = 1e-6


def _principal_axis(forward: np.ndarray) -> int:
    return int(np.argmax(np.abs(forward)))  # 0=x, 1=y, 2=z (world)


def _over(a, b):
    """Premultiplied front-to-back OVER — an associative monoid, which
    is what lets compositing tree-reduce instead of serializing over
    slices (log₂S combine depth instead of S)."""
    rgb_a, al_a = a
    rgb_b, al_b = b
    return rgb_a + (1.0 - al_a)[..., None] * rgb_b, al_a + (1.0 - al_a) * al_b


@functools.partial(jax.jit, static_argnames=("hi", "wi", "chunk"))
def _composite_scan(
    cvol,  # (S, Yv, Xv, 4) classified slices, near→far, premultiplied
    g,  # (S,) through-eye scale per slice
    axis_coords_y,  # (Yv,) world coords of slice rows
    axis_coords_x,  # (Xv,) world coords of slice cols
    grid_v,  # (hi,) intermediate-grid world coords (v/y direction)
    grid_u,  # (wi,) intermediate-grid world coords (u/x direction)
    eye_uv,  # (2,) eye in-plane world coords (u, x-like first)
    len_factor,  # (hi, wi) Δs multiplier per intermediate pixel
    slab_thickness,  # scalar world Δz between slices
    attenuation,
    hi: int,
    wi: int,
    chunk: int = 16,
    kstop=None,  # optional (hi, wi) fractional stop-slice indices
):
    s, yv, xv, _ = cvol.shape
    dy = axis_coords_y[1] - axis_coords_y[0] if yv > 1 else 1.0
    dx = axis_coords_x[1] - axis_coords_x[0] if xv > 1 else 1.0
    num_chunks = -(-s // chunk)
    padded = num_chunks * chunk
    if padded != s:
        cvol = jnp.pad(cvol, ((0, padded - s), (0, 0), (0, 0), (0, 0)))
        g = jnp.pad(g, (0, padded - s), constant_values=-1.0)  # inert
    cvol_c = cvol.reshape(num_chunks, chunk, yv, xv, 4).astype(jnp.bfloat16)
    g_c = g.reshape(num_chunks, chunk)
    k_c = jnp.arange(padded, dtype=jnp.float32).reshape(num_chunks, chunk)

    def chunk_step(acc, inputs):
        slices, gk, kidx = inputs  # (chunk, Yv, Xv, 4), (chunk,), (chunk,)
        # Per-slice separable tent-weight resample, batched over the
        # chunk — one big MXU contraction per chunk.
        qv = eye_uv[1] + (grid_v[None, :] - eye_uv[1]) * gk[:, None]
        qu = eye_uv[0] + (grid_u[None, :] - eye_uv[0]) * gk[:, None]
        wv = jnp.maximum(
            1.0 - jnp.abs(qv[..., None] - axis_coords_y[None, None, :]) / dy,
            0.0,
        ).astype(jnp.bfloat16)  # (chunk, hi, Yv)
        wu = jnp.maximum(
            1.0 - jnp.abs(qu[..., None] - axis_coords_x[None, None, :]) / dx,
            0.0,
        ).astype(jnp.bfloat16)  # (chunk, wi, Xv)
        slab = jnp.einsum(
            "kiy,kyxc->kixc", wv, slices, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        slab = jnp.einsum(
            "kixc,kjx->kijc", slab, wu, preferred_element_type=jnp.float32
        )  # (chunk, hi, wi, 4) f32
        tau = slab[..., 3]
        rgb_straight = slab[..., :3] / jnp.maximum(tau, _EPS)[..., None]
        valid = (gk > _EPS).astype(jnp.float32)[:, None, None]
        thickness = slab_thickness * len_factor[None]
        if kstop is not None:
            # Depth-buffer clip: scale each slab's optical thickness
            # by the fraction in front of the per-pixel stop slice.
            thickness = thickness * jnp.clip(
                kstop[None] - kidx[:, None, None], 0.0, 1.0
            )
        alpha = (
            1.0
            - jnp.exp(-tau * thickness * attenuation)
        ) * valid
        rgb = alpha[..., None] * rgb_straight  # premultiplied contribution

        # Ordered tree-reduction of the chunk (log2 combine depth).
        n = chunk
        while n > 1:
            half = n // 2
            a = (rgb[0 : 2 * half : 2], alpha[0 : 2 * half : 2])
            b = (rgb[1 : 2 * half : 2], alpha[1 : 2 * half : 2])
            rgb_m, al_m = _over(a, b)
            if n % 2:
                rgb = jnp.concatenate([rgb_m, rgb[-1:]], axis=0)
                alpha = jnp.concatenate([al_m, alpha[-1:]], axis=0)
            else:
                rgb, alpha = rgb_m, al_m
            n = rgb.shape[0]
        acc = _over(acc, (rgb[0], alpha[0]))
        return acc, None

    acc0 = (
        jnp.zeros((hi, wi, 3), jnp.float32),
        jnp.zeros((hi, wi), jnp.float32),
    )
    (rgb, a), _ = jax.lax.scan(chunk_step, acc0, (cvol_c, g_c, k_c))
    return rgb, a


def shearwarp_camera_key(camera) -> tuple:
    """(principal axis, slice order) — the key a prepared layout is
    valid for; cheap to evaluate per frame."""
    eye = np.asarray(camera.position, np.float32)
    forward = np.asarray(camera.look_at_point, np.float32) - eye
    forward /= np.linalg.norm(forward)
    a = _principal_axis(forward)
    return (a, bool(forward[a] < 0))


def shearwarp_geometry(camera, box_min, box_max, a, in_plane, flip,
                       s, nv, nu, image_size, intermediate_scale):
    """Shared shear-warp slice/grid geometry — the ONE definition used
    by the dense DVR/iso fast paths and both sharded renderers. A
    numerical tweak applied to one copy and silently skipped in the
    others produces shard-boundary / fast-vs-exact parity artifacts
    (round-3 review: this block existed in four near-verbatim copies).

    Returns a dict with: slice_coords (near→far), coords_v/coords_u,
    g, z_ref, e_u/e_v, grid_u/grid_v (host f32), hi_res/wi_res,
    len_factor (DEVICE array — host meshgrids cost a full-image H2D
    per frame), slab_thickness.
    """
    eye = np.asarray(camera.position, np.float32)

    # World coordinates of voxel centers along each axis. Array index
    # ascends with world coordinate for (z,y,x) ordering.
    def centers(world_axis, count):
        lo, hi_ = box_min[world_axis], box_max[world_axis]
        return lo + (np.arange(count) + 0.5) / count * (hi_ - lo)

    slice_coords = centers(a, s)
    coords_v = centers(in_plane[1], nv)
    coords_u = centers(in_plane[0], nu)
    if flip:
        slice_coords = slice_coords[::-1]
    e_a = eye[a]
    z_ref = slice_coords[0]
    denom = z_ref - e_a
    if abs(denom) < 1e-6:
        denom = np.sign(denom or 1.0) * 1e-6
    g = (slice_coords - e_a) / denom  # (S,) ≥ 1 when eye outside

    # Intermediate grid: union of slice footprints projected to the
    # reference plane through the eye (q_ref = e + (q − e)/g_k).
    e_u, e_v = eye[in_plane[0]], eye[in_plane[1]]
    lo_u = hi_u = lo_v = hi_v = None
    for gk in (g.min(), g.max(), 1.0):
        if gk <= 0:
            continue
        cu = e_u + (np.array([coords_u[0], coords_u[-1]]) - e_u) / gk
        cv = e_v + (np.array([coords_v[0], coords_v[-1]]) - e_v) / gk
        lo_u = cu.min() if lo_u is None else min(lo_u, cu.min())
        hi_u = cu.max() if hi_u is None else max(hi_u, cu.max())
        lo_v = cv.min() if lo_v is None else min(lo_v, cv.min())
        hi_v = cv.max() if hi_v is None else max(hi_v, cv.max())

    width, height = image_size
    hi_res = max(int(height * intermediate_scale), 2 * nv)
    wi_res = max(int(width * intermediate_scale), 2 * nu)
    # One-texel safety margin so box-silhouette content never touches
    # the grid boundary (the warp's tent weights fall off over one
    # texel; without the margin the edge convention would matter).
    margin_u = 2.0 * (hi_u - lo_u) / wi_res
    margin_v = 2.0 * (hi_v - lo_v) / hi_res
    grid_u = np.linspace(
        lo_u - margin_u, hi_u + margin_u, wi_res
    ).astype(np.float32)
    grid_v = np.linspace(
        lo_v - margin_v, hi_v + margin_v, hi_res
    ).astype(np.float32)

    # Per-intermediate-pixel path-length factor |d| / |d_a| of the ray
    # eye → reference-plane point, built ON DEVICE from the 1D grids.
    d_u = jnp.asarray(grid_u)[None, :] - e_u
    d_v = jnp.asarray(grid_v)[:, None] - e_v
    d_a = float(z_ref - e_a)
    len_factor = jnp.sqrt(d_u**2 + d_v**2 + d_a**2) / max(abs(d_a), 1e-9)
    slab_thickness = float(
        abs(slice_coords[1] - slice_coords[0]) if s > 1 else
        (box_max[a] - box_min[a])
    )
    return dict(
        slice_coords=slice_coords, coords_v=coords_v, coords_u=coords_u,
        g=g, z_ref=z_ref, e_u=e_u, e_v=e_v, grid_u=grid_u,
        grid_v=grid_v, hi_res=hi_res, wi_res=wi_res,
        len_factor=len_factor, slab_thickness=slab_thickness,
    )


def shearwarp_viable(camera, box) -> bool:
    """Whether the shear-warp factorization applies for this camera.

    False when the eye is inside (or past the near face of) the
    principal-axis slab — behind-eye slices flip the projection sign.
    Callers route those frames to the exact marchers; Scene checks this
    BEFORE building restriction-classified layouts (the in-function
    fallback cannot carry a classified volume into dvr_render).
    """
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)
    eye = np.asarray(camera.position, np.float32)
    forward = np.asarray(camera.look_at_point, np.float32) - eye
    forward = forward / np.linalg.norm(forward)
    a = _principal_axis(forward)
    if forward[a] >= 0:
        return bool(eye[a] < box_min[a])
    return bool(eye[a] > box_max[a])


def prepare_shearwarp(
    volume: jnp.ndarray,
    transfer_function,
    camera,
    classified: jnp.ndarray | None = None,
    prior: dict | None = None,
) -> dict:
    """Build the compositor's resident slice layout for a camera.

    On TPU the entry keeps TWO resident arrays: the (slice, v, u)
    SCALAR volume (transfer-function independent — rebuilt only when
    the field or the camera's principal axis / slice order changes)
    and the classified channel-first bf16 volume derived from it with
    one fused Pallas pass (ops/pallas/shearwarp_kernel.classify_to_cf).
    A transfer-function change therefore re-runs only the fused
    classify pass (~10 ms at 250³) instead of classify + transpose +
    cast (~100 ms in round 1); pass the previous entry as ``prior`` to
    reuse its scalar layout.

    Pass the result to :func:`dvr_shearwarp` via ``prepared=``; it is
    keyed by (principal axis, slice order) and rebuilt automatically
    when the camera crosses an axis boundary.
    """
    eye = np.asarray(camera.position, np.float32)
    forward = np.asarray(camera.look_at_point, np.float32) - eye
    forward /= np.linalg.norm(forward)
    a = _principal_axis(forward)
    in_plane = [i for i in range(3) if i != a]
    flip = bool(forward[a] < 0)
    world_to_arr = {2: 0, 1: 1, 0: 2}
    perm = (world_to_arr[a], world_to_arr[in_plane[1]],
            world_to_arr[in_plane[0]])

    from correrender_tpu.ops.pallas.common import on_tpu

    if on_tpu() and classified is None:
        from correrender_tpu.ops.pallas.shearwarp_kernel import (
            classify_to_cf,
        )

        # A prior is only reusable when it was built from THIS volume
        # (weakref identity — does not pin the donor array) with the
        # same orientation; a stale prior from another field/volume
        # with the same camera key would silently render wrong data.
        import weakref

        prior_vol = (
            prior.get("vol_ref", lambda: None)()
            if prior is not None else None
        )
        if (prior is not None and prior.get("key") == (a, flip)
                and prior.get("svol") is not None
                and prior_vol is volume):
            svol = prior["svol"]
        else:
            svol = jnp.transpose(volume, perm)
            if flip:
                svol = svol[::-1]
        cf = classify_to_cf(
            svol, transfer_function.lut,
            jnp.asarray(transfer_function.domain, jnp.float32),
        )
        try:
            vol_ref = weakref.ref(volume)
        except TypeError:  # tracers etc. — never reusable
            vol_ref = lambda: None
        return {
            "key": (a, flip),
            "s": svol.shape[0],
            "vu": (svol.shape[1], svol.shape[2]),
            "svol": svol,
            "vol_ref": vol_ref,
            "cvol": None,
            "cf": cf,
        }

    if classified is None:
        classified = classify_volume(
            volume, transfer_function.lut,
            jnp.asarray(transfer_function.domain, jnp.float32),
        )
    cvol = jnp.transpose(classified, perm + (3,))
    if flip:
        cvol = cvol[::-1]
    entry = {
        "key": (a, flip),
        "s": cvol.shape[0],
        "vu": (cvol.shape[1], cvol.shape[2]),
        "svol": None,
        "cvol": cvol,
        "cf": None,
    }
    if on_tpu():
        from correrender_tpu.ops.pallas.shearwarp_kernel import (
            prepare_cvol_cf,
        )

        entry["cf"] = prepare_cvol_cf(cvol)
        entry["cvol"] = None  # the f32 copy is not needed on TPU
    return entry


def dvr_shearwarp(
    volume: jnp.ndarray,
    camera,
    transfer_function,
    image_size=(1920, 1080),
    box=None,
    attenuation: float = 100.0,
    background=(0.0, 0.0, 0.0, 1.0),
    intermediate_scale: float = 1.0,
    classified: jnp.ndarray | None = None,
    warp: str = "matmul",
    prepared: dict | None = None,
    depth_limit=None,
) -> jnp.ndarray:
    """Fast DVR (see module docstring).

    Args:
      volume: ``(Z, Y, X)`` scalar field.
      intermediate_scale: intermediate-grid resolution multiplier
        relative to the larger of (image size, 2× volume face).
      classified: optionally a precomputed ``classify_volume`` result
        (reuse across frames while the TF/field are unchanged).
      warp: "matmul" (gather-free two-pass, default) or "gather".
      prepared: a :func:`prepare_shearwarp` result — the compositor's
        resident slice layout. Skips the per-frame classify + layout
        transform entirely when its camera key (principal axis, slice
        order) still matches; rebuilt automatically otherwise.
      depth_limit: optional (H, W) screen-space eye distances (the
        shared per-view depth buffer): the march clips against it so
        opaque geometry occludes the volume correctly (reference
        DvrShader.glsl depth test). Pulled into the intermediate grid
        through the inverse of the screen homography and converted to
        fractional slice units; the compositor scales each slab's
        optical thickness by its in-front fraction.

    Returns:
      ``(H, W, 4)`` straight-alpha RGBA.
    """
    zs, ys, xs = volume.shape
    if box is None:
        box = default_render_box((zs, ys, xs))
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)

    eye = np.asarray(camera.position, np.float32)
    forward = np.asarray(camera.look_at_point, np.float32) - eye
    forward /= np.linalg.norm(forward)
    a = _principal_axis(forward)  # world axis index
    in_plane = [i for i in range(3) if i != a]  # (u, v) world axes

    flip = bool(forward[a] < 0)
    # Shear-warp factorization requires every slice plane strictly in
    # front of the eye along the principal axis: with the eye inside
    # (or past the near face of) the slab, behind-eye slices flip the
    # projection sign and composite mirrored content (round-3 review
    # finding). Fly-through/zoom-in frames fall back to the exact
    # marcher, which handles eye-inside via t_start = max(t_near, 0).
    # (Scene additionally gates on shearwarp_viable BEFORE building
    # restriction-classified layouts — this fallback cannot carry a
    # classified volume into dvr_render.)
    if not shearwarp_viable(camera, (box_min, box_max)):
        from correrender_tpu.render.dvr import dvr_render

        return dvr_render(
            volume, camera, transfer_function, image_size=image_size,
            box=box, attenuation=attenuation, background=background,
            depth_limit=depth_limit,
        )
    if prepared is not None and prepared["key"] != (a, flip):
        prepared = None  # camera crossed an axis/order boundary
    if prepared is None and classified is None:
        from correrender_tpu.ops.pallas.common import on_tpu

        if on_tpu():
            # Unprepared TPU path: build a one-shot prepared entry
            # instead of the eager classify(f32) → 4D transpose →
            # reverse chain — that chain materializes three full RGBA
            # copies per frame and OOM'd the fused pick-drag at
            # 250³×100 with the member stack resident (this session's
            # finding); the prepared route is one scalar transpose +
            # the fused classify_to_cf pass, and is bit-identical by
            # construction (it IS the prepared path).
            prepared = prepare_shearwarp(volume, transfer_function,
                                         camera)
    if prepared is not None:
        cvol = prepared["cvol"]  # None on TPU (cf layout only)
        n_slices = prepared["s"]
        nv, nu = prepared["vu"]
    else:
        # Classified volume, axes ordered (slice, y-like, x-like).
        if classified is None:
            classified = classify_volume(
                volume, transfer_function.lut,
                jnp.asarray(transfer_function.domain, jnp.float32),
            )
        # volume axes are (z, y, x) = world (2, 1, 0).
        world_to_arr = {2: 0, 1: 1, 0: 2}
        arr_axis = world_to_arr[a]
        arr_v = world_to_arr[in_plane[1]]
        arr_u = world_to_arr[in_plane[0]]
        cvol = jnp.transpose(classified, (arr_axis, arr_v, arr_u, 3))
        n_slices = cvol.shape[0]
        nv, nu = cvol.shape[1], cvol.shape[2]

    # Order slices near→far from the eye.
    if flip and prepared is None:
        cvol = cvol[::-1]
    geo = shearwarp_geometry(
        camera, box_min, box_max, a, in_plane, flip, n_slices, nv, nu,
        image_size, intermediate_scale,
    )
    slice_coords, coords_v, coords_u = (
        geo["slice_coords"], geo["coords_v"], geo["coords_u"])
    g, z_ref, e_u, e_v = geo["g"], geo["z_ref"], geo["e_u"], geo["e_v"]
    grid_u, grid_v = geo["grid_u"], geo["grid_v"]
    hi_res, wi_res = geo["hi_res"], geo["wi_res"]
    len_factor, slab_thickness = (
        geo["len_factor"], geo["slab_thickness"])
    width, height = image_size

    kstop = None
    if depth_limit is not None:
        kstop = _depth_to_kstop(
            depth_limit, camera, width, height, in_plane, a, eye,
            z_ref, grid_u, grid_v, len_factor, slice_coords, n_slices,
        )

    composite_args = (
        cvol,
        jnp.asarray(g, jnp.float32),
        jnp.asarray(coords_v, jnp.float32),
        jnp.asarray(coords_u, jnp.float32),
        jnp.asarray(grid_v),
        jnp.asarray(grid_u),
        jnp.asarray([e_u, e_v], jnp.float32),
        jnp.asarray(len_factor, jnp.float32),
        jnp.float32(slab_thickness),
        jnp.float32(attenuation),
    )
    from correrender_tpu.ops.pallas.common import on_tpu

    if on_tpu():
        # Fused VMEM compositor (~4x the XLA scan: no slab HBM traffic).
        from correrender_tpu.ops.pallas.shearwarp_kernel import (
            shearwarp_composite_pallas,
        )

        inter_rgb, inter_a = shearwarp_composite_pallas(
            *composite_args, hi=hi_res, wi=wi_res,
            cvol_cf=None if prepared is None else prepared["cf"],
            vu=None if prepared is None else tuple(prepared["vu"]),
            kstop=kstop,
        )
    else:
        inter_rgb, inter_a = _composite_scan(
            *composite_args, hi=hi_res, wi=wi_res, kstop=kstop
        )

    # Final homography warp to the screen.
    if warp == "matmul":
        return warp_to_screen(
            inter_rgb, inter_a, camera, width, height, in_plane, a,
            eye, z_ref, grid_u, grid_v, background,
        )
    origin, directions = camera.rays(width, height)
    u_axis = np.zeros(3, np.float32)
    u_axis[in_plane[0]] = 1.0
    v_axis = np.zeros(3, np.float32)
    v_axis[in_plane[1]] = 1.0
    return _warp(
        inter_rgb, inter_a,
        jnp.asarray(grid_u), jnp.asarray(grid_v),
        origin, directions,
        jnp.asarray(u_axis), jnp.asarray(v_axis),
        jnp.float32(z_ref),
        jnp.asarray(np.eye(3)[a], jnp.float32),
        jnp.asarray(background, jnp.float32),
    )


def _depth_to_kstop(
    depth_limit, camera, width, height, in_plane, a, eye, z_ref,
    grid_u, grid_v, len_factor, slice_coords, n_slices,
):
    """Screen-space depth buffer → fractional stop-slice indices on
    the intermediate grid.

    The intermediate→screen map is the projective homography of
    :func:`_homography_coeffs`; its 3×3 inverse maps every
    intermediate pixel to its screen position, where the depth buffer
    is sampled bilinearly (+inf treated as no-clip). Depth along a
    ray is linear in the slice coordinate — dist(k) = (|s₀−e_a| +
    k·|Δs|)·len_factor — so the sampled distance converts to a
    fractional slice index in closed form.
    """
    a_coef, b_coef, c_coef = _homography_coeffs(
        camera, width, height, in_plane, a, eye, z_ref, grid_u, grid_v
    )
    m = np.array([a_coef, b_coef, c_coef], np.float64)
    try:
        minv = np.linalg.inv(m)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "depth_limit: degenerate screen homography for this camera"
        ) from exc
    hi_res, wi_res = len(grid_v), len(grid_u)
    su = jnp.arange(wi_res, dtype=jnp.float32)[None, :]
    sv = jnp.arange(hi_res, dtype=jnp.float32)[:, None]
    minv = minv.astype(np.float32)
    q0 = minv[0, 0] * su + minv[0, 1] * sv + minv[0, 2]
    q1 = minv[1, 0] * su + minv[1, 1] * sv + minv[1, 2]
    q2 = minv[2, 0] * su + minv[2, 1] * sv + minv[2, 2]
    q0 = jnp.where(jnp.abs(q0) < 1e-12, 1e-12, q0)
    px = q1 / q0
    py = q2 / q0

    d = jnp.asarray(depth_limit, jnp.float32)
    d = jnp.where(jnp.isfinite(d), d, 1e9)
    x0i = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, width - 2)
    y0i = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, height - 2)
    fx = jnp.clip(px - x0i, 0.0, 1.0)
    fy = jnp.clip(py - y0i, 0.0, 1.0)
    dint = (
        d[y0i, x0i] * (1 - fy) * (1 - fx)
        + d[y0i, x0i + 1] * (1 - fy) * fx
        + d[y0i + 1, x0i] * fy * (1 - fx)
        + d[y0i + 1, x0i + 1] * fy * fx
    )
    outside = (
        (px < 0) | (px > width - 1) | (py < 0) | (py > height - 1)
    )
    dint = jnp.where(outside, 1e9, dint)
    step_abs = (
        abs(float(slice_coords[1] - slice_coords[0]))
        if n_slices > 1 else 1.0
    )
    base = abs(float(slice_coords[0] - eye[a]))
    kstop = (dint / jnp.maximum(len_factor, 1e-9) - base) / step_abs
    return jnp.clip(kstop, 0.0, float(n_slices))


def warp_to_screen(
    inter_rgb, inter_a, camera, width, height, in_plane, a, eye,
    z_ref, grid_u, grid_v, background,
):
    """Homography-warp an intermediate image to the screen.

    Catmull–Smith pass-order selection: four factorizations exist
    (intermediate transpose × output transpose); each has a pole where
    its per-line inversion denominator vanishes. A variant is invalid
    when its inverted coordinate does not influence the inverted map at
    all (pure-rotation homographies); otherwise score by the pole's
    distance outside the used range. Gather fallback only if all four
    fail (extreme perspective). Shared by the dense and sharded DVR and
    isosurface renderers.
    """
    hi_res, wi_res = inter_a.shape
    e_a = eye[a]
    a_coef, b_coef, c_coef = _homography_coeffs(
        camera, width, height, in_plane, a, eye, z_ref, grid_u, grid_v
    )

    def score(num, den, extent):
        if abs(den) < 1e-12:
            return np.inf if abs(num) > 1e-12 else -np.inf
        pole = num / den
        if pole < 0:
            return -pole / extent
        if pole > extent - 1:
            return (pole - (extent - 1)) / extent
        return -np.inf  # pole inside the image

    # (score, transpose_intermediate, transpose_output). With the
    # intermediate transposed, pass A runs over its columns (wi).
    variants = [
        (score(b_coef[2], c_coef[2], hi_res), False, False),
        (score(b_coef[1], c_coef[1], hi_res), False, True),
        (score(a_coef[2], c_coef[2], wi_res), True, False),
        (score(a_coef[1], c_coef[1], wi_res), True, True),
    ]
    best, t_int, t_out = max(variants, key=lambda v: v[0])
    if best > -np.inf:
        idx_swap = lambda c: np.asarray([c[0], c[2], c[1]])
        ca, cb, cc = a_coef, b_coef, c_coef
        rgb_in, a_in = inter_rgb, inter_a
        w_o, h_o = width, height
        if t_int:
            ca, cb = cb, ca
            rgb_in = jnp.swapaxes(rgb_in, 0, 1)
            a_in = jnp.swapaxes(a_in, 0, 1)
        if t_out:
            ca, cb, cc = idx_swap(ca), idx_swap(cb), idx_swap(cc)
            w_o, h_o = height, width
        out = _warp_matmul(
            rgb_in, a_in,
            jnp.asarray(ca, jnp.float32),
            jnp.asarray(cb, jnp.float32),
            jnp.asarray(cc, jnp.float32),
            jnp.float32(np.sign(z_ref - e_a) or 1.0),
            jnp.asarray(background, jnp.float32),
            w_o, h_o,
        )
        return jnp.swapaxes(out, 0, 1) if t_out else out
    # All four factorizations degenerate → gather warp.
    origin, directions = camera.rays(width, height)
    u_axis = np.zeros(3, np.float32)
    u_axis[in_plane[0]] = 1.0
    v_axis = np.zeros(3, np.float32)
    v_axis[in_plane[1]] = 1.0
    return _warp(
        inter_rgb, inter_a,
        jnp.asarray(grid_u), jnp.asarray(grid_v),
        origin, directions,
        jnp.asarray(u_axis), jnp.asarray(v_axis),
        jnp.float32(z_ref),
        jnp.asarray(np.eye(3)[a], jnp.float32),
        jnp.asarray(background, jnp.float32),
    )


@jax.jit
def _warp(inter_rgb, inter_a, grid_u, grid_v, origin, directions,
          u_axis, v_axis, z_ref, a_axis, background):
    d_a = jnp.einsum("hwc,c->hw", directions, a_axis)
    o_a = jnp.dot(origin, a_axis)
    t = (z_ref - o_a) / jnp.where(jnp.abs(d_a) < _EPS, _EPS, d_a)
    p = origin + directions * t[..., None]
    pu = jnp.einsum("hwc,c->hw", p, u_axis)
    pv = jnp.einsum("hwc,c->hw", p, v_axis)
    su = (pu - grid_u[0]) / (grid_u[-1] - grid_u[0]) * (grid_u.shape[0] - 1)
    sv = (pv - grid_v[0]) / (grid_v[-1] - grid_v[0]) * (grid_v.shape[0] - 1)
    valid = t > 0

    hi, wi = inter_a.shape
    i0 = jnp.clip(jnp.floor(sv).astype(jnp.int32), 0, hi - 2)
    j0 = jnp.clip(jnp.floor(su).astype(jnp.int32), 0, wi - 2)
    fv = sv - i0
    fu = su - j0
    inside = (sv >= 0) & (sv <= hi - 1) & (su >= 0) & (su <= wi - 1)

    def bilerp(img):
        fv_ = fv[..., None] if img.ndim == 3 else fv
        fu_ = fu[..., None] if img.ndim == 3 else fu
        return (
            img[i0, j0] * (1 - fv_) * (1 - fu_)
            + img[i0, j0 + 1] * (1 - fv_) * fu_
            + img[i0 + 1, j0] * fv_ * (1 - fu_)
            + img[i0 + 1, j0 + 1] * fv_ * fu_
        )

    mask = (valid & inside).astype(jnp.float32)
    rgb = bilerp(inter_rgb) * mask[..., None]
    # Resampling can overshoot alpha past 1 by ~2e-3 (bf16 tent
    # weights); a > 1 makes the (1-a) background term negative.
    a = jnp.clip(bilerp(inter_a) * mask, 0.0, 1.0)
    h, w = a.shape
    bg = jnp.broadcast_to(background, (h, w, 4))
    rgb = rgb + (1.0 - a)[..., None] * bg[..., 3:4] * bg[..., :3]
    a = a + (1.0 - a) * bg[..., 3]
    safe = jnp.maximum(a, _EPS)
    return jnp.concatenate([rgb / safe[..., None], a[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Gather-free homography warp (two-pass per-line matmul resampling)
# ---------------------------------------------------------------------------
#
# The reference-plane → screen map is projective with a shared affine
# denominator:
#
#     su(px,py) = (A0 + A1·px + A2·py) / (C0 + C1·px + C2·py)
#     sv(px,py) = (B0 + B1·px + B2·py) / (C0 + C1·px + C2·py)
#
# It factors into two passes of per-line 1D resampling (Catmull–Smith):
#
#     pass A:  T(a, y)   = I(u(a, y), y)      with sv(a, py*) = y
#     pass B:  S(px, py) = T(px, sv(px, py))
#
# Each pass evaluates tent (bilinear) weights densely and contracts them
# with the image on the MXU — zero gathers. The weight tensors are built
# in row/column chunks to bound memory.


def _homography_coeffs(camera, width, height, in_plane, a_axis_idx,
                       eye, z_ref, grid_u, grid_v):
    """(A, B, C) affine coefficient triplets over pixel coords."""
    from correrender_tpu.render.camera import ray_dirs_affine

    e0, ex, ey = ray_dirs_affine(camera, width, height)
    o = np.asarray(eye, np.float64)
    k = float(z_ref) - o[a_axis_idx]
    dug = (grid_u[-1] - grid_u[0]) / (len(grid_u) - 1)
    dvg = (grid_v[-1] - grid_v[0]) / (len(grid_v) - 1)

    def coeff(axis, g0, scale):
        # s = ((o_axis − g0)·d_a + k·d_axis) / (scale · d_a)
        num = np.array(
            [
                (o[axis] - g0) * e0[a_axis_idx] + k * e0[axis],
                (o[axis] - g0) * ex[a_axis_idx] + k * ex[axis],
                (o[axis] - g0) * ey[a_axis_idx] + k * ey[axis],
            ]
        )
        return num / scale

    a_coef = coeff(in_plane[0], grid_u[0], dug)
    b_coef = coeff(in_plane[1], grid_v[0], dvg)
    c_coef = np.array([e0[a_axis_idx], ex[a_axis_idx], ey[a_axis_idx]])
    return a_coef, b_coef, c_coef


@functools.partial(jax.jit, static_argnames=("w_out", "h_out", "chunk"))
def _warp_matmul(
    inter_rgb,  # (Hi, Wi, 3) premultiplied
    inter_a,  # (Hi, Wi)
    a_coef, b_coef, c_coef,  # (3,) each, float32
    sign_ok,  # +1/−1: required sign of the denominator (ray forward)
    background,
    w_out: int,
    h_out: int,
    chunk: int = 8,
):
    hi, wi = inter_a.shape
    img = jnp.concatenate([inter_rgb, inter_a[..., None]], axis=-1)

    a0, a1, a2 = a_coef[0], a_coef[1], a_coef[2]
    b0, b1, b2 = b_coef[0], b_coef[1], b_coef[2]
    c0, c1, c2 = c_coef[0], c_coef[1], c_coef[2]

    # --- pass A: T[y, a] = I[y, u(a, y)] --------------------------------
    a_idx = jnp.arange(w_out, dtype=jnp.float32)  # (Wo,)
    y_idx = jnp.arange(hi, dtype=jnp.float32)  # (Hi,)
    # py*(a, y): sv(a, py) = y  →  py = (y(C0+C1 a) − B0 − B1 a)/(B2 − y C2)
    num = y_idx[:, None] * (c0 + c1 * a_idx[None, :]) - (
        b0 + b1 * a_idx[None, :]
    )
    den = b2 - y_idx[:, None] * c2
    py_star = num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)  # (Hi, Wo)
    u_den = c0 + c1 * a_idx[None, :] + c2 * py_star
    u = (a0 + a1 * a_idx[None, :] + a2 * py_star) / jnp.where(
        jnp.abs(u_den) < 1e-12, 1e-12, u_den
    )  # (Hi, Wo)

    # --- pass B coordinates (shared by both backends) -------------------
    px_idx0 = jnp.arange(w_out, dtype=jnp.float32)
    py_idx0 = jnp.arange(h_out, dtype=jnp.float32)
    den_full = c0 + c1 * px_idx0[None, :] + c2 * py_idx0[:, None]  # (Ho, Wo)
    sv_full = (
        b0 + b1 * px_idx0[None, :] + b2 * py_idx0[:, None]
    ) / jnp.where(jnp.abs(den_full) < 1e-12, 1e-12, den_full)

    # Note: a Pallas warp (VMEM-built per-row tent weights consumed by
    # (4,K)·(K,tile) dots, bit-identical output) measured 0.88× this
    # scan — the per-row weights give the MXU only 4 of 128 sublanes
    # and nothing batches across rows, so eliminating the weight HBM
    # traffic doesn't pay. Kernel in git history
    # ("Add Pallas row-resample warp kernel").
    pad_hi = -(-hi // chunk) * chunk
    u_p = jnp.pad(u, ((0, pad_hi - hi), (0, 0)))
    img_p = jnp.pad(img, ((0, pad_hi - hi), (0, 0), (0, 0)))
    cols = jnp.arange(wi, dtype=jnp.float32)

    def pass_a(carry, inputs):
        u_c, img_c = inputs  # (chunk, Wo), (chunk, Wi, 4)
        w = jnp.maximum(
            1.0 - jnp.abs(u_c[..., None] - cols), 0.0
        ).astype(jnp.bfloat16)  # (chunk, Wo, Wi)
        t = jnp.einsum(
            "yaw,ywc->yac", w, img_c.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return carry, t

    _, t_chunks = jax.lax.scan(
        pass_a, None,
        (u_p.reshape(-1, chunk, w_out), img_p.reshape(-1, chunk, wi, 4)),
    )
    t_img = t_chunks.reshape(pad_hi, w_out, 4)[:hi]  # (Hi, Wo, 4)

    # --- pass B: S[py, px] = T[sv(px, py), px] ---------------------------
    sv = sv_full
    pad_wo = -(-w_out // chunk) * chunk
    sv_p = jnp.pad(sv, ((0, 0), (0, pad_wo - w_out)))
    t_p = jnp.pad(t_img, ((0, 0), (0, pad_wo - w_out), (0, 0)))
    rows = jnp.arange(hi, dtype=jnp.float32)

    def pass_b(carry, inputs):
        sv_c, t_c = inputs  # (Ho, chunk) , (Hi, chunk, 4)
        w = jnp.maximum(
            1.0 - jnp.abs(sv_c.T[..., None] - rows), 0.0
        ).astype(jnp.bfloat16)  # (chunk, Ho, Hi)
        s = jnp.einsum(
            "xhj,jxc->hxc", w, t_c.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (Ho, chunk, 4)
        return carry, s

    _, s_chunks = jax.lax.scan(
        pass_b, None,
        (
            sv_p.reshape(h_out, -1, chunk).transpose(1, 0, 2),
            t_p.reshape(hi, -1, chunk, 4).transpose(1, 0, 2, 3),
        ),
    )
    s_img = (
        s_chunks.transpose(1, 0, 2, 3).reshape(h_out, pad_wo, 4)[:, :w_out]
    )
    return _warp_finish(s_img, den_full, sign_ok, background, w_out, h_out)


def _warp_finish(s_img, den_full, sign_ok, background, w_out, h_out):
    # Validity: forward rays only + in-bounds (tent already zeros
    # out-of-range, but behind-the-camera rays need the sign mask).
    valid = (den_full * sign_ok > 0).astype(jnp.float32)
    rgb = s_img[..., :3] * valid[..., None]
    a = jnp.clip(s_img[..., 3] * valid, 0.0, 1.0)  # see gather finish

    bg = jnp.broadcast_to(background, (h_out, w_out, 4))
    rgb = rgb + (1.0 - a)[..., None] * bg[..., 3:4] * bg[..., :3]
    a = a + (1.0 - a) * bg[..., 3]
    safe = jnp.maximum(a, _EPS)
    return jnp.concatenate([rgb / safe[..., None], a[..., None]], axis=-1)
