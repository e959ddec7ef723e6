"""Pallas exact per-pixel ray-march kernels (DVR + iso first-hit).

The missing kernel family flagged in round 4: the XLA exact marchers
(render/dvr.py, render/iso.py) are gather-storms — every fixed step
re-gathers 8 voxels per ray from HBM (~40 s/frame banded at 1080p,
and a single-pass 1080p frame crashed the TPU worker). This kernel
renders the SAME per-pixel ray integral at interactive-adjacent rates
by restructuring the march TPU-natively — no per-ray gathers at all:

* **Plane-order marching.** Rays from one camera share the sign of
  their direction along the volume's principal axis, so advancing a
  *volume plane index* front-to-back visits every ray's samples in
  compositing order. For ray p the sample position on plane slab k at
  sub-step s is an affine function of per-ray slopes:
  ``u*(p) = U0 + γ(k,s)·SU(p)`` — U0 is a camera constant and γ is a
  per-(k,s) scalar, so all per-plane geometry is two FMAs per ray.
* **Brick locality.** An (8, 128)-pixel screen tile's footprint on one
  plane spans only ~(tile·voxels-per-pixel + filter support) voxels.
  The kernel slices that brick from the VMEM-resident plane pair
  (dynamic 8-aligned sublane slice + ``pltpu.roll`` lane alignment —
  the two dynamic-addressing primitives Mosaic actually supports; lane
  slicing and ``dynamic_gather`` measured unusable), z-lerps the pair
  (trilinear = linear in z, hoisted before the in-plane stages), and
  evaluates the bilinear in-plane filter as one small MXU matmul
  (``brick @ tentᵀ``) plus a tent-weighted sublane reduction — exact
  trilinear at exact per-pixel positions, ~0.4 ns/ray-sample measured.
* **Streaming.** Planes stream HBM→VMEM through a 4-slot async-copy
  ring; rays are processed in megatiles whose accumulators live in
  VMEM, so the volume is read ~(num_megatiles) times per frame
  (~1-2 GB at 1080p/250³) instead of once per gather.
* **Transfer function without gathers.** The TF is evaluated from its
  control points as a sum of hinge functions (piecewise-linear ⇒
  ``base + Σ slopeᵢ·relu(u − knotᵢ)``) — mathematically the *exact*
  control-point function, i.e. what the reference's 256-bin LUT
  texture (DvrShader.glsl transferFunction sampling) approximates.
* **Early termination.** A subtile whose accumulated alpha saturates
  skips all remaining planes (the reference's per-ray > 0.99 exit,
  DvrShader.glsl:103-125, at tile granularity).

Per-sample semantics match render/dvr.py::dvr_composite (reference
Data/Shaders/Renderers/DVR/DvrShader.glsl:70-140): trilinear sample →
TF → ``alpha = 1 − exp(−tf_a·Δt·attenuation)`` → front-to-back OVER,
with Δt the true per-ray distance between consecutive plane
sub-steps (Δt = voxel_a/(q·|d_a|)). The quadrature abscissae differ
from the fixed-dt marcher (plane-anchored vs ray-anchored t-grid);
with ``q`` chosen to match the reference step density both are
equal-density Riemann sums of the same integral (equality checked in
tests/test_raymarch.py and on silicon in bench.py).

The iso variant marches the same way, detecting the first sign change
of ``f = scalar − iso`` between consecutive sub-steps; the default
bisection solver then refines the crossing and takes ±1-voxel
central-difference gradients IN-KERNEL against the resident plane
ring (XLA gathers measured ~0.01 G samples/s — seconds per frame),
emitting (found, t_surf, ∇f) for a gather-free shading epilogue. The
other solvers (Marmitt / analytic-cubic / linear — render/iso.py)
receive the raw bracket and refine on the XLA side.

Unsupported inputs (mixed principal-axis direction signs, footprints
wider than the brick buckets, render restrictions, shared-depth
limits, closed surfaces) are reported via ``RaymarchUnsupported`` so
callers fall back to the XLA marchers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.pallas.common import on_tpu, round_up
from correrender_tpu.render.camera import default_render_box

_NAN_SENTINEL = 1e30
_NAN_THRESH = 1e20
_EXIT_ALPHA = 0.999

#: world axis index -> (Z, Y, X) array axis index
_WORLD_TO_ARR = {0: 2, 1: 1, 2: 0}


class RaymarchUnsupported(Exception):
    """Raised when the frame cannot ride the Pallas marcher."""


# ---------------------------------------------------------------------------
# Host-side preparation


def _forward(camera) -> np.ndarray:
    f = (np.asarray(camera.look_at_point, np.float64)
         - np.asarray(camera.position, np.float64))
    return f / np.linalg.norm(f)


def principal_axis(camera) -> int:
    return int(np.argmax(np.abs(_forward(camera))))


def prepare_raymarch_volume(volume, axis_world: int, flip: bool,
                            lane_axis_world: int):
    """Permute/flip/pad the scalar volume for the marcher.

    Returns a device array shaped ``(A, S, L)``: A = planes along the
    principal world axis (reversed when ``flip`` so plane order is
    front-to-back), L = the chosen in-plane lane axis padded to a
    multiple of 128 (+1 edge layer), S = the remaining axis padded to
    a multiple of 8 (+1). Padding replicates the edge (clamp-to-edge
    reads stay exact) and NaNs become a large sentinel so they can't
    poison the tent-weight matmuls (0·NaN = NaN, but 0·1e30 = 0 —
    samples whose support touches a NaN voxel exceed ``1e20`` and are
    handled per ``nan_mode`` exactly like the reference's NaN
    trilinear result).
    """
    vol = np.asarray(volume, np.float32)
    arr_a = _WORLD_TO_ARR[axis_world]
    arr_l = _WORLD_TO_ARR[lane_axis_world]
    arr_s = ({0, 1, 2} - {arr_a, arr_l}).pop()
    vol = np.transpose(vol, (arr_a, arr_s, arr_l))
    if flip:
        vol = vol[::-1]
    vol = np.where(np.isnan(vol), np.float32(_NAN_SENTINEL), vol)
    a, s, l = vol.shape
    sp = round_up(s + 1, 8)
    lp = round_up(l + 1, 128)
    vol = np.pad(vol, ((0, 0), (0, sp - s), (0, lp - l)), mode="edge")
    return jnp.asarray(vol)


def tf_hinges(tf, max_knots: int = 24):
    """Hinge decomposition of a piecewise-linear transfer function.

    ``value_ch(u) = base_ch + Σᵢ slope_ch,i · relu(u − knot_i)`` over
    the merged knot set of the color and opacity control points —
    exactly the control-point function the reference's LUT samples.
    Returns (knots (K,), params (4, K), base (4,)) float32 numpy.
    """
    color = tf.color_points or [(0.0, (0.0, 0.0, 0.0)),
                                (1.0, (1.0, 1.0, 1.0))]
    opacity = tf.opacity_points or [(0.0, 0.0), (1.0, 1.0)]
    knots = sorted({0.0} | {float(x) for x, _ in color}
                   | {float(x) for x, _ in opacity})
    if len(knots) > max_knots:
        raise RaymarchUnsupported(f"{len(knots)} TF knots > {max_knots}")

    def interp(points, u):
        xs = [float(p[0]) for p in points]
        vs = [np.atleast_1d(np.asarray(p[1], np.float64))
              for p in points]
        if u <= xs[0]:
            return vs[0]
        if u >= xs[-1]:
            return vs[-1]
        i = np.searchsorted(xs, u, side="right") - 1
        i = min(i, len(xs) - 2)
        span = xs[i + 1] - xs[i]
        w = 0.0 if span <= 0 else (u - xs[i]) / span
        return vs[i] * (1 - w) + vs[i + 1] * w

    def channel_values(u):
        rgb = interp(color, u)
        a = interp(opacity, u)
        return np.concatenate([rgb, a])

    ks = np.asarray(knots, np.float64)
    vals = np.stack([channel_values(u) for u in ks], axis=1)  # (4, K)
    base = vals[:, 0]
    # Slopes between consecutive knots; hinge slope i = seg slope
    # change at knot i (with the segment before knot 0 flat and the
    # one after the last knot flat, matching clamp semantics).
    seg = np.zeros((4, len(knots)), np.float64)
    for i in range(len(knots) - 1):
        span = ks[i + 1] - ks[i]
        seg[:, i] = 0.0 if span <= 0 else (
            (vals[:, i + 1] - vals[:, i]) / span)
    hinge = seg.copy()
    hinge[:, 1:] = seg[:, 1:] - seg[:, :-1]
    k = len(knots)
    kp = max(1, int(np.ceil(k / 4)) * 4)
    knots_p = np.full(kp, 2.0, np.float32)  # beyond u∈[0,1]: inert
    knots_p[:k] = ks.astype(np.float32)
    params = np.zeros((4, kp), np.float32)
    params[:, :k] = hinge.astype(np.float32)
    return knots_p, params, base.astype(np.float32)


def _corner_slopes(camera, width, height, axis_world, lane_axis_world,
                   sub_axis_world, flip, voxel, m_rot=None,
                   tile_h=8, tile_w=128):
    """Per-subtile slope extrema from tile-corner rays.

    ``d_u/d_a`` over a pixel rectangle is a Möbius function of each
    pixel coordinate (directions are affine in px/py), so — poles
    excluded via the sign check in :func:`plan_raymarch` — its extrema
    over a tile sit at the tile's corners. Corner rays are ~2k numpy
    evaluations instead of 2M.
    """
    from correrender_tpu.render.camera import ray_dirs_affine

    e0, ex, ey = (np.asarray(v, np.float64)
                  for v in ray_dirs_affine(camera, width, height))
    if m_rot is not None:
        e0, ex, ey = (m_rot @ e0, m_rot @ ex, m_rot @ ey)
    hp, wp = round_up(height, tile_h), round_up(width, tile_w)
    # Clamp corner coordinates to the real image: padded-region rays
    # are masked inactive in the kernel, and their extrapolated
    # directions can approach the principal-axis pole (blowing the
    # slope bounds up for nothing).
    gy = np.minimum(np.arange(0, hp + 1, tile_h, np.float64),
                    float(height))
    gx = np.minimum(np.arange(0, wp + 1, tile_w, np.float64),
                    float(width))
    px = gx[None, :, None]
    py = gy[:, None, None]
    d = e0[None, None] + ex[None, None] * px + ey[None, None] * py
    da = d[..., axis_world]
    sgn = -1.0 if flip else 1.0
    su = (d[..., sub_axis_world] / da) * sgn / voxel[sub_axis_world]
    sv = (d[..., lane_axis_world] / da) * sgn / voxel[lane_axis_world]
    if np.any(da == 0.0):
        raise RaymarchUnsupported("ray parallel to principal axis")

    def tile_minmax(g):
        c = np.stack([g[:-1, :-1], g[:-1, 1:], g[1:, :-1], g[1:, 1:]])
        return c.min(axis=0), c.max(axis=0)

    sumin, sumax = tile_minmax(su)
    svmin, svmax = tile_minmax(sv)
    return sumin, sumax, svmin, svmax


def plan_raymarch(camera, volume_shape, image_size, box=None, q=4,
                  max_bu=128, max_bv=256, model_matrix=None):
    """Static plan: axis selection, brick sizes, subtile bounds.

    Raises :class:`RaymarchUnsupported` when the frame needs a brick
    beyond the supported buckets (extreme zoom-out) or rays straddle
    the principal-axis pole (extreme FOV) — callers fall back to the
    XLA marcher.
    """
    zs, ys, xs = volume_shape
    if box is None:
        box = default_render_box(volume_shape)
    box_min = np.asarray(box[0], np.float64)
    box_max = np.asarray(box[1], np.float64)
    dims_world = {0: xs, 1: ys, 2: zs}
    voxel = (box_max - box_min) / np.asarray([xs, ys, zs], np.float64)

    # Optional model transform: rays are pulled into model space with
    # its inverse (render/dvr.py's model_matrix semantics) — the plan,
    # the per-ray fields, and the march all live in model space.
    if model_matrix is not None:
        minv = np.linalg.inv(
            np.asarray(model_matrix, np.float64).reshape(4, 4))
        m_rot, m_trans = minv[:3, :3], minv[:3, 3]
    else:
        m_rot, m_trans = np.eye(3), np.zeros(3)
    forward = m_rot @ _forward(camera)
    forward = forward / np.linalg.norm(forward)
    a = int(np.argmax(np.abs(forward)))
    flip = bool(forward[a] < 0)
    in_plane = [w for w in range(3) if w != a]
    width, height = image_size

    best = None
    for lane_axis in in_plane:
        sub_axis = in_plane[0] if lane_axis == in_plane[1] else in_plane[1]
        try:
            sumin, sumax, svmin, svmax = _corner_slopes(
                camera, width, height, a, lane_axis, sub_axis, flip,
                voxel, m_rot)
        except RaymarchUnsupported:
            raise
        # γ extremes over the box (world dist along axis a from eye to
        # nearest/farthest plane).
        o_model = (m_rot @ np.asarray(camera.position, np.float64)
                   + m_trans)
        o_a = float(o_model[a])
        g_ends = np.asarray(
            [box_min[a] - o_a, box_max[a] - o_a], np.float64)
        if flip:
            g_ends = -g_ends
        g_lo, g_hi = float(g_ends.min()), float(g_ends.max())
        # Worst-case per-tile footprints (+1 slab of γ travel + filter
        # support + alignment slack).
        ga = abs(voxel[a])

        def worst(dmin, dmax):
            spans = []
            # ±ga: the iso refinement extends one slab below the
            # current one and gradients reach ±grad_eps voxels.
            for g in (g_lo - ga, g_hi - ga, g_lo + ga, g_hi + ga):
                spans.append(np.max(np.abs(g) * (dmax - dmin)))
            return max(max(spans), 0.0)

        bu_need = worst(sumin, sumax) + 5 + 8  # +8 sublane alignment
        bv_need = worst(svmin, svmax) + 5 + 1
        cand = (bu_need + bv_need, lane_axis, sub_axis,
                (sumin, sumax, svmin, svmax), bu_need, bv_need)
        if best is None or cand[0] < best[0]:
            best = cand
    _, lane_axis, sub_axis, bounds4, bu_need, bv_need = best
    bu = int(round_up(int(math.ceil(bu_need)), 8))
    bv = max(16, int(2 ** math.ceil(math.log2(max(bv_need, 1)))))
    if bu > max_bu or bv > max_bv:
        raise RaymarchUnsupported(
            f"brick {bu}x{bv} exceeds buckets ({max_bu}x{max_bv})")
    return {
        "axis_world": a,
        "flip": flip,
        "lane_axis": lane_axis,
        "sub_axis": sub_axis,
        "bu": bu,
        "bv": bv,
        "q": int(q),
        "box_min": box_min,
        "box_max": box_max,
        "voxel": voxel,
        "bounds4": tuple(np.asarray(b, np.float32) for b in bounds4),
        "planes": dims_world[a],
        "sub_extent": dims_world[sub_axis],
        "lane_extent": dims_world[lane_axis],
        "m_rot": m_rot,
        "m_trans": m_trans,
    }


# ---------------------------------------------------------------------------
# Device-side per-ray setup (jitted, runs once per camera/frame)


def _ray_fields_core(inv_view, inv_proj, box_min, box_max, voxel_asl,
                     m_rot, m_trans,
                     width: int, height: int, plan_key):
    """Per-ray (T, 8, 128) arrays: SU, SV, inv_da, t_start, t_far.

    Traced helper inlined into the _dvr_core/_iso_core jits.

    ``plan_key`` = (axis_world, lane_axis, sub_axis, flip).
    """
    from correrender_tpu.render.camera import _rays_core
    from correrender_tpu.render.sampling import ray_box_intersect

    axis_world, lane_axis, sub_axis, flip = plan_key
    origin, dirs = _rays_core(inv_view, inv_proj, width, height)
    # Model transform (identity by default): HIGHEST precision — the
    # TPU bf16 matmul default visibly shifts rays (see dvr_render).
    origin = jnp.einsum("ij,j->i", m_rot, origin,
                        precision=jax.lax.Precision.HIGHEST) + m_trans
    dirs = jnp.einsum("ij,...j->...i", m_rot, dirs,
                      precision=jax.lax.Precision.HIGHEST)
    t_near, t_far, hit = ray_box_intersect(origin, dirs, box_min, box_max)
    t_start = jnp.maximum(t_near, 0.0)
    t_far = jnp.where(hit, t_far, t_start - 1.0)  # miss: empty range
    sgn = -1.0 if flip else 1.0
    da = dirs[..., axis_world] * sgn
    inv_da = 1.0 / da
    # Position along the ray at march distance γ:
    # p_u = o_u + t·d_u = o_u + γ·(d_u·inv_da) — inv_da already
    # carries the flip sign, so no extra sgn here.
    su = dirs[..., sub_axis] * inv_da / voxel_asl[1]
    sv = dirs[..., lane_axis] * inv_da / voxel_asl[2]

    hp, wp = round_up(height, 8), round_up(width, 128)

    def tiles(x, fill):
        x = jnp.pad(x, ((0, hp - height), (0, wp - width)),
                    constant_values=fill)
        x = x.reshape(hp // 8, 8, wp // 128, 128)
        return x.transpose(0, 2, 1, 3).reshape(-1, 8, 128)

    # dead = 1 where the ray misses the box — the skip tests treat
    # dead rays as finished so edge subtiles can saturate/early-exit.
    dead = tiles(jnp.where(hit, 0.0, 1.0), 1.0)
    su_t = tiles(su, 0.0)
    sv_t = tiles(sv, 0.0)
    invda_t = tiles(inv_da, 1.0)
    t0_t = tiles(t_start, 0.0)
    t1_t = tiles(t_far, -1.0)
    # Per-subtile slab-index range [klo, khi] that any live ray's
    # [t0, t1] overlaps: γ = t·da', slab kk covers γ ∈
    # (g0 + (kk-1)·gk, g0 + kk·gk]. Dead rays contribute nothing.
    da_t = 1.0 / invda_t
    g_enter = jnp.where(dead > 0.5, jnp.inf, t0_t * da_t)
    g_exit = jnp.where(dead > 0.5, -jnp.inf, t1_t * da_t)
    gmin = jnp.min(g_enter.reshape(g_enter.shape[0], -1), axis=1)
    gmax = jnp.max(g_exit.reshape(g_exit.shape[0], -1), axis=1)
    return (su_t, sv_t, invda_t, t0_t, t1_t, dead, gmin, gmax)


# ---------------------------------------------------------------------------
# Kernels


def _make_dvr_kernel(ns: int, planes: int, bu: int, bv: int, q: int,
                     lp: int, sp: int, kq: int, nan_mode: str,
                     has_dlim: bool = False,
                     restriction: str | None = None):
    """DVR megatile kernel body. Grid = (num_megatiles,).

    ``kq`` = hinge count; knot positions/slopes/bases are traced (SMEM
    ``tfp_ref``) so interactive TF edits do NOT recompile. The
    sub-step loop is a ``fori_loop`` (one traced body) — unrolling it
    multiplied Mosaic compile time by q.
    """

    def kernel(par_ref,  # SMEM (1, 20) f32 scalars
               tfp_ref,  # SMEM (5, 1+kq): r0 = [pad, knots...];
               #            r1..r4 = [base_ch, slopes...]
               bnd_ref,  # SMEM (ns, 4) f32 subtile slope extrema
               kr_ref,  # SMEM (ns, 2) i32 slab-index windows
               su_ref, sv_ref, invda_ref, t0_ref, t1_ref,  # VMEM (ns,8,128)
               dead_ref,  # VMEM (ns,8,128): 1 = ray misses the box
               *rest):  # [dlim_ref] vol_hbm out_ref slab sem
        if has_dlim:
            # Shared per-view depth buffer (world eye distances) —
            # samples at or beyond it are skipped, the reference's
            # depth-buffer clip (DvrShader.glsl depth test).
            dlim_ref, vol_hbm, out_ref, slab, sem = rest
        else:
            dlim_ref = None
            vol_hbm, out_ref, slab, sem = rest
        g0 = par_ref[0, 0]
        gk = par_ref[0, 1]
        gs = par_ref[0, 2]
        u_max = par_ref[0, 3]   # sub-axis clamp (extent-1)
        v_max = par_ref[0, 4]   # lane-axis clamp
        u0c = par_ref[0, 5]     # camera-constant base coords
        v0c = par_ref[0, 6]
        atten = par_ref[0, 7]
        vmin = par_ref[0, 8]
        inv_vspan = par_ref[0, 9]
        dt_unit = par_ref[0, 10]  # voxel_a / q (world units)
        if restriction is not None:
            # Render-restriction ball: [γ_center, c_sub, c_lane
            # (voxel coords), radius, voxel_sub, voxel_lane(world)].
            r_gc = par_ref[0, 11]
            r_cs = par_ref[0, 12]
            r_cl = par_ref[0, 13]
            r_rad = par_ref[0, 14]
            vox_s = par_ref[0, 15]
            vox_l = par_ref[0, 16]

        iou = jax.lax.broadcasted_iota(
            jnp.int32, (bu, 1), 0).astype(jnp.float32)
        iov = jax.lax.broadcasted_iota(
            jnp.int32, (bv, 1), 0).astype(jnp.float32)

        def dma(p, slot):
            return pltpu.make_async_copy(
                vol_hbm.at[p], slab.at[slot], sem.at[slot])

        dma(0, 0).start()
        if planes > 1:
            dma(1, 1).start()
        for ch in range(4):
            out_ref[ch] = jnp.zeros((ns, 8, 128), jnp.float32)

        def plane_step(kk, _):
            # Planes for slab kk: lo = clip(kk-1), hi = clip(kk).
            lo = jnp.maximum(kk - 1, 0)
            hi = jnp.minimum(kk, planes - 1)

            @pl.when(kk <= planes - 1)
            def _():
                dma(kk, kk % 4).wait()

            @pl.when(kk + 2 <= planes - 1)
            def _():
                dma(kk + 2, (kk + 2) % 4).start()

            kf = (kk - 1).astype(jnp.float32)

            def subtile(j, _c):
                # Skip planes outside the subtile's slab window and
                # subtiles whose live rays have all saturated (dead
                # rays count as done so edge tiles can exit early).
                acc_a = out_ref[3, pl.ds(j, 1)].reshape(8, 128)
                dead = dead_ref[pl.ds(j, 1)].reshape(8, 128)
                in_range = (kk >= kr_ref[j, 0]) & (kk <= kr_ref[j, 1])
                not_done = (jnp.min(jnp.maximum(acc_a, dead))
                            < _EXIT_ALPHA)

                @pl.when(in_range & not_done)
                def _():
                    sumin = bnd_ref[j, 0]
                    sumax = bnd_ref[j, 1]
                    svmin = bnd_ref[j, 2]
                    svmax = bnd_ref[j, 3]
                    g_a = g0 + kf * gk
                    g_b = g_a + gk  # slab's γ span (all q substeps)

                    def lohi(dmin, dmax, base):
                        lo1 = jnp.minimum(g_a * dmin, g_a * dmax)
                        lo2 = jnp.minimum(g_b * dmin, g_b * dmax)
                        return base + jnp.minimum(lo1, lo2)

                    ulo = jnp.clip(lohi(sumin, sumax, u0c), 0.0, u_max)
                    vlo = jnp.clip(lohi(svmin, svmax, v0c), 0.0, v_max)
                    u0i = jnp.clip(
                        (jnp.floor(ulo).astype(jnp.int32) - 1) // 8 * 8,
                        0, sp - bu)
                    u0i = pl.multiple_of(u0i, 8)
                    v0i = jnp.maximum(
                        jnp.floor(vlo).astype(jnp.int32) - 1, 0)
                    shift = (lp - v0i) % lp
                    # Roll once, mix per sub-step (roll is linear).
                    b_lo = pltpu.roll(
                        slab[pl.ds(lo % 4, 1),
                             pl.ds(u0i, bu), :].reshape(bu, lp),
                        shift=shift, axis=1)[:, :bv]
                    b_hi = pltpu.roll(
                        slab[pl.ds(hi % 4, 1),
                             pl.ds(u0i, bu), :].reshape(bu, lp),
                        shift=shift, axis=1)[:, :bv]
                    u0f = u0i.astype(jnp.float32)
                    v0f = v0i.astype(jnp.float32)

                    su = su_ref[pl.ds(j, 1)].reshape(8, 128)
                    sv = sv_ref[pl.ds(j, 1)].reshape(8, 128)
                    invda = invda_ref[pl.ds(j, 1)].reshape(8, 128)
                    t0 = t0_ref[pl.ds(j, 1)].reshape(8, 128)
                    t1 = t1_ref[pl.ds(j, 1)].reshape(8, 128)
                    if has_dlim:
                        t1 = jnp.minimum(
                            t1, dlim_ref[pl.ds(j, 1)].reshape(8, 128))
                    dt = dt_unit * jnp.abs(invda)

                    def substep(s, carry):
                        acc_r, acc_g, acc_b, a_cur = carry
                        sf = s.astype(jnp.float32)
                        wz = (sf + 0.5) * jnp.float32(1.0 / q)
                        brick = (1.0 - wz) * b_lo + wz * b_hi
                        gamma = g0 + kf * gk + sf * gs
                        vals = []
                        rmasks = []
                        for r in range(8):
                            raw_u = u0c + gamma * su[r:r + 1, :]
                            raw_v = v0c + gamma * sv[r:r + 1, :]
                            ug = jnp.clip(raw_u, 0.0, u_max) - u0f
                            vg = jnp.clip(raw_v, 0.0, v_max) - v0f
                            wv = jnp.maximum(
                                1.0 - jnp.abs(vg - iov), 0.0)
                            rt = jax.lax.dot_general(
                                brick, wv,
                                dimension_numbers=(
                                    ((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                            wu = jnp.maximum(
                                1.0 - jnp.abs(ug - iou), 0.0)
                            vals.append(jnp.sum(
                                rt * wu, axis=0, keepdims=True))
                            if restriction is not None:
                                # Per-sample ball test, world metric
                                # (RenderRestriction.glsl semantics).
                                d_a = jnp.abs(gamma - r_gc)
                                d_s = jnp.abs(raw_u - r_cs) * vox_s
                                d_l = jnp.abs(raw_v - r_cl) * vox_l
                                if restriction == "chebyshev":
                                    dist = jnp.maximum(
                                        jnp.maximum(d_s, d_l), d_a)
                                    rmasks.append(dist <= r_rad)
                                else:
                                    sq = (d_a * d_a + d_s * d_s
                                          + d_l * d_l)
                                    rmasks.append(
                                        sq <= r_rad * r_rad)
                        val = jnp.concatenate(vals, axis=0)  # (8,128)
                        t = gamma * invda
                        active = (t >= t0) & (t <= t1)
                        if restriction is not None:
                            active = active & jnp.concatenate(
                                rmasks, axis=0)
                        is_nan = val > _NAN_THRESH
                        u = jnp.clip(
                            (val - vmin) * inv_vspan, 0.0, 1.0)
                        # Hinge TF: base + Σ slope·relu(u − knot) —
                        # the exact piecewise-linear control-point
                        # function; relus shared across channels.
                        hinges = [jnp.maximum(u - tfp_ref[0, 1 + i],
                                              0.0)
                                  for i in range(kq)]
                        rgba = []
                        for ch in range(4):
                            acc = jnp.full_like(u, tfp_ref[1 + ch, 0])
                            for i in range(kq):
                                acc = acc + (tfp_ref[1 + ch, 1 + i]
                                             * hinges[i])
                            rgba.append(acc)
                        tf_r, tf_g, tf_b, tf_a = rgba
                        if nan_mode == "yellow":
                            tf_r = jnp.where(is_nan, 1.0, tf_r)
                            tf_g = jnp.where(is_nan, 1.0, tf_g)
                            tf_b = jnp.where(is_nan, 0.0, tf_b)
                            tf_a = jnp.where(is_nan, 1.0, tf_a)
                        else:
                            tf_a = jnp.where(is_nan, 0.0, tf_a)
                        alpha = (1.0 - jnp.exp(
                            -tf_a * dt * atten))
                        alpha = jnp.where(active, alpha, 0.0)
                        w8 = (1.0 - a_cur) * alpha
                        return (acc_r + w8 * tf_r,
                                acc_g + w8 * tf_g,
                                acc_b + w8 * tf_b,
                                a_cur + w8)

                    acc_r, acc_g, acc_b, a_cur = jax.lax.fori_loop(
                        0, q, substep,
                        (out_ref[0, pl.ds(j, 1)].reshape(8, 128),
                         out_ref[1, pl.ds(j, 1)].reshape(8, 128),
                         out_ref[2, pl.ds(j, 1)].reshape(8, 128),
                         acc_a))
                    out_ref[0, pl.ds(j, 1)] = acc_r.reshape(1, 8, 128)
                    out_ref[1, pl.ds(j, 1)] = acc_g.reshape(1, 8, 128)
                    out_ref[2, pl.ds(j, 1)] = acc_b.reshape(1, 8, 128)
                    out_ref[3, pl.ds(j, 1)] = a_cur.reshape(1, 8, 128)
                return _c

            jax.lax.fori_loop(0, ns, subtile, 0)
            return 0

        jax.lax.fori_loop(0, planes + 1, plane_step, 0)

    return kernel


def _make_iso_kernel(ns: int, planes: int, bu: int, bv: int, q: int,
                     lp: int, sp: int, refine_steps: int = 8,
                     grad_eps: float = 1.0):
    """Iso first-hit kernel with in-kernel refinement.

    Outputs 5 channels: (found, t_surf, gA, gS, gL) when
    ``refine_steps > 0`` — the crossing is bisected to
    ``gs/2^refine_steps`` and ±1-voxel central-difference gradients
    are taken at the refined point, all against the VMEM-resident
    plane ring (XLA-side refinement gathers measured ~0.01 G
    samples/s — seconds per frame at 1080p; in-kernel it rides the
    same brick pipeline as the march). With ``refine_steps == 0``
    channels 2-4 hold the raw bracket (f_prev, f_cur, 0) for the XLA
    solvers (marmitt / analytic / linear).

    The plane ring holds SIX slots and the wait runs one plane ahead
    (iteration kk waits plane kk+1) so the refinement's 5-plane z-tent
    {kk-3..kk+1} is resident; all loops (sub-steps, bisection,
    gradient axes) are fori_loops so each traced body lowers once.

    Mosaic compile of the refined kernel takes ~2-3 min per static
    configuration on this host (the DVR kernel ~7 s); the persistent
    XLA compile cache (utils/compile_cache.py, enabled by the CLI and
    bench) makes it a one-time cost per (volume shape, image size,
    axis, q) combination.
    """

    def kernel(par_ref, bnd_ref, kr_ref,
               su_ref, sv_ref, invda_ref, t0_ref, t1_ref, dead_ref,
               vol_hbm, out_ref, slab, prev_ref, sem):
        g0 = par_ref[0, 0]
        gk = par_ref[0, 1]
        gs = par_ref[0, 2]
        u_max = par_ref[0, 3]
        v_max = par_ref[0, 4]
        u0c = par_ref[0, 5]
        v0c = par_ref[0, 6]
        iso = par_ref[0, 7]
        g0p = par_ref[0, 8]      # γ of plane 0 center
        inv_ga = par_ref[0, 9]   # 1 / gk

        iou = jax.lax.broadcasted_iota(
            jnp.int32, (bu, 1), 0).astype(jnp.float32)
        iov = jax.lax.broadcasted_iota(
            jnp.int32, (bv, 1), 0).astype(jnp.float32)

        def dma(p, slot):
            return pltpu.make_async_copy(
                vol_hbm.at[p], slab.at[slot], sem.at[slot])

        dma(0, 0).start()
        if planes > 1:
            dma(1, 1).start()
        # Plane 0 must be resident before iteration 0; thereafter the
        # wait runs one plane AHEAD (iteration kk waits plane kk+1).
        dma(0, 0).wait()
        for ch in range(5):
            out_ref[ch] = jnp.zeros((ns, 8, 128), jnp.float32)
        # prev sample f-value; sentinel marks "no previous sample yet".
        prev_ref[:] = jnp.full((ns, 8, 128), _NAN_SENTINEL, jnp.float32)

        def plane_step(kk, _):
            lo = jnp.maximum(kk - 1, 0)
            hi = jnp.minimum(kk, planes - 1)

            @pl.when(kk + 1 <= planes - 1)
            def _():
                dma(kk + 1, (kk + 1) % 6).wait()

            kf = (kk - 1).astype(jnp.float32)

            def subtile(j, _c):
                found = out_ref[0, pl.ds(j, 1)].reshape(8, 128)
                dead = dead_ref[pl.ds(j, 1)].reshape(8, 128)
                in_range = (kk >= kr_ref[j, 0]) & (kk <= kr_ref[j, 1])
                not_done = jnp.min(jnp.maximum(found, dead)) < 0.5

                @pl.when(in_range & not_done)
                def _():
                    sumin = bnd_ref[j, 0]
                    sumax = bnd_ref[j, 1]
                    svmin = bnd_ref[j, 2]
                    svmax = bnd_ref[j, 3]
                    # Brick bounds cover one slab BELOW the current one
                    # (the refinement bracket reaches γ_hit − gs) plus
                    # the plan's slack for the ±grad_eps offsets.
                    g_a = g0 + kf * gk - gk
                    g_b = g0 + kf * gk + gk

                    def lohi(dmin, dmax, base):
                        lo1 = jnp.minimum(g_a * dmin, g_a * dmax)
                        lo2 = jnp.minimum(g_b * dmin, g_b * dmax)
                        return base + jnp.minimum(lo1, lo2)

                    ulo = jnp.clip(lohi(sumin, sumax, u0c), 0.0, u_max)
                    vlo = jnp.clip(lohi(svmin, svmax, v0c), 0.0, v_max)
                    u0i = jnp.clip(
                        (jnp.floor(ulo).astype(jnp.int32) - 2) // 8 * 8,
                        0, sp - bu)
                    u0i = pl.multiple_of(u0i, 8)
                    v0i = jnp.maximum(
                        jnp.floor(vlo).astype(jnp.int32) - 2, 0)
                    shift = (lp - v0i) % lp
                    u0f = u0i.astype(jnp.float32)
                    v0f = v0i.astype(jnp.float32)

                    def brick_for(slot):
                        rows = slab[pl.ds(slot, 1),
                                    pl.ds(u0i, bu), :].reshape(bu, lp)
                        return pltpu.roll(
                            rows, shift=shift, axis=1)[:, :bv]

                    b_lo = brick_for(lo % 6)
                    b_hi = brick_for(hi % 6)

                    su = su_ref[pl.ds(j, 1)].reshape(8, 128)
                    sv = sv_ref[pl.ds(j, 1)].reshape(8, 128)
                    invda = invda_ref[pl.ds(j, 1)].reshape(8, 128)
                    t0 = t0_ref[pl.ds(j, 1)].reshape(8, 128)
                    t1 = t1_ref[pl.ds(j, 1)].reshape(8, 128)

                    def sample_tile(brick, gamma):
                        """Bilinear tile sample from one z-mixed brick
                        at scalar γ (the march's fast path)."""
                        vals = []
                        for r in range(8):
                            ug = jnp.clip(
                                u0c + gamma * su[r:r + 1, :],
                                0.0, u_max) - u0f
                            vg = jnp.clip(
                                v0c + gamma * sv[r:r + 1, :],
                                0.0, v_max) - v0f
                            wv = jnp.maximum(
                                1.0 - jnp.abs(vg - iov), 0.0)
                            rt = jax.lax.dot_general(
                                brick, wv,
                                dimension_numbers=(
                                    ((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                            wu = jnp.maximum(
                                1.0 - jnp.abs(ug - iou), 0.0)
                            vals.append(jnp.sum(
                                rt * wu, axis=0, keepdims=True))
                        return jnp.concatenate(vals, axis=0)

                    def substep(s, carry):
                        fnd, t_hit, f_lo, f_hi, prev = carry
                        sf = s.astype(jnp.float32)
                        wz = (sf + 0.5) * jnp.float32(1.0 / q)
                        brick = (1.0 - wz) * b_lo + wz * b_hi
                        gamma = g0 + kf * gk + sf * gs
                        val = sample_tile(brick, gamma)
                        t = gamma * invda
                        active = ((t >= t0) & (t <= t1)
                                  & (val < _NAN_THRESH))
                        f = val - iso
                        have_prev = prev < _NAN_THRESH
                        crossing = (active & have_prev & ~(fnd > 0.5)
                                    & ((f >= 0.0)
                                       != (prev >= 0.0)))
                        t_hit = jnp.where(crossing, t, t_hit)
                        f_lo = jnp.where(crossing, prev, f_lo)
                        f_hi = jnp.where(crossing, f, f_hi)
                        fnd = jnp.where(crossing, 1.0, fnd)
                        prev = jnp.where(active, f, prev)
                        return fnd, t_hit, f_lo, f_hi, prev

                    fnd, t_hit, f_lo, f_hi, prev = jax.lax.fori_loop(
                        0, q, substep,
                        (found,
                         out_ref[1, pl.ds(j, 1)].reshape(8, 128),
                         out_ref[2, pl.ds(j, 1)].reshape(8, 128),
                         out_ref[3, pl.ds(j, 1)].reshape(8, 128),
                         prev_ref[pl.ds(j, 1)].reshape(8, 128)))

                    new_cross = (fnd > 0.5) & ~(found > 0.5)

                    if refine_steps > 0:
                        # 5-plane brick stack for the refinement: one
                        # batched matmul per row covers nominal planes
                        # kk-3..kk+1 (zero z-tent weight neutralizes
                        # clipped/mismatched edges).
                        stack = jnp.concatenate(
                            [brick_for(jnp.clip(kk - 3 + i, 0,
                                                planes - 1) % 6)
                             for i in range(5)], axis=0)  # (5bu, bv)
                        kf3 = (kk - 3).astype(jnp.float32)

                        def sample_ray(gamma_v, du, dv, dz):
                            """Trilinear at per-ray γ (+voxel offsets)
                            via a z-tent over the 5-brick stack."""
                            zg = jnp.clip(
                                (gamma_v - g0p) * inv_ga + dz,
                                0.0, float(planes - 1))
                            vals = []
                            for r in range(8):
                                gr = gamma_v[r:r + 1, :]
                                zr = zg[r:r + 1, :] - kf3
                                ug = jnp.clip(
                                    u0c + gr * su[r:r + 1, :] + du,
                                    0.0, u_max) - u0f
                                vg = jnp.clip(
                                    v0c + gr * sv[r:r + 1, :] + dv,
                                    0.0, v_max) - v0f
                                wv = jnp.maximum(
                                    1.0 - jnp.abs(vg - iov), 0.0)
                                wu = jnp.maximum(
                                    1.0 - jnp.abs(ug - iou), 0.0)
                                rt = jax.lax.dot_general(
                                    stack, wv,
                                    dimension_numbers=(
                                        ((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=(
                                        jax.lax.Precision.HIGHEST))
                                # z-tent per plane × u-tent reduction,
                                # static (bu, 128) slices of the
                                # stacked matmul result.
                                acc = jnp.zeros((1, 128), jnp.float32)
                                for i5 in range(5):
                                    wzp = jnp.maximum(
                                        1.0 - jnp.abs(
                                            zr - jnp.float32(i5)),
                                        0.0)
                                    part = jnp.sum(
                                        rt[i5 * bu:(i5 + 1) * bu]
                                        * wu, axis=0, keepdims=True)
                                    acc = acc + wzp * part
                                vals.append(acc)
                            return jnp.concatenate(vals, axis=0)

                        @pl.when(jnp.max(new_cross.astype(
                            jnp.float32)) > 0.0)
                        def _():
                            da = 1.0 / invda
                            gam_hi0 = t_hit * da
                            zero = jnp.float32(0.0)

                            def bisect(_i, st):
                                gam_lo, gam_hi, fl, fh = st
                                gm = 0.5 * (gam_lo + gam_hi)
                                fm = sample_ray(gm, zero, zero,
                                                zero) - iso
                                same = (fm >= 0.0) == (fl >= 0.0)
                                return (
                                    jnp.where(same, gm, gam_lo),
                                    jnp.where(same, gam_hi, gm),
                                    jnp.where(same, fm, fl),
                                    jnp.where(same, fh, fm))

                            gam_lo, gam_hi, _fl, _fh = (
                                jax.lax.fori_loop(
                                    0, refine_steps, bisect,
                                    (gam_hi0 - gs, gam_hi0,
                                     f_lo, f_hi)))
                            g_star = 0.5 * (gam_lo + gam_hi)
                            e = jnp.float32(grad_eps)

                            def grad_axis(i, acc):
                                ga_, gs_, gl_ = acc
                                du = jnp.where(i == 1, e, 0.0)
                                dv = jnp.where(i == 2, e, 0.0)
                                dz = jnp.where(i == 0, e, 0.0)
                                diff = (
                                    sample_ray(g_star, du, dv, dz)
                                    - sample_ray(g_star, -du, -dv,
                                                 -dz))
                                ga_ = jnp.where(i == 0, diff, ga_)
                                gs_ = jnp.where(i == 1, diff, gs_)
                                gl_ = jnp.where(i == 2, diff, gl_)
                                return ga_, gs_, gl_

                            z8 = jnp.zeros((8, 128), jnp.float32)
                            g_a, g_s, g_l = jax.lax.fori_loop(
                                0, 3, grad_axis, (z8, z8, z8))
                            t_srf = g_star * invda
                            out_ref[1, pl.ds(j, 1)] = jnp.where(
                                new_cross, t_srf,
                                t_hit).reshape(1, 8, 128)
                            out_ref[2, pl.ds(j, 1)] = jnp.where(
                                new_cross, g_a,
                                f_lo).reshape(1, 8, 128)
                            out_ref[3, pl.ds(j, 1)] = jnp.where(
                                new_cross, g_s,
                                f_hi).reshape(1, 8, 128)
                            out_ref[4, pl.ds(j, 1)] = jnp.where(
                                new_cross, g_l,
                                out_ref[4, pl.ds(j, 1)].reshape(
                                    8, 128)).reshape(1, 8, 128)

                        @pl.when(jnp.max(new_cross.astype(
                            jnp.float32)) <= 0.0)
                        def _():
                            out_ref[1, pl.ds(j, 1)] = t_hit.reshape(
                                1, 8, 128)
                    else:
                        out_ref[1, pl.ds(j, 1)] = t_hit.reshape(
                            1, 8, 128)
                        out_ref[2, pl.ds(j, 1)] = f_lo.reshape(
                            1, 8, 128)
                        out_ref[3, pl.ds(j, 1)] = f_hi.reshape(
                            1, 8, 128)
                    out_ref[0, pl.ds(j, 1)] = fnd.reshape(1, 8, 128)
                    prev_ref[pl.ds(j, 1)] = prev.reshape(1, 8, 128)
                return _c

            jax.lax.fori_loop(0, ns, subtile, 0)

            @pl.when(kk + 2 <= planes - 1)
            def _():
                dma(kk + 2, (kk + 2) % 6).start()

            return 0

        jax.lax.fori_loop(0, planes + 1, plane_step, 0)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers


def _common_params(plan, camera, q):
    """γ decomposition + camera-constant in-plane base coordinates.

    γ is the world distance travelled along the (flip-corrected)
    principal axis: ``t = γ · inv_da`` with ``inv_da = 1/(d_a·sgn)``.
    Plane i's voxel-center coordinate sits at γ_i = g0_plane + i·ga;
    slab k's subsample s sits between plane centers k and k+1 at
    γ(k, s) = g0 + k·ga + s·(ga/q), g0 = g0_plane + 0.5·ga/q.
    """
    a = plan["axis_world"]
    voxel = plan["voxel"]
    o = (plan["m_rot"] @ np.asarray(camera.position, np.float64)
         + plan["m_trans"])
    box_min, box_max = plan["box_min"], plan["box_max"]
    ga = float(abs(voxel[a]))
    if plan["flip"]:
        z0 = float(box_max[a]) - 0.5 * ga  # plane 0 center (mirrored)
        g0_plane = float(o[a]) - z0
    else:
        z0 = float(box_min[a]) + 0.5 * ga
        g0_plane = z0 - float(o[a])
    g_base = g0_plane + 0.5 * ga / q
    su_axis = plan["sub_axis"]
    lv_axis = plan["lane_axis"]
    # Camera-constant in-plane base coords (voxel units, cell centers).
    u0c = ((o[su_axis] - box_min[su_axis]) / voxel[su_axis]) - 0.5
    v0c = ((o[lv_axis] - box_min[lv_axis]) / voxel[lv_axis]) - 0.5
    return g_base, ga, ga / q, float(u0c), float(v0c), float(g0_plane)


def _subtile_bounds(plan):
    sumin, sumax, svmin, svmax = plan["bounds4"]
    b = np.stack([sumin.ravel(), sumax.ravel(),
                  svmin.ravel(), svmax.ravel()], axis=1)
    return np.ascontiguousarray(b, np.float32)


def _pad_tiles(arrs_fills, bounds, krange, ns):
    t = arrs_fills[0][0].shape[0]
    tp = round_up(max(t, 1), ns)
    if tp != t:
        pad = tp - t
        arrs = [jnp.concatenate(
            [x, jnp.full((pad, 8, 128), fill, x.dtype)], axis=0)
            for x, fill in arrs_fills]
        bounds = jnp.concatenate(
            [jnp.asarray(bounds), jnp.zeros((pad, 4), jnp.float32)],
            axis=0)
        krange = jnp.concatenate(
            [krange, jnp.broadcast_to(
                jnp.asarray([1, -1], jnp.int32), (pad, 2))], axis=0)
    else:
        arrs = [x for x, _ in arrs_fills]
    return arrs, bounds, krange, tp


def _krange(gmin, gmax, g0, gk, planes):
    """Per-subtile slab-index window [klo, khi] (int32, traced)."""
    klo = jnp.floor((gmin - g0) / gk).astype(jnp.int32)
    khi = (jnp.ceil((gmax - g0) / gk).astype(jnp.int32) + 1)
    klo = jnp.clip(jnp.where(jnp.isfinite(gmin), klo, planes + 1),
                   0, planes + 1)
    khi = jnp.clip(jnp.where(jnp.isfinite(gmax), khi, -1),
                   -1, planes)
    return jnp.stack([klo, khi], axis=1)


@functools.lru_cache(maxsize=32)
def _dvr_core(width, height, planes, sp, lp, q, bu, bv, ns, kq,
              nan_mode, plan_key, interpret, has_dlim=False,
              restriction=None):
    """One jitted program per static configuration: ray setup, tile
    padding, the Pallas march, and the image epilogue all fuse into a
    single dispatch — the eager chain costs ~25 ms of tunnel RTT per
    op on the axon link, which dwarfed the kernel itself (round-5
    measurement: frame time was independent of ray count before this).
    Camera, TF and attenuation arrive as traced values, so interaction
    never recompiles."""
    tiles_w = round_up(width, 128) // 128
    tiles_h = round_up(height, 8) // 8
    tp = round_up(max(tiles_h * tiles_w, 1), ns)
    n_mega = tp // ns

    kernel = _make_dvr_kernel(ns, planes, bu, bv, q, lp, sp, kq,
                              nan_mode, has_dlim=has_dlim,
                              restriction=restriction)

    def core(vol_prepared, inv_view, inv_proj, box_min, box_max,
             voxel_asl, m_rot, m_trans, params, tfp, bounds,
             *maybe_dlim):
        su, sv, invda, t0, t1, dead, gmin, gmax = _ray_fields_core(
            inv_view, inv_proj, box_min, box_max, voxel_asl,
            m_rot, m_trans, width, height, plan_key)
        krange = _krange(gmin, gmax, params[0, 0], params[0, 1],
                         planes)
        tile_arrs = [(su, 0.0), (sv, 0.0), (invda, 1.0),
                     (t0, 0.0), (t1, -1.0), (dead, 1.0)]
        if has_dlim:
            dlim = maybe_dlim[0]
            hp_, wp_ = round_up(height, 8), round_up(width, 128)
            dlim = jnp.pad(
                jnp.asarray(dlim, jnp.float32),
                ((0, hp_ - height), (0, wp_ - width)),
                constant_values=jnp.inf)
            dlim = dlim.reshape(hp_ // 8, 8, wp_ // 128, 128)
            dlim = dlim.transpose(0, 2, 1, 3).reshape(-1, 8, 128)
            tile_arrs.append((dlim, jnp.inf))
        (su, sv, invda, t0, t1, dead, *dl), bounds_p, krange, _ = \
            _pad_tiles(tile_arrs, bounds, krange, ns)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((4, tp, 8, 128),
                                           jnp.float32),
            grid=(n_mega,),
            in_specs=[
                pl.BlockSpec((1, 20), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((5, 1 + kq), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ns, 4), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ns, 2), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
            ] + ([pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0))]
                 if has_dlim else []) + [
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((4, ns, 8, 128),
                                   lambda i: (0, i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((4, sp, lp), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
        )(params, tfp, bounds_p, krange,
          su, sv, invda, t0, t1, dead, *dl, vol_prepared)
        hp, wp = round_up(height, 8), round_up(width, 128)
        img = out[:, :tiles_h * tiles_w]
        img = img.reshape(4, hp // 8, wp // 128, 8, 128)
        img = img.transpose(0, 1, 3, 2, 4).reshape(4, hp, wp)
        img = img[:, :height, :width]
        rgb = jnp.stack([img[0], img[1], img[2]], axis=-1)
        return rgb, img[3]

    return jax.jit(core)


def _marcher_args(vol_prepared, camera, image_size, plan):
    width, height = image_size
    return (
        jnp.asarray(camera.inverse_view_matrix()),
        jnp.asarray(camera.inverse_projection_matrix(width / height)),
        jnp.asarray(plan["box_min"], jnp.float32),
        jnp.asarray(plan["box_max"], jnp.float32),
        jnp.asarray([plan["voxel"][plan["axis_world"]],
                     plan["voxel"][plan["sub_axis"]],
                     plan["voxel"][plan["lane_axis"]]], jnp.float32),
        jnp.asarray(plan["m_rot"], jnp.float32),
        jnp.asarray(plan["m_trans"], jnp.float32),
    )


def dvr_raymarch(vol_prepared, camera, tf, image_size, plan,
                 attenuation=100.0, nan_mode="ignore",
                 ns: int = 64, interpret: bool | None = None,
                 depth_limit=None, restriction=None):
    """Run the DVR kernel. Returns premultiplied (rgb (H,W,3), a (H,W)).

    ``depth_limit``: optional (H, W) world eye distances — the shared
    per-view depth buffer; samples at or beyond it are skipped
    (opaque geometry occludes the volume regardless of render order).

    ``restriction``: optional ``(center_xyz, radius, metric)`` render
    restriction — per-sample ball test in world space, the semantics
    of the reference's RenderRestriction.glsl. Center/radius are
    traced (moving the reference point does not recompile); only the
    metric is static.
    """
    if interpret is None:
        interpret = not on_tpu()
    width, height = image_size
    planes, sp, lp = (int(d) for d in vol_prepared.shape)
    q = plan["q"]
    # Small volumes: the brick cannot exceed the padded plane (a
    # whole-plane brick always covers the footprint).
    bu, bv = min(plan["bu"], sp), min(plan["bv"], lp)
    knots_np, params_np, base_np = tf_hinges(tf)
    kq = len(knots_np)
    g0, gk, gs, u0c, v0c, _g0p = _common_params(plan, camera, q)

    vmin, vmax = float(tf.domain[0]), float(tf.domain[1])
    rest_metric = None
    rest_vals = [0.0] * 6
    if restriction is not None:
        center, radius, metric = restriction
        rest_metric = ("chebyshev"
                       if str(metric).lower() == "chebyshev"
                       else "euclidean")
        c = np.asarray(center, np.float64)
        o = (plan["m_rot"] @ np.asarray(camera.position, np.float64)
             + plan["m_trans"])
        a = plan["axis_world"]
        sub, lane = plan["sub_axis"], plan["lane_axis"]
        vox = plan["voxel"]
        sgn = -1.0 if plan["flip"] else 1.0
        # γ of the center plane; in-plane center in voxel coords
        # (same frame as the per-ray raw_u/raw_v positions).
        rest_vals = [
            float((c[a] - o[a]) * sgn),
            float((c[sub] - plan["box_min"][sub]) / vox[sub] - 0.5),
            float((c[lane] - plan["box_min"][lane]) / vox[lane] - 0.5),
            float(radius),
            float(abs(vox[sub])),
            float(abs(vox[lane])),
        ]
    params = np.asarray([
        g0, gk, gs,
        plan["sub_extent"] - 1, plan["lane_extent"] - 1,
        u0c, v0c, float(attenuation), vmin,
        1.0 / max(vmax - vmin, 1e-30),
        abs(float(plan["voxel"][plan["axis_world"]])) / q,
        *rest_vals, 0.0, 0.0, 0.0,
    ], np.float32).reshape(1, 20)
    # (5, 1+kq): row 0 = [pad, knots...]; rows 1-4 = [base, slopes...].
    tfp = np.zeros((5, 1 + kq), np.float32)
    tfp[0, 1:] = knots_np
    tfp[1:, 0] = base_np
    tfp[1:, 1:] = params_np

    plan_key = (plan["axis_world"], plan["lane_axis"],
                plan["sub_axis"], plan["flip"])
    core = _dvr_core(width, height, planes, sp, lp, q, bu, bv, ns,
                     kq, str(nan_mode), plan_key, bool(interpret),
                     depth_limit is not None, rest_metric)
    extra = (() if depth_limit is None
             else (jnp.asarray(depth_limit, jnp.float32),))
    return core(vol_prepared, *_marcher_args(
        vol_prepared, camera, image_size, plan),
        jnp.asarray(params), jnp.asarray(tfp),
        jnp.asarray(_subtile_bounds(plan)), *extra)


@functools.lru_cache(maxsize=32)
def _iso_core(width, height, planes, sp, lp, q, bu, bv, ns,
              plan_key, interpret, refine_steps=8):
    """Single-dispatch iso program (see _dvr_core)."""
    tiles_w = round_up(width, 128) // 128
    tiles_h = round_up(height, 8) // 8
    tp = round_up(max(tiles_h * tiles_w, 1), ns)
    n_mega = tp // ns
    kernel = _make_iso_kernel(ns, planes, bu, bv, q, lp, sp,
                              refine_steps=refine_steps)

    def core(vol_prepared, inv_view, inv_proj, box_min, box_max,
             voxel_asl, m_rot, m_trans, params, bounds):
        su, sv, invda, t0, t1, dead, gmin, gmax = _ray_fields_core(
            inv_view, inv_proj, box_min, box_max, voxel_asl,
            m_rot, m_trans, width, height, plan_key)
        krange = _krange(gmin, gmax, params[0, 0], params[0, 1],
                         planes)
        (su, sv, invda, t0, t1, dead), bounds_p, krange, _ = \
            _pad_tiles([(su, 0.0), (sv, 0.0), (invda, 1.0),
                        (t0, 0.0), (t1, -1.0), (dead, 1.0)],
                       bounds, krange, ns)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((5, tp, 8, 128),
                                           jnp.float32),
            grid=(n_mega,),
            in_specs=[
                pl.BlockSpec((1, 20), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ns, 4), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ns, 2), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec((ns, 8, 128), lambda i: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((5, ns, 8, 128),
                                   lambda i: (0, i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((6, sp, lp), jnp.float32),
                pltpu.VMEM((ns, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
            ],
            interpret=interpret,
        )(params, bounds_p, krange,
          su, sv, invda, t0, t1, dead, vol_prepared)
        hp, wp = round_up(height, 8), round_up(width, 128)
        img = out[:, :tiles_h * tiles_w]
        img = img.reshape(5, hp // 8, wp // 128, 8, 128)
        img = img.transpose(0, 1, 3, 2, 4).reshape(5, hp, wp)
        img = img[:, :height, :width]
        return img[0] > 0.5, img[1], img[2], img[3], img[4]

    return jax.jit(core)


def iso_raymarch(vol_prepared, camera, iso_value, image_size, plan,
                 ns: int = 64, interpret: bool | None = None,
                 refine_steps: int = 8):
    """Run the iso kernel.

    ``refine_steps > 0`` (default): the crossing is bisected and
    shaded-ready gradients are taken IN-KERNEL; returns
    ``(found, t_surf, gA, gS, gL)`` — gradient components along the
    plan's (principal, sublane, lane) axes in voxel coordinates.
    ``refine_steps == 0``: returns the raw bracket
    ``(found, t_hi, f_prev, f_cur)`` for the XLA solvers."""
    if interpret is None:
        interpret = not on_tpu()
    width, height = image_size
    planes, sp, lp = (int(d) for d in vol_prepared.shape)
    q = plan["q"]
    # Small volumes: the brick cannot exceed the padded plane (a
    # whole-plane brick always covers the footprint).
    bu, bv = min(plan["bu"], sp), min(plan["bv"], lp)
    g0, gk, gs, u0c, v0c, g0p = _common_params(plan, camera, q)
    params = np.asarray([
        g0, gk, gs,
        plan["sub_extent"] - 1, plan["lane_extent"] - 1,
        u0c, v0c, float(iso_value), g0p, 1.0 / gk, 0.0, 0.0,
        0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    ], np.float32).reshape(1, 20)
    plan_key = (plan["axis_world"], plan["lane_axis"],
                plan["sub_axis"], plan["flip"])
    core = _iso_core(width, height, planes, sp, lp, q, bu, bv, ns,
                     plan_key, bool(interpret), int(refine_steps))
    return core(vol_prepared, *_marcher_args(
        vol_prepared, camera, image_size, plan),
        jnp.asarray(params), jnp.asarray(_subtile_bounds(plan)))
