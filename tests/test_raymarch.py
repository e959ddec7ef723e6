"""Pallas exact ray-march kernels (interpret mode on the CPU mesh).

Two layers of validation:

1. Exact-machinery equality: a straight-JAX re-implementation of the
   SAME plane-order quadrature (``_plane_reference``) must match the
   kernel to float tolerance — this pins bricks, rolls, matmul tents,
   masks, TF hinges, and compositing.
2. Convergence: at high sample density the kernel agrees with the
   fixed-dt XLA marcher (render/dvr.py) — both are Riemann sums of the
   same integral.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from correrender_tpu.ops.pallas import raymarch_kernel as rk
from correrender_tpu.render.camera import Camera
from correrender_tpu.render.tf import TransferFunction


def make_volume(zs=12, ys=14, xs=18, seed=0, with_nan=False):
    rng = np.random.default_rng(seed)
    vol = rng.normal(size=(zs, ys, xs)).astype(np.float32)
    # Smooth a bit so surfaces are sane.
    for ax in range(3):
        vol = (vol + np.roll(vol, 1, ax) + np.roll(vol, -1, ax)) / 3
    if with_nan:
        vol[zs // 2, ys // 2, xs // 2] = np.nan
    return vol


def make_camera(pos=(0.0, 0.05, 0.62), look=(0.0, 0.0, 0.0)):
    return Camera(position=pos, look_at_point=look)


def make_tf(domain):
    return TransferFunction.from_control_points(
        color_points=[(0.0, (0.0, 0.2, 1.0)), (0.5, (0.1, 1.0, 0.1)),
                      (1.0, (1.0, 0.1, 0.0))],
        opacity_points=[(0.0, 0.0), (0.4, 0.3), (1.0, 0.9)],
        domain=domain,
    )


def _hinge_eval(tf, u):
    knots, params, base = rk.tf_hinges(tf)
    out = np.zeros(u.shape + (4,), np.float32)
    for ch in range(4):
        acc = np.full_like(u, base[ch])
        for i in range(len(knots)):
            acc = acc + params[ch, i] * np.maximum(u - knots[i], 0.0)
        out[..., ch] = acc
    return out


def _plane_reference(volume, camera, tf, image_size, plan,
                     attenuation=60.0, nan_mode="ignore"):
    """Slow exact mirror of the kernel's quadrature in numpy."""
    from correrender_tpu.render.sampling import ray_box_intersect

    width, height = image_size
    origin, dirs = camera.rays(width, height)
    origin = np.asarray(origin); dirs = np.asarray(dirs)
    box_min = plan["box_min"]; box_max = plan["box_max"]
    t_near, t_far, hit = ray_box_intersect(
        jnp.asarray(origin), jnp.asarray(dirs),
        jnp.asarray(box_min, jnp.float32),
        jnp.asarray(box_max, jnp.float32))
    t0 = np.maximum(np.asarray(t_near), 0.0)
    t1 = np.where(np.asarray(hit), np.asarray(t_far), t0 - 1.0)

    a = plan["axis_world"]; sub = plan["sub_axis"]; lane = plan["lane_axis"]
    vox = plan["voxel"]; flip = plan["flip"]; q = plan["q"]
    sgn = -1.0 if flip else 1.0
    inv_da = 1.0 / (dirs[..., a] * sgn)
    su = dirs[..., sub] * inv_da / vox[sub]
    sv = dirs[..., lane] * inv_da / vox[lane]
    g0, gk, gs, u0c, v0c, _ = rk._common_params(plan, camera, q)

    # Permuted sentinel volume (A, S, L), unpadded.
    arr_a = rk._WORLD_TO_ARR[a]
    arr_l = rk._WORLD_TO_ARR[lane]
    arr_s = ({0, 1, 2} - {arr_a, arr_l}).pop()
    vol = np.transpose(np.asarray(volume, np.float32),
                       (arr_a, arr_s, arr_l))
    if flip:
        vol = vol[::-1]
    vol = np.where(np.isnan(vol), np.float32(rk._NAN_SENTINEL), vol)
    planes, S, L = vol.shape

    vmin, vmax = tf.domain
    atten = attenuation
    rgb = np.zeros((height, width, 3), np.float32)
    acc_a = np.zeros((height, width), np.float32)
    dt = abs(vox[a]) / q * np.abs(inv_da)

    for kk in range(planes + 1):
        lo, hi = max(kk - 1, 0), min(kk, planes - 1)
        for s in range(q):
            wz = (s + 0.5) / q
            plane = (1 - wz) * vol[lo] + wz * vol[hi]
            gamma = g0 + (kk - 1) * gk + s * gs
            ug = np.clip(u0c + gamma * su, 0.0, S - 1)
            vg = np.clip(v0c + gamma * sv, 0.0, L - 1)
            iu = np.clip(np.floor(ug).astype(int), 0, S - 2 if S > 1 else 0)
            iv = np.clip(np.floor(vg).astype(int), 0, L - 2 if L > 1 else 0)
            fu = ug - iu
            fv = vg - iv
            val = ((1 - fu) * (1 - fv) * plane[iu, iv]
                   + fu * (1 - fv) * plane[np.minimum(iu + 1, S - 1), iv]
                   + (1 - fu) * fv * plane[iu, np.minimum(iv + 1, L - 1)]
                   + fu * fv * plane[np.minimum(iu + 1, S - 1),
                                     np.minimum(iv + 1, L - 1)])
            t = gamma * inv_da
            active = (t >= t0) & (t <= t1)
            is_nan = val > rk._NAN_THRESH
            u = np.clip((val - vmin) / (vmax - vmin), 0.0, 1.0)
            rgba = _hinge_eval(tf, u.astype(np.float32))
            if nan_mode == "yellow":
                rgba[..., 0] = np.where(is_nan, 1.0, rgba[..., 0])
                rgba[..., 1] = np.where(is_nan, 1.0, rgba[..., 1])
                rgba[..., 2] = np.where(is_nan, 0.0, rgba[..., 2])
                rgba[..., 3] = np.where(is_nan, 1.0, rgba[..., 3])
            else:
                rgba[..., 3] = np.where(is_nan, 0.0, rgba[..., 3])
            alpha = 1.0 - np.exp(-rgba[..., 3] * dt * atten)
            alpha = np.where(active, alpha, 0.0)
            w = (1.0 - acc_a) * alpha
            rgb += w[..., None] * rgba[..., :3]
            acc_a += w
    return rgb, acc_a


class TestDvrKernel:
    @pytest.mark.parametrize("campos,with_nan", [
        ((0.0, 0.05, 0.62), False),      # +z principal axis
        ((0.0, 0.05, -0.62), False),     # flipped
        ((0.6, 0.1, 0.1), False),        # +x principal axis
        ((0.0, 0.05, 0.62), True),       # NaN voxel, ignore mode
    ])
    def test_matches_plane_reference(self, campos, with_nan):
        vol = make_volume(with_nan=with_nan)
        cam = make_camera(pos=campos)
        tf = make_tf(domain=(float(np.nanmin(vol)),
                             float(np.nanmax(vol))))
        size = (64, 32)
        plan = rk.plan_raymarch(cam, vol.shape, size, q=2)
        prep = rk.prepare_raymarch_volume(
            vol, plan["axis_world"], plan["flip"], plan["lane_axis"])
        rgb, a = rk.dvr_raymarch(prep, cam, tf, size, plan,
                                 attenuation=60.0, ns=2,
                                 interpret=True)
        want_rgb, want_a = _plane_reference(
            vol, cam, tf, size, plan, attenuation=60.0)
        np.testing.assert_allclose(np.asarray(a), want_a, atol=2e-5)
        np.testing.assert_allclose(np.asarray(rgb), want_rgb, atol=2e-5)

    def test_nan_yellow_mode(self):
        vol = make_volume(with_nan=True)
        cam = make_camera()
        tf = make_tf(domain=(float(np.nanmin(vol)),
                             float(np.nanmax(vol))))
        size = (64, 32)
        plan = rk.plan_raymarch(cam, vol.shape, size, q=2)
        prep = rk.prepare_raymarch_volume(
            vol, plan["axis_world"], plan["flip"], plan["lane_axis"])
        rgb, a = rk.dvr_raymarch(prep, cam, tf, size, plan,
                                 attenuation=60.0, ns=2,
                                 nan_mode="yellow", interpret=True)
        want_rgb, want_a = _plane_reference(
            vol, cam, tf, size, plan, attenuation=60.0,
            nan_mode="yellow")
        np.testing.assert_allclose(np.asarray(a), want_a, atol=2e-5)
        np.testing.assert_allclose(np.asarray(rgb), want_rgb, atol=2e-5)

    def test_converges_to_fixed_dt_marcher(self):
        from correrender_tpu.render.dvr import dvr_render

        vol = make_volume(zs=16, ys=16, xs=16, seed=3)
        cam = make_camera()
        tf = make_tf(domain=(float(vol.min()), float(vol.max())))
        size = (64, 32)
        plan = rk.plan_raymarch(cam, vol.shape, size, q=16)
        prep = rk.prepare_raymarch_volume(
            vol, plan["axis_world"], plan["flip"], plan["lane_axis"])
        rgb, a = rk.dvr_raymarch(prep, cam, tf, size, plan,
                                 attenuation=60.0, ns=2,
                                 interpret=True)
        # Un-premultiplied comparison image on black background.
        got = np.asarray(rgb)
        want = np.asarray(dvr_render(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.0625, attenuation=60.0,
            background=(0.0, 0.0, 0.0, 0.0)))
        want_pre = want[..., :3] * want[..., 3:4]
        err = np.abs(got - want_pre)
        # First-order quadrature agreement: both marchers integrate
        # the same field at matched density on different abscissae.
        assert err.max() < 0.06, f"premult rgb max delta {err.max()}"
        assert err.mean() < 0.003, f"mean delta {err.mean()}"

    def test_tf_hinges_match_lut(self):
        # Knots on the LUT bin grid: hinge evaluation == LUT lerp.
        res = 256
        tf = TransferFunction.from_control_points(
            color_points=[(0.0, (0.0, 0.0, 1.0)),
                          (85 / (res - 1), (0.0, 1.0, 0.0)),
                          (1.0, (1.0, 0.0, 0.0))],
            opacity_points=[(0.0, 0.0), (170 / (res - 1), 0.5),
                            (1.0, 1.0)],
            domain=(0.0, 1.0), resolution=res)
        u = np.linspace(0, 1, 1001).astype(np.float32)
        got = _hinge_eval(tf, u)
        lut = np.asarray(tf.lut)
        x = u * (res - 1)
        i0 = np.clip(np.floor(x).astype(int), 0, res - 2)
        frac = (x - i0)[:, None]
        want = lut[i0] * (1 - frac) + lut[i0 + 1] * frac
        np.testing.assert_allclose(got, want, atol=5e-6)


class TestIsoKernel:
    def test_brackets_match_reference_march(self):
        vol = make_volume(zs=16, ys=16, xs=16, seed=5)
        cam = make_camera()
        iso = float(np.quantile(vol, 0.6))
        size = (64, 32)
        plan = rk.plan_raymarch(cam, vol.shape, size, q=4)
        prep = rk.prepare_raymarch_volume(
            vol, plan["axis_world"], plan["flip"], plan["lane_axis"])
        found, t_hit, f_lo, f_hi, _ = rk.iso_raymarch(
            prep, cam, iso, size, plan, ns=2, interpret=True,
            refine_steps=0)
        found = np.asarray(found)
        t_hit = np.asarray(t_hit)
        # The bracket must contain a sign change of the trilinear
        # field along each found ray.
        from correrender_tpu.render.sampling import sample_trilinear

        origin, dirs = cam.rays(*size)
        box_min = jnp.asarray(plan["box_min"], jnp.float32)
        box_max = jnp.asarray(plan["box_max"], jnp.float32)
        extent = box_max - box_min
        a = plan["axis_world"]
        dt = (abs(plan["voxel"][a]) / plan["q"]
              / np.abs(np.asarray(dirs)[..., a]))
        assert found.sum() > 50  # the surface is visible
        ys, xs_ = np.nonzero(found)
        for y, x in list(zip(ys, xs_))[::17]:
            th = t_hit[y, x]
            tl = th - dt[y, x]
            p_hi = np.asarray(origin) + np.asarray(dirs)[y, x] * th
            p_lo = np.asarray(origin) + np.asarray(dirs)[y, x] * tl
            f_hi_chk = float(sample_trilinear(
                jnp.asarray(vol),
                (jnp.asarray(p_hi, jnp.float32) - box_min) / extent
            )) - iso
            f_lo_chk = float(sample_trilinear(
                jnp.asarray(vol),
                (jnp.asarray(p_lo, jnp.float32) - box_min) / extent
            )) - iso
            assert (f_lo_chk >= 0) != (f_hi_chk >= 0), (
                f"no crossing in bracket at {(y, x)}: "
                f"{f_lo_chk} .. {f_hi_chk}")


class TestIsoInKernelRefine:
    def test_refined_t_is_a_root_and_normals_point_up_gradient(self):
        vol = make_volume(zs=16, ys=16, xs=16, seed=5)
        cam = make_camera()
        iso = float(np.quantile(vol, 0.6))
        size = (64, 32)
        plan = rk.plan_raymarch(cam, vol.shape, size, q=4)
        prep = rk.prepare_raymarch_volume(
            vol, plan["axis_world"], plan["flip"], plan["lane_axis"])
        found, t_surf, gA, gS, gL = rk.iso_raymarch(
            prep, cam, iso, size, plan, ns=2, interpret=True,
            refine_steps=8)
        found = np.asarray(found)
        assert found.sum() > 100
        from correrender_tpu.render.sampling import sample_trilinear
        from correrender_tpu.render.camera import default_render_box

        box = default_render_box(vol.shape)
        box_min = jnp.asarray(box[0], jnp.float32)
        extent = jnp.asarray(box[1], jnp.float32) - box_min
        origin, dirs = cam.rays(*size)
        t_np = np.asarray(t_surf)
        ys_, xs_ = np.nonzero(found)
        errs = []
        for y, x in list(zip(ys_, xs_))[::23]:
            pt = np.asarray(origin) + np.asarray(dirs)[y, x] * t_np[y, x]
            f = float(sample_trilinear(
                jnp.asarray(vol),
                (jnp.asarray(pt, jnp.float32) - box_min) / extent
            )) - iso
            errs.append(abs(f))
        # Bisection to gs/2^8 of a bracketed root: residuals tiny
        # relative to the field's scale (~1).
        assert np.median(errs) < 5e-3, np.median(errs)
        # Gradients are finite and mostly nonzero on the surface.
        g = np.stack([np.asarray(gA)[found], np.asarray(gS)[found],
                      np.asarray(gL)[found]], -1)
        assert np.isfinite(g).all()
        assert (np.linalg.norm(g, axis=-1) > 1e-6).mean() > 0.95

    def test_iso_exact_shaded_matches_xla_solver_image(self):
        from correrender_tpu.render.raymarch_exact import iso_render_exact

        vol = make_volume(zs=16, ys=16, xs=16, seed=5)
        cam = make_camera()
        iso = float(np.quantile(vol, 0.6))
        size = (64, 32)
        img_k, d_k = iso_render_exact(
            jnp.asarray(vol), cam, iso, image_size=size,
            voxel_step=0.25, intersection_mode="bisection",
            return_depth=True)
        img_x, d_x = iso_render_exact(
            jnp.asarray(vol), cam, iso, image_size=size,
            voxel_step=0.25, intersection_mode="marmitt",
            return_depth=True)
        img_k, img_x = np.asarray(img_k), np.asarray(img_x)
        d_k, d_x = np.asarray(d_k), np.asarray(d_x)
        both = np.isfinite(d_k) & np.isfinite(d_x)
        assert both.mean() > 0.3
        dd = np.abs(d_k[both] - d_x[both])
        assert np.quantile(dd, 0.95) < 5e-3, np.quantile(dd, 0.95)
        # Shading agrees (normals differ only by the gradient stencil
        # width: in-kernel ±0.5 voxel vs XLA ±1 voxel).
        di = np.abs(img_k[both] - img_x[both])
        assert np.quantile(di, 0.9) < 0.12, np.quantile(di, 0.9)


class TestPlan:
    def test_rejects_extreme_zoom_out(self):
        cam = Camera(position=(0.0, 0.0, 60.0),
                     look_at_point=(0.0, 0.0, 0.0))
        with pytest.raises(rk.RaymarchUnsupported):
            # Volume is tiny on screen: footprints exceed brick caps
            # only when vpp is large — force with a big volume.
            rk.plan_raymarch(cam, (400, 400, 400), (64, 64),
                             q=2, max_bu=16, max_bv=16)

    def test_axis_and_flip(self):
        cam = make_camera(pos=(0.0, 0.05, -0.62))
        plan = rk.plan_raymarch(cam, (16, 16, 16), (64, 16), q=2)
        assert plan["axis_world"] == 2 and plan["flip"] is False
        cam2 = make_camera(pos=(0.0, 0.05, 0.62))
        plan2 = rk.plan_raymarch(cam2, (16, 16, 16), (64, 16), q=2)
        assert plan2["flip"] is True


class TestExactRenderers:
    """High-level exact paths (render/raymarch_exact.py)."""

    def test_dvr_exact_matches_marcher(self):
        from correrender_tpu.render.raymarch_exact import dvr_render_exact
        from correrender_tpu.render.dvr import dvr_render

        vol = make_volume(zs=16, ys=16, xs=16, seed=7)
        cam = make_camera()
        tf = make_tf(domain=(float(vol.min()), float(vol.max())))
        size = (64, 32)
        got = np.asarray(dvr_render_exact(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.0625, attenuation=60.0,
            background=(0.1, 0.2, 0.3, 1.0)))
        want = np.asarray(dvr_render(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.0625, attenuation=60.0,
            background=(0.1, 0.2, 0.3, 1.0)))
        assert got.shape == want.shape
        assert np.abs(got - want).mean() < 0.004
        assert np.abs(got - want).max() < 0.12

    @pytest.mark.parametrize("metric", ["Euclidean", "Chebyshev"])
    def test_dvr_exact_restriction_in_kernel(self, metric):
        from correrender_tpu.render.raymarch_exact import dvr_render_exact
        from correrender_tpu.render.dvr import dvr_render

        vol = make_volume(zs=12, ys=12, xs=12, seed=4)
        cam = make_camera()
        tf = make_tf(domain=(float(vol.min()), float(vol.max())))
        size = (64, 32)
        rest = ((0.02, -0.01, 0.0), 0.12, metric)
        got = np.asarray(dvr_render_exact(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.125, attenuation=60.0,
            background=(0, 0, 0, 0), restriction=rest))
        want = np.asarray(dvr_render(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.125, attenuation=60.0,
            background=(0, 0, 0, 0), restriction=rest))
        # The ball visibly restricts (most pixels empty) and the
        # kernel agrees with the fixed-dt marcher to quadrature
        # tolerance inside it.
        assert (got[..., 3] > 0.01).mean() < 0.5
        assert abs((got[..., 3] > 0.01).mean()
                   - (want[..., 3] > 0.01).mean()) < 0.05
        assert np.abs(got[..., 3] - want[..., 3]).mean() < 0.01

    def test_iso_exact_matches_marcher(self):
        from correrender_tpu.render.raymarch_exact import iso_render_exact
        from correrender_tpu.render.iso import iso_render

        vol = make_volume(zs=16, ys=16, xs=16, seed=9)
        cam = make_camera()
        iso = float(np.quantile(vol, 0.6))
        size = (64, 32)
        got, gd = iso_render_exact(
            jnp.asarray(vol), cam, iso, image_size=size,
            voxel_step=0.25, return_depth=True)
        want, wd = iso_render(
            jnp.asarray(vol), cam, iso, image_size=size,
            voxel_step=0.25, return_depth=True)
        got, want = np.asarray(got), np.asarray(want)
        gd, wd = np.asarray(gd), np.asarray(wd)
        both = np.isfinite(gd) & np.isfinite(wd)
        # Same surface where both marchers find it; the marchers may
        # disagree on a handful of grazing/thin-feature pixels.
        agree = (np.isfinite(gd) == np.isfinite(wd)).mean()
        assert agree > 0.97, f"hit-mask agreement {agree}"
        # Bulk of the surface lands on the same crossing; a small tail
        # of pixels hits a different (thin-feature) crossing because
        # the two marchers sample different abscissae.
        dd = np.abs(gd[both] - wd[both])
        assert np.quantile(dd, 0.98) < 0.02, np.quantile(dd, 0.98)
        assert np.abs(got[both] - want[both]).mean() < 0.01

    def test_exact_prepared_reuse(self):
        from correrender_tpu.render.raymarch_exact import (
            ExactPrepared,
            dvr_render_exact,
        )

        vol = make_volume(zs=12, ys=12, xs=12)
        tf = make_tf(domain=(float(vol.min()), float(vol.max())))
        prep = ExactPrepared(jnp.asarray(vol))
        size = (64, 16)
        a = dvr_render_exact(jnp.asarray(vol), make_camera(), tf,
                             image_size=size, voxel_step=0.5,
                             prepared=prep)
        b = dvr_render_exact(jnp.asarray(vol),
                             make_camera(pos=(0.62, 0.05, 0.0)), tf,
                             image_size=size, voxel_step=0.5,
                             prepared=prep)
        assert len(prep._by_key) == 2  # two principal-axis layouts
        assert np.isfinite(np.asarray(a)).all()
        assert np.isfinite(np.asarray(b)).all()


class TestDepthLimit:
    def test_dvr_exact_respects_depth_limit(self):
        from correrender_tpu.render.raymarch_exact import dvr_render_exact
        from correrender_tpu.render.dvr import dvr_render

        vol = make_volume(zs=14, ys=14, xs=14, seed=11)
        cam = make_camera()
        tf = make_tf(domain=(float(vol.min()), float(vol.max())))
        size = (64, 32)
        # Opaque wall at a fixed eye distance across the lower half.
        dlim = np.full((32, 64), np.inf, np.float32)
        dlim[16:, :] = 0.55
        got = np.asarray(dvr_render_exact(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.125, attenuation=60.0,
            background=(0, 0, 0, 0), depth_limit=jnp.asarray(dlim)))
        want = np.asarray(dvr_render(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.125, attenuation=60.0,
            background=(0, 0, 0, 0), depth_limit=jnp.asarray(dlim)))
        # The limited half must accumulate less than the free half and
        # agree with the fixed-dt marcher to quadrature tolerance.
        assert got[16:, :, 3].mean() < got[:16, :, 3].mean()
        assert np.abs(got[..., 3] - want[..., 3]).mean() < 0.01


class TestSceneExactIntegration:
    def test_iso_plus_dvr_exact_scene_depth_clips(self):
        """Mixed opaque iso + exact-quality DVR: the volume behind the
        surface must not bleed through (the shared-depth clip now runs
        in-kernel instead of forcing the XLA fallback)."""
        from correrender_tpu.app.state import Scene
        from correrender_tpu.core import GridMetadata, VolumeData
        from correrender_tpu.render.camera import Camera

        vol = make_volume(zs=14, ys=14, xs=14, seed=2)
        vd = VolumeData(GridMetadata(xs=14, ys=14, zs=14, es=1))
        vd.add_field("f", lambda t, e: vol)
        cam = Camera(position=(0.0, 0.05, 0.62))
        scene = Scene(vd, views=[cam])
        iso = float(np.quantile(vol, 0.45))
        scene.add_renderer("iso_ray", field="f", iso_value=iso)
        scene.add_renderer("dvr", field="f", quality="exact")
        img = np.asarray(scene.render_view(image_size=(64, 32)))
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0
        # Volume-only for comparison: with the opaque surface present
        # the composited frame must differ (occlusion happened).
        scene2 = Scene(vd, views=[cam])
        scene2.add_renderer("dvr", field="f", quality="exact")
        img2 = np.asarray(scene2.render_view(image_size=(64, 32)))
        assert np.abs(img - img2).max() > 0.05


class TestModelMatrix:
    @pytest.mark.parametrize("deg", [30.0, 90.0])
    def test_dvr_exact_matches_marcher_under_rotation(self, deg):
        from correrender_tpu.render.raymarch_exact import dvr_render_exact
        from correrender_tpu.render.dvr import dvr_render

        vol = make_volume(zs=14, ys=14, xs=14, seed=6)
        cam = make_camera()
        tf = make_tf(domain=(float(vol.min()), float(vol.max())))
        size = (64, 32)
        th = np.deg2rad(deg)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.array([
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)]], np.float32)
        m[:3, 3] = (0.03, -0.02, 0.01)
        got = np.asarray(dvr_render_exact(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.125, attenuation=60.0,
            background=(0, 0, 0, 0), model_matrix=m))
        want = np.asarray(dvr_render(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.125, attenuation=60.0,
            background=(0, 0, 0, 0), model_matrix=m))
        assert np.abs(got[..., 3] - want[..., 3]).mean() < 0.01
        # The rotation visibly moved the volume (sanity that the
        # transform is actually applied).
        plain = np.asarray(dvr_render_exact(
            jnp.asarray(vol), cam, tf, image_size=size,
            voxel_step=0.125, attenuation=60.0,
            background=(0, 0, 0, 0)))
        assert np.abs(got[..., 3] - plain[..., 3]).max() > 0.1

    def test_iso_exact_under_rotation(self):
        from correrender_tpu.render.raymarch_exact import iso_render_exact
        from correrender_tpu.render.iso import iso_render

        vol = make_volume(zs=14, ys=14, xs=14, seed=6)
        cam = make_camera()
        iso = float(np.quantile(vol, 0.55))
        size = (64, 32)
        th = np.deg2rad(25.0)
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.array([
            [1, 0, 0],
            [0, np.cos(th), -np.sin(th)],
            [0, np.sin(th), np.cos(th)]], np.float32)
        got, gd = iso_render_exact(
            jnp.asarray(vol), cam, iso, image_size=size,
            model_matrix=m, return_depth=True)
        want, wd = iso_render(
            jnp.asarray(vol), cam, iso, image_size=size,
            model_matrix=m, return_depth=True)
        gd, wd = np.asarray(gd), np.asarray(wd)
        agree = (np.isfinite(gd) == np.isfinite(wd)).mean()
        assert agree > 0.96, agree
        both = np.isfinite(gd) & np.isfinite(wd)
        dd = np.abs(gd[both] - wd[both])
        assert np.quantile(dd, 0.95) < 0.02, np.quantile(dd, 0.95)
