"""Shared-depth compositing (VERDICT r2 #5).

The reference shares one depth buffer per view (SceneData.hpp) and the
DVR marcher clips against it (DvrRenderer.hpp:69-71), so opaque
geometry inside a translucent cloud occludes correctly. These tests
pin the TPU-native equivalent: renderer-order invariance and correct
occlusion of a slice/isosurface inside a DVR cloud.
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.app.state import Scene
from correrender_tpu.core import GridMetadata, VolumeData
from correrender_tpu.render.camera import Camera
from correrender_tpu.render.dvr import dvr_render
from correrender_tpu.render.iso import iso_render
from correrender_tpu.render.slice_renderer import slice_render_3d
from correrender_tpu.render.tf import TransferFunction


def _sphere_volume(n=24, r=0.3):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2.0
    d = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) / c
    return jnp.asarray(1.0 - d)  # 1 at center, 0 at corners


def _scene(renderer_order):
    vol = np.asarray(_sphere_volume())
    vd = VolumeData(GridMetadata(xs=24, ys=24, zs=24, es=1))
    vd.add_field("f", lambda t, e: vol)
    scene = Scene(vd, views=[Camera(position=(0.1, 0.25, 0.8))])
    for kind in renderer_order:
        if kind == "dvr":
            scene.add_renderer("dvr", field="f", attenuation=60.0)
        elif kind == "iso":
            scene.add_renderer("iso_ray", field="f",
                               iso_value=0.75)  # sphere inside cloud
        elif kind == "slice":
            scene.add_renderer("slice", field="f", axis="z",
                               position=0.5)
    return scene


class TestOrderInvariance:
    @pytest.mark.parametrize("size", [(64, 48)])
    def test_permutations_render_identically(self, size):
        kinds = ["dvr", "iso", "slice"]
        images = []
        for perm in itertools.permutations(kinds):
            img = np.asarray(
                _scene(list(perm)).render_view(0, image_size=size)
            )
            images.append((perm, img))
        ref_perm, ref = images[0]
        for perm, img in images[1:]:
            np.testing.assert_allclose(
                img, ref, atol=1e-5,
                err_msg=f"{perm} differs from {ref_perm}",
            )

    def test_exact_path_also_invariant(self):
        a = np.asarray(_scene(["dvr", "iso"]).render_view(
            0, image_size=(48, 36), fast_dvr=False
        ))
        b = np.asarray(_scene(["iso", "dvr"]).render_view(
            0, image_size=(48, 36), fast_dvr=False
        ))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestDepthClip:
    def test_dvr_depth_limit_reduces_accumulation(self):
        vol = _sphere_volume()
        cam = Camera(position=(0.0, 0.0, 0.9))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(0.0, 1.0),
            opacity_points=((0.0, 0.0), (1.0, 0.9)),
        )
        free = np.asarray(dvr_render(
            vol, cam, tf, image_size=(32, 32), attenuation=60.0,
            background=(0, 0, 0, 0),
        ))
        # A limit at the box center truncates the march halfway.
        limit = jnp.full((32, 32), 0.9)  # eye at z=0.9, box at origin
        clipped = np.asarray(dvr_render(
            vol, cam, tf, image_size=(32, 32), attenuation=60.0,
            background=(0, 0, 0, 0), depth_limit=limit,
        ))
        assert clipped[..., 3].sum() < free[..., 3].sum()
        # And an infinite limit changes nothing.
        unlimited = np.asarray(dvr_render(
            vol, cam, tf, image_size=(32, 32), attenuation=60.0,
            background=(0, 0, 0, 0),
            depth_limit=jnp.full((32, 32), np.inf),
        ))
        np.testing.assert_allclose(unlimited, free, atol=1e-6)

    def test_opaque_surface_occludes_far_half(self):
        # Iso sphere inside the cloud: pixels hitting the sphere must
        # show it (blended with only the NEAR half of the cloud), not
        # the cloud's far half.
        vol = _sphere_volume()
        cam = Camera(position=(0.0, 0.0, 0.9))
        img_iso, depth = iso_render(
            vol, cam, 0.75, image_size=(32, 32),
            background=(0, 0, 0, 0), return_depth=True,
        )
        depth = np.asarray(depth)
        center = depth[16, 16]
        assert np.isfinite(center)  # the sphere is hit head-on
        assert not np.isfinite(depth[0, 0])  # corners miss

    def test_fast_dvr_depth_limit_matches_exact_clip(self):
        # The shear-warp kstop clip must agree with the exact
        # marcher's per-sample depth test (same scene, same limit).
        from correrender_tpu.render.dvr_fast import dvr_shearwarp
        from correrender_tpu.utils.metrics import ssim

        vol = _sphere_volume()
        cam = Camera(position=(0.0, 0.0, 0.9))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(0.0, 1.0),
            opacity_points=((0.0, 0.0), (1.0, 0.9)),
        )
        limit = jnp.full((48, 48), 0.9)  # clip at the box center
        fast = np.asarray(dvr_shearwarp(
            vol, cam, tf, image_size=(48, 48),
            background=(0, 0, 0, 0), depth_limit=limit,
        ))
        fast_free = np.asarray(dvr_shearwarp(
            vol, cam, tf, image_size=(48, 48), background=(0, 0, 0, 0),
        ))
        exact = np.asarray(dvr_render(
            vol, cam, tf, image_size=(48, 48), attenuation=100.0,
            background=(0, 0, 0, 0), depth_limit=limit,
        ))
        # Clip takes effect on the fast path (rays saturate early, so
        # a center-plane clip shaves ~8% total alpha — compare against
        # the exact marcher's clipped total, not an arbitrary ratio)...
        assert fast[..., 3].sum() < 0.99 * fast_free[..., 3].sum()
        assert abs(fast[..., 3].sum() - exact[..., 3].sum()) < (
            0.02 * exact[..., 3].sum()
        )
        # ...and lands on the exact marcher's clipped image.
        assert ssim(fast[..., 3], exact[..., 3]) > 0.9

    def test_slice_depth_matches_plane_distance(self):
        vol = _sphere_volume()
        cam = Camera(position=(0.0, 0.0, 0.9))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(0.0, 1.0),
            opacity_points=((0.0, 0.9), (1.0, 0.9)),
        )
        _, depth = slice_render_3d(
            vol, cam, tf, axis="z", position=0.5,
            image_size=(32, 32), background=(0, 0, 0, 0),
            return_depth=True,
        )
        d = float(np.asarray(depth)[16, 16])
        # Plane z=0 (box center), eye at z=0.9 looking at the origin.
        assert abs(d - 0.9) < 0.02


class TestDepthMergeOrderInvariance:
    """_depth_merge must sort per pixel: a pairwise fold composites the
    true MIDDLE of three overlapping layers behind a near/far pair
    (found by round-3 self-review; repro'd with translucent-over-
    opaque-over-opaque layers)."""

    def test_three_overlapping_layers_any_registration_order(self):
        from correrender_tpu.app.state import _depth_merge

        h = w = 4

        def layer(rgb, alpha, depth):
            img = jnp.broadcast_to(
                jnp.asarray(list(rgb) + [alpha], jnp.float32), (h, w, 4)
            )
            return img, jnp.full((h, w), depth, jnp.float32)

        a = layer((1, 0, 0), 0.5, 1.0)  # translucent red, nearest
        b = layer((0, 1, 0), 1.0, 2.0)  # opaque green, middle
        c = layer((0, 0, 1), 1.0, 3.0)  # opaque blue, farthest

        want = None
        for perm in itertools.permutations([a, b, c]):
            img, depth = _depth_merge(list(perm))
            got = np.asarray(img)
            assert np.allclose(np.asarray(depth), 1.0)
            # Red over green; blue fully hidden by the opaque middle.
            np.testing.assert_allclose(
                got[0, 0], [0.5, 0.5, 0.0, 1.0], atol=1e-6
            )
            if want is None:
                want = got
            np.testing.assert_allclose(got, want, atol=0)


class TestEyeInsideWithRestriction:
    def test_restriction_honored_when_eye_inside(self):
        # Eye inside the box + active render restriction: the Scene
        # must route to the exact marcher WITH the restriction (the
        # shear-warp in-function fallback cannot carry the
        # restriction-classified volume — round-3 self-review).
        from correrender_tpu.calculators.correlation import (
            CorrelationCalculator,
        )

        vol = np.asarray(_sphere_volume())
        stack = np.repeat(vol[..., None], 12, axis=-1)
        stack = stack + 0.01 * np.random.default_rng(0).normal(
            size=stack.shape
        ).astype(np.float32)
        vd = VolumeData(GridMetadata(xs=24, ys=24, zs=24, es=12))
        vd.add_field("f", lambda t, e: np.asarray(stack[..., e]))
        c = CorrelationCalculator(
            field_name="f", reference_point=(12, 12, 12),
            use_render_restriction=True, render_restriction_radius=0.1,
        )
        vd.add_calculator(c)
        scene = Scene(vd, views=[Camera(position=(0.0, 0.02, 0.05))])
        scene.add_renderer("dvr", field=c.output_name, attenuation=60.0)
        fast = np.asarray(scene.render_view(0, image_size=(48, 36)))
        exact = np.asarray(
            scene.render_view(0, image_size=(48, 36), fast_dvr=False)
        )
        np.testing.assert_array_equal(fast, exact)
