"""DVR renderer, camera, transfer-function and fused-pipeline tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.render import Camera, TransferFunction, dvr_render
from correrender_tpu.render.sampling import (
    sample_trilinear,
    ray_box_intersect,
)
from correrender_tpu.render.pipeline import render_correlation
from correrender_tpu.utils import fixtures


class TestSampling:
    def test_trilinear_exact_at_centers(self):
        vol = jnp.asarray(np.arange(27, dtype=np.float32).reshape(3, 3, 3))
        # Voxel (z=1,y=2,x=0) center is at normalized ((0+0.5)/3, (2+0.5)/3, (1+0.5)/3) xyz.
        coords = jnp.asarray([[0.5 / 3, 2.5 / 3, 1.5 / 3]])
        got = float(sample_trilinear(vol, coords)[0])
        assert got == pytest.approx(1 * 9 + 2 * 3 + 0, abs=1e-4)

    def test_trilinear_interpolates(self):
        vol = jnp.asarray(
            np.linspace(0, 1, 8, dtype=np.float32).reshape(2, 2, 2)
        )
        center = jnp.asarray([[0.5, 0.5, 0.5]])
        got = float(sample_trilinear(vol, center)[0])
        assert got == pytest.approx(0.5, abs=1e-5)

    def test_clamp_to_edge(self):
        vol = jnp.ones((4, 4, 4)) * 7.0
        outside = jnp.asarray([[-0.3, 1.4, 0.5]])
        assert float(sample_trilinear(vol, outside)[0]) == pytest.approx(7.0)

    def test_ray_box(self):
        o = jnp.asarray([0.0, 0.0, 2.0])
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
        bmin = jnp.asarray([-0.5, -0.5, -0.5])
        bmax = jnp.asarray([0.5, 0.5, 0.5])
        tn, tf, hit = ray_box_intersect(o, d, bmin, bmax)
        assert bool(hit[0]) and not bool(hit[1])
        assert float(tn[0]) == pytest.approx(1.5)
        assert float(tf[0]) == pytest.approx(2.5)


class TestCamera:
    def test_rays_point_at_target(self):
        cam = Camera(position=(0, 0, 1), look_at_point=(0, 0, 0))
        origin, dirs = cam.rays(9, 9)
        np.testing.assert_allclose(np.asarray(origin), [0, 0, 1], atol=1e-6)
        center_dir = np.asarray(dirs)[4, 4]
        np.testing.assert_allclose(center_dir, [0, 0, -1], atol=1e-3)
        norms = np.linalg.norm(np.asarray(dirs), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestTransferFunction:
    def test_lookup_endpoints(self):
        tf = TransferFunction.from_colormap("gray", domain=(0.0, 1.0))
        lo = np.asarray(tf(jnp.asarray(0.0)))
        hi = np.asarray(tf(jnp.asarray(1.0)))
        np.testing.assert_allclose(lo, [0, 0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(hi, [1, 1, 1, 1], atol=1e-5)

    def test_nan_transparent(self):
        tf = TransferFunction.from_colormap("gray")
        out = np.asarray(tf(jnp.asarray(float("nan"))))
        np.testing.assert_allclose(out, 0.0)

    def test_domain_clamp(self):
        tf = TransferFunction.from_colormap("gray", domain=(-1.0, 1.0))
        assert np.asarray(tf(jnp.asarray(5.0)))[0] == pytest.approx(1.0)


class TestDVR:
    def _render(self, vol, alpha=0.9, **kwargs):
        cam = Camera(position=(0.0, 0.0, 0.9))
        # Opacity ramp: scalar 0 → transparent, scalar 1 → alpha.
        tf = TransferFunction.from_colormap(
            "gray", domain=(0.0, 1.0),
            opacity_points=((0.0, 0.0), (1.0, alpha)),
        )
        kwargs.setdefault("background", (0.0, 0.0, 0.0, 0.0))
        return np.asarray(
            dvr_render(vol, cam, tf, image_size=(64, 64), **kwargs)
        )

    def test_empty_volume_shows_background(self):
        vol = jnp.zeros((8, 8, 8))
        tf = TransferFunction.from_colormap("gray")  # opacity ramp: 0 at 0
        cam = Camera(position=(0.0, 0.0, 0.9))
        img = np.asarray(
            dvr_render(
                vol, cam, tf, image_size=(32, 32),
                background=(1.0, 0.0, 0.0, 1.0),
            )
        )
        # All pixels = pure red background.
        np.testing.assert_allclose(img[..., 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(img[..., 1], 0.0, atol=1e-4)

    def test_dense_volume_opaque_center(self):
        vol = jnp.ones((16, 16, 16))
        img = self._render(vol, attenuation=400.0)
        h, w = img.shape[:2]
        assert img[h // 2, w // 2, 3] > 0.95  # saturated alpha
        # Gray colormap at value 1.0 → white-ish.
        assert img[h // 2, w // 2, 0] > 0.9

    def test_corner_pixels_miss_box(self):
        vol = jnp.ones((16, 16, 16))
        img = self._render(vol, background=(0, 0, 1, 1))
        # Corners hit the background (blue).
        assert img[0, 0, 2] == pytest.approx(1.0, abs=1e-3)

    def test_half_empty_volume(self):
        vol = np.zeros((16, 16, 16), np.float32)
        vol[:, :, 8:] = 1.0  # right half (+x) dense
        img = self._render(jnp.asarray(vol), attenuation=400.0)
        h, w = img.shape[:2]
        # Camera looks down -z with +x to the right: right half opaque.
        assert img[h // 2, int(w * 0.75), 3] > 0.9
        assert img[h // 2, int(w * 0.25), 3] < 0.1


class TestFusedPipeline:
    def test_correlation_render_end_to_end(self):
        data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8, members=50)
        stack = jnp.asarray(np.moveaxis(data, 0, -1))
        cam = Camera(position=(0.0, 0.0, 0.8))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(-1.0, 1.0),
            opacity_points=((0.0, 0.8), (0.5, 0.0), (1.0, 0.8)),
        )
        img = np.asarray(
            render_correlation(
                stack, (2, 2, 4), cam, tf, "pearson", image_size=(48, 48)
            )
        )
        assert img.shape == (48, 48, 4)
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0.1  # something rendered

    def test_reference_point_is_dynamic(self):
        # Moving the point must not retrigger tracing (same jitted fn).
        data = fixtures.synth_box_ensemble(xs=8, ys=8, zs=8, members=20)
        stack = jnp.asarray(np.moveaxis(data, 0, -1))
        cam = Camera(position=(0.0, 0.0, 0.8))
        tf = TransferFunction.constant_opacity("gray", domain=(-1, 1))
        from correrender_tpu.render import pipeline as pl

        before = pl._fused._cache_size()
        a = render_correlation(stack, (0, 0, 0), cam, tf, image_size=(16, 16))
        mid = pl._fused._cache_size()
        b = render_correlation(stack, (4, 4, 4), cam, tf, image_size=(16, 16))
        after = pl._fused._cache_size()
        assert mid == after  # second call hit the jit cache
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestFusedFastPath:
    def test_render_correlation_fast(self):
        from correrender_tpu.render.pipeline import render_correlation_fast

        data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8, members=24)
        stack = jnp.asarray(np.moveaxis(data, 0, -1))
        cam = Camera(position=(0.0, 0.2, 0.8))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(-1.0, 1.0),
            opacity_points=((0.0, 0.8), (0.5, 0.0), (1.0, 0.8)),
        )
        img = np.asarray(
            render_correlation_fast(
                stack, (2, 2, 4), cam, tf, "pearson", image_size=(48, 48),
                background=(0, 0, 0, 0),
            )
        )
        assert img.shape == (48, 48, 4)
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0.1
