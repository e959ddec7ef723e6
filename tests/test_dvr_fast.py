"""Shear-warp DVR vs. the exact ray-marcher, and classifier tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.render import Camera, TransferFunction, dvr_render
from correrender_tpu.render.classify import classify, classify_volume
from correrender_tpu.render.dvr_fast import dvr_shearwarp


class TestClassify:
    def test_matches_tf_lookup(self):
        tf = TransferFunction.from_colormap("coolwarm", domain=(-1.0, 1.0))
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.uniform(-1.2, 1.2, size=(100,)).astype(np.float32))
        got = np.asarray(
            classify(v, tf.lut, jnp.asarray(tf.domain, jnp.float32),
                     premultiply=False)
        )
        want = np.asarray(tf(v))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_nan_zero(self):
        tf = TransferFunction.from_colormap("gray")
        out = np.asarray(
            classify(jnp.asarray([np.nan]), tf.lut,
                     jnp.asarray(tf.domain, jnp.float32))
        )
        np.testing.assert_allclose(out, 0.0)

    def test_volume_chunked(self):
        tf = TransferFunction.from_colormap("gray", domain=(0.0, 1.0))
        vol = jnp.asarray(
            np.random.default_rng(1).uniform(size=(9, 4, 4)).astype(
                np.float32
            )
        )
        out = classify_volume(vol, tf.lut,
                              jnp.asarray(tf.domain, jnp.float32), slab=4)
        assert out.shape == (9, 4, 4, 4)


def _camera_tf():
    cam = Camera(position=(0.05, 0.1, 0.9))
    tf = TransferFunction.from_colormap(
        "coolwarm", domain=(0.0, 1.0),
        opacity_points=((0.0, 0.0), (1.0, 0.9)),
    )
    return cam, tf


class TestShearWarp:
    @pytest.mark.parametrize("shape", [(32, 32, 32), (16, 32, 24)])
    def test_matches_marcher(self, shape):
        rng = np.random.default_rng(0)
        base = rng.uniform(size=shape).astype(np.float32)
        # Smooth the field so renderer differences (sampling pattern)
        # stay sub-pixel.
        from scipy.ndimage import gaussian_filter

        vol = jnp.asarray(gaussian_filter(base, 2.0))
        cam, tf = _camera_tf()
        img_fast = np.asarray(
            dvr_shearwarp(vol, cam, tf, image_size=(96, 96),
                          background=(0, 0, 0, 0))
        )
        img_ref = np.asarray(
            dvr_render(vol, cam, tf, image_size=(96, 96), voxel_step=0.5,
                       background=(0, 0, 0, 0))
        )
        # Compare where both rendered something (interior pixels).
        inter = (img_fast[..., 3] > 0.05) & (img_ref[..., 3] > 0.05)
        assert inter.mean() > 0.2
        diff = np.abs(img_fast[inter] - img_ref[inter])
        assert diff.mean() < 0.06
        # Silhouettes agree (edges differ slightly: the fast path uses
        # exact zero-outside box clipping, the marcher clamp-to-edge).
        assert (
            (img_fast[..., 3] > 0.05) == (img_ref[..., 3] > 0.05)
        ).mean() > 0.9

    def test_empty_volume_background(self):
        cam, tf = _camera_tf()
        img = np.asarray(
            dvr_shearwarp(jnp.zeros((16, 16, 16)), cam, tf,
                          image_size=(32, 32), background=(1, 0, 0, 1))
        )
        np.testing.assert_allclose(img[..., 0], 1.0, atol=1e-4)

    @pytest.mark.parametrize(
        "pos", [(0.9, 0.1, 0.05), (0.1, 0.9, 0.05), (-0.6, -0.5, -0.6)]
    )
    def test_other_axes_and_directions(self, pos):
        rng = np.random.default_rng(2)
        from scipy.ndimage import gaussian_filter

        vol = jnp.asarray(
            gaussian_filter(
                rng.uniform(size=(24, 24, 24)).astype(np.float32), 2.0
            )
        )
        cam = Camera(position=pos)
        tf = TransferFunction.from_colormap(
            "gray", domain=(0.0, 1.0), opacity_points=((0, 0), (1, 0.9))
        )
        img_fast = np.asarray(
            dvr_shearwarp(vol, cam, tf, image_size=(64, 64),
                          background=(0, 0, 0, 0))
        )
        img_ref = np.asarray(
            dvr_render(vol, cam, tf, image_size=(64, 64), voxel_step=0.5,
                       background=(0, 0, 0, 0))
        )
        inter = (img_fast[..., 3] > 0.05) & (img_ref[..., 3] > 0.05)
        assert inter.mean() > 0.1
        assert np.abs(img_fast[inter] - img_ref[inter]).mean() < 0.08

    @pytest.mark.parametrize(
        "pos",
        [(0.05, 0.1, 0.9), (0.8, 0.2, 0.1), (-0.5, -0.6, -0.4),
         (0.7, 0.7, 0.7)],
    )
    def test_matmul_warp_matches_marcher(self, pos):
        # The gather-free two-pass warp (with Catmull–Smith pass-order
        # selection) must agree with the exact marcher for all
        # principal axes and viewing directions.
        rng = np.random.default_rng(5)
        from scipy.ndimage import gaussian_filter

        vol = jnp.asarray(
            gaussian_filter(
                rng.uniform(size=(24, 28, 32)).astype(np.float32), 2.0
            )
        )
        cam = Camera(position=pos)
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(0.0, 1.0),
            opacity_points=((0.0, 0.0), (1.0, 0.9)),
        )
        m = np.asarray(
            dvr_shearwarp(vol, cam, tf, image_size=(96, 80),
                          warp="matmul", background=(0, 0, 0, 0))
        )
        r = np.asarray(
            dvr_render(vol, cam, tf, image_size=(96, 80), voxel_step=0.5,
                       background=(0, 0, 0, 0))
        )
        inter = (m[..., 3] > 0.05) & (r[..., 3] > 0.05)
        assert inter.mean() > 0.1
        assert np.abs(m[inter] - r[inter]).mean() < 0.02
        assert (
            (m[..., 3] > 0.05) == (r[..., 3] > 0.05)
        ).mean() > 0.93

    def test_reuses_classified(self):
        cam, tf = _camera_tf()
        vol = jnp.asarray(
            np.random.default_rng(3).uniform(size=(8, 8, 8)).astype(
                np.float32
            )
        )
        cvol = classify_volume(vol, tf.lut,
                               jnp.asarray(tf.domain, jnp.float32))
        img = dvr_shearwarp(vol, cam, tf, image_size=(16, 16),
                            classified=cvol)
        assert np.isfinite(np.asarray(img)).all()


class TestIsoShearwarp:
    @pytest.mark.parametrize("pos", [(0.0, 0.0, 0.9), (0.0, 0.9, 0.1)])
    def test_matches_marcher(self, pos):
        from correrender_tpu.render.iso import iso_render
        from correrender_tpu.render.iso_fast import iso_shearwarp

        n, r = 32, 0.35
        z, y, x = np.meshgrid(*[np.linspace(0, 1, n)] * 3, indexing="ij")
        vol = jnp.asarray(
            np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
            .astype(np.float32)
        )
        cam = Camera(position=pos)
        f = np.asarray(
            iso_shearwarp(vol, cam, r, image_size=(96, 80),
                          background=(0, 0, 0, 0))
        )
        m = np.asarray(
            iso_render(vol, cam, r, image_size=(96, 80),
                       background=(0, 0, 0, 0))
        )
        sil = ((f[..., 3] > 0.5) == (m[..., 3] > 0.5)).mean()
        assert sil > 0.9
        inter = (f[..., 3] > 0.5) & (m[..., 3] > 0.5)
        assert inter.mean() > 0.05
        # Shading deviates slightly on oblique views (interpolated
        # gradients vs texture probes) — keep a loose bound.
        assert np.abs(f[inter][:, :3] - m[inter][:, :3]).mean() < 0.1


class TestPreparedShearwarp:
    def test_prepared_matches_unprepared(self):
        from scipy.ndimage import gaussian_filter

        from correrender_tpu.render import Camera, TransferFunction
        from correrender_tpu.render.dvr_fast import (
            dvr_shearwarp,
            prepare_shearwarp,
        )

        rng = np.random.default_rng(0)
        vol = jnp.asarray(gaussian_filter(
            rng.uniform(size=(20, 18, 22)).astype(np.float32), 2.0))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(0.0, 1.0),
            opacity_points=((0.0, 0.0), (1.0, 0.9)),
        )
        cam = Camera(position=(0.1, 0.25, 0.85))
        prep = prepare_shearwarp(vol, tf, cam)
        got = np.asarray(dvr_shearwarp(
            vol, cam, tf, image_size=(64, 48), background=(0, 0, 0, 0),
            prepared=prep,
        ))
        want = np.asarray(dvr_shearwarp(
            vol, cam, tf, image_size=(64, 48), background=(0, 0, 0, 0),
        ))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_prepared_rebuilds_on_axis_change(self):
        from scipy.ndimage import gaussian_filter

        from correrender_tpu.render import Camera, TransferFunction
        from correrender_tpu.render.dvr_fast import (
            dvr_shearwarp,
            prepare_shearwarp,
        )

        rng = np.random.default_rng(1)
        vol = jnp.asarray(gaussian_filter(
            rng.uniform(size=(16, 16, 16)).astype(np.float32), 2.0))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(0.0, 1.0),
            opacity_points=((0.0, 0.0), (1.0, 0.9)),
        )
        prep = prepare_shearwarp(vol, tf, Camera(position=(0.0, 0.2, 0.8)))
        cam_x = Camera(position=(0.8, 0.2, 0.0))  # x-principal now
        got = np.asarray(dvr_shearwarp(
            vol, cam_x, tf, image_size=(48, 36), background=(0, 0, 0, 0),
            prepared=prep,
        ))
        want = np.asarray(dvr_shearwarp(
            vol, cam_x, tf, image_size=(48, 36), background=(0, 0, 0, 0),
        ))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_prepared_iso_matches(self):
        from scipy.ndimage import gaussian_filter

        from correrender_tpu.render import Camera
        from correrender_tpu.render.iso_fast import (
            iso_shearwarp,
            prepare_iso_shearwarp,
        )

        rng = np.random.default_rng(2)
        vol = jnp.asarray(gaussian_filter(
            rng.uniform(size=(18, 20, 16)).astype(np.float32), 2.0))
        for pos in ((0.1, 0.25, 0.85), (0.1, 0.2, -0.85)):
            cam = Camera(position=pos)
            prep = prepare_iso_shearwarp(vol, cam)
            got = np.asarray(iso_shearwarp(
                vol, cam, 0.5, image_size=(64, 48),
                background=(0, 0, 0, 0), prepared=prep,
            ))
            want = np.asarray(iso_shearwarp(
                vol, cam, 0.5, image_size=(64, 48),
                background=(0, 0, 0, 0),
            ))
            np.testing.assert_allclose(got, want, atol=1e-6)
