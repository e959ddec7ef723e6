"""Distributed shear-warp DVR vs the single-device renderer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from correrender_tpu.parallel.mesh import make_mesh
from correrender_tpu.parallel.dvr_sharded import dvr_shearwarp_sharded
from correrender_tpu.render import Camera, TransferFunction
from correrender_tpu.render.dvr_fast import dvr_shearwarp


@pytest.fixture(scope="module")
def smooth_volume():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    return jnp.asarray(
        gaussian_filter(
            rng.uniform(size=(32, 24, 28)).astype(np.float32), 2.0
        )
    )


def _tf():
    return TransferFunction.from_colormap(
        "coolwarm", domain=(0.0, 1.0),
        opacity_points=((0.0, 0.0), (1.0, 0.9)),
    )


@pytest.mark.parametrize("pos", [(0.05, 0.1, 0.9), (0.1, -0.05, -0.9)])
def test_sharded_matches_dense_z_principal(smooth_volume, pos):
    mesh = make_mesh(space=8, members=1)
    cam = Camera(position=pos)
    tf = _tf()
    got = np.asarray(
        dvr_shearwarp_sharded(
            smooth_volume, cam, tf, mesh, image_size=(96, 80),
            background=(0, 0, 0, 0),
        )
    )
    want = np.asarray(
        dvr_shearwarp(
            smooth_volume, cam, tf, image_size=(96, 80),
            background=(0, 0, 0, 0),
        )
    )
    _assert_images_match(got, want)


def _assert_images_match(got, want, atol=1.5e-2):
    # Compare premultiplied color — un-premultiplying a ~zero-alpha
    # pixel amplifies fp noise into meaningless RGB differences. The
    # tolerance covers bf16 compositing-order differences (per-shard
    # partials vs the dense path's 16-slice chunk tree).
    gp = np.concatenate([got[..., :3] * got[..., 3:4], got[..., 3:4]], -1)
    wp = np.concatenate([want[..., :3] * want[..., 3:4], want[..., 3:4]], -1)
    np.testing.assert_allclose(gp, wp, atol=atol)


def test_fallback_for_x_principal(smooth_volume):
    # xs=28 is not divisible by 8 shards -> gathered fallback path.
    mesh = make_mesh(space=8, members=1)
    cam = Camera(position=(0.9, 0.1, 0.05))
    tf = _tf()
    got = np.asarray(
        dvr_shearwarp_sharded(
            smooth_volume, cam, tf, mesh, image_size=(64, 64),
            background=(0, 0, 0, 0),
        )
    )
    want = np.asarray(
        dvr_shearwarp(
            smooth_volume, cam, tf, image_size=(64, 64),
            background=(0, 0, 0, 0),
        )
    )
    _assert_images_match(got, want)


@pytest.fixture(scope="module")
def divisible_volume():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(3)
    return jnp.asarray(
        gaussian_filter(
            rng.uniform(size=(16, 24, 32)).astype(np.float32), 2.0
        )
    )


@pytest.mark.parametrize("pos", [(0.9, 0.1, 0.05), (-0.05, 0.9, 0.1)])
def test_xy_principal_resharded(divisible_volume, pos):
    # x=32 / y=24 both divide 8 -> the all-to-all re-shard path runs.
    mesh = make_mesh(space=8, members=1)
    cam = Camera(position=pos)
    tf = _tf()
    got = np.asarray(
        dvr_shearwarp_sharded(
            divisible_volume, cam, tf, mesh, image_size=(64, 64),
            background=(0, 0, 0, 0),
        )
    )
    want = np.asarray(
        dvr_shearwarp(
            divisible_volume, cam, tf, image_size=(64, 64),
            background=(0, 0, 0, 0),
        )
    )
    _assert_images_match(got, want)


class TestIsoSharded:
    @pytest.mark.parametrize("pos", [(0.05, 0.1, 0.9), (0.1, -0.05, -0.9)])
    def test_matches_dense_z_principal(self, smooth_volume, pos):
        from correrender_tpu.parallel.iso_sharded import (
            iso_shearwarp_sharded,
        )
        from correrender_tpu.render.iso_fast import iso_shearwarp

        mesh = make_mesh(space=8, members=1)
        cam = Camera(position=pos)
        iso = float(np.quantile(np.asarray(smooth_volume), 0.6))
        got = np.asarray(
            iso_shearwarp_sharded(
                smooth_volume, cam, iso, mesh, image_size=(96, 80),
                background=(0, 0, 0, 0),
            )
        )
        want = np.asarray(
            iso_shearwarp(
                smooth_volume, cam, iso, image_size=(96, 80),
                background=(0, 0, 0, 0),
            )
        )
        _assert_images_match(got, want)
        assert (got[..., 3] > 0.5).any()  # surface visible

    def test_x_principal_resharded(self, divisible_volume):
        from correrender_tpu.parallel.iso_sharded import (
            iso_shearwarp_sharded,
        )
        from correrender_tpu.render.iso_fast import iso_shearwarp

        mesh = make_mesh(space=8, members=1)
        cam = Camera(position=(0.9, 0.1, 0.05))
        iso = float(np.quantile(np.asarray(divisible_volume), 0.6))
        got = np.asarray(
            iso_shearwarp_sharded(
                divisible_volume, cam, iso, mesh, image_size=(64, 48),
                background=(0, 0, 0, 0),
            )
        )
        want = np.asarray(
            iso_shearwarp(
                divisible_volume, cam, iso, image_size=(64, 48),
                background=(0, 0, 0, 0),
            )
        )
        _assert_images_match(got, want)

    @pytest.mark.parametrize("pos", [(0.05, 0.1, 0.9), (0.1, -0.05, -0.9)])
    def test_axial_supersample_matches_dense(self, smooth_volume, pos):
        """ss=2 sharded == ss=2 dense: midpoints at shard boundaries
        come from the halo slice, so the interleave is exact."""
        from correrender_tpu.parallel.iso_sharded import (
            iso_shearwarp_sharded,
        )
        from correrender_tpu.render.iso_fast import iso_shearwarp

        mesh = make_mesh(space=8, members=1)
        cam = Camera(position=pos)
        iso = float(np.quantile(np.asarray(smooth_volume), 0.6))
        got = np.asarray(
            iso_shearwarp_sharded(
                smooth_volume, cam, iso, mesh, image_size=(96, 80),
                background=(0, 0, 0, 0), axial_supersample=2,
            )
        )
        want = np.asarray(
            iso_shearwarp(
                smooth_volume, cam, iso, image_size=(96, 80),
                background=(0, 0, 0, 0), axial_supersample=2,
            )
        )
        _assert_images_match(got, want)
        # And the supersampled render differs from ss=1 (it's live).
        base = np.asarray(iso_shearwarp(
            smooth_volume, cam, iso, image_size=(96, 80),
            background=(0, 0, 0, 0)))
        assert np.abs(base - want).max() > 1e-4

    def test_uneven_shards_pad_inert_slices(self, smooth_volume):
        # 28 slices on 8 shards: padded with inert (g = -1)
        # slices and still sharded — previously a full replicated
        # fallback (round-3 review).
        from correrender_tpu.parallel.iso_sharded import (
            iso_shearwarp_sharded,
        )
        from correrender_tpu.render.iso_fast import iso_shearwarp

        mesh = make_mesh(space=8, members=1)
        cam = Camera(position=(0.9, 0.1, 0.05))  # xs=28, 28 % 8 != 0
        iso = float(np.quantile(np.asarray(smooth_volume), 0.6))
        got = np.asarray(
            iso_shearwarp_sharded(
                smooth_volume, cam, iso, mesh, image_size=(48, 36),
                background=(0, 0, 0, 0),
            )
        )
        want = np.asarray(
            iso_shearwarp(
                smooth_volume, cam, iso, image_size=(48, 36),
                background=(0, 0, 0, 0),
            )
        )
        _assert_images_match(got, want)


def test_eye_inside_box_falls_back(stack_mesh=None):
    # Camera inside the slab: the sharded shear-warp must route to the
    # (gathered) exact fallback instead of compositing mirrored
    # content (round-3 review; same guard as the dense fast paths).
    import numpy as np
    import jax.numpy as jnp

    from correrender_tpu.parallel.dvr_sharded import dvr_shearwarp_sharded
    from correrender_tpu.parallel.mesh import make_mesh
    from correrender_tpu.render.camera import Camera
    from correrender_tpu.render.dvr import dvr_render
    from correrender_tpu.render.tf import TransferFunction

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((16, 16, 16), np.float32))
    tf = TransferFunction.from_colormap(
        "coolwarm", domain=(0, 1),
        opacity_points=((0.0, 0.2), (1.0, 0.8)),
    )
    cam = Camera(position=(0.02, 0.01, 0.1))
    mesh = make_mesh(space=8, members=1)
    got = np.asarray(
        dvr_shearwarp_sharded(vol, cam, tf, mesh, image_size=(48, 36))
    )
    want = np.asarray(dvr_render(vol, cam, tf, image_size=(48, 36)))
    np.testing.assert_array_equal(got, want)


def test_dvr_uneven_shards_pad_inert_slices(smooth_volume):
    # z = 32 is divisible; slice axis y = 24 on 8 shards divides too,
    # so crop z to 27 (27 % 8 != 0) to hit the padded path for a
    # z-principal camera.
    vol = smooth_volume[:27]
    mesh = make_mesh(space=8, members=1)
    cam = Camera(position=(0.05, 0.1, 0.9))
    tf = _tf()
    got = np.asarray(
        dvr_shearwarp_sharded(vol, cam, tf, mesh, image_size=(96, 80),
                              background=(0, 0, 0, 0)))
    want = np.asarray(
        dvr_shearwarp(vol, cam, tf, image_size=(96, 80),
                      background=(0, 0, 0, 0)))
    _assert_images_match(got, want)


def test_iso_uneven_z_pads(smooth_volume):
    # Non-divisible zs exercises BOTH pads: the classify/gradient
    # z-pad (wrap rows + n_real_z boundary handling) and the
    # compositing-axis inert-slice pad.
    from correrender_tpu.parallel.iso_sharded import iso_shearwarp_sharded
    from correrender_tpu.render.iso_fast import iso_shearwarp

    vol = smooth_volume[:27]
    mesh = make_mesh(space=8, members=1)
    cam = Camera(position=(0.05, 0.1, 0.9))
    iso = float(np.quantile(np.asarray(vol), 0.6))
    got = np.asarray(
        iso_shearwarp_sharded(vol, cam, iso, mesh, image_size=(64, 48),
                              background=(0, 0, 0, 0)))
    want = np.asarray(
        iso_shearwarp(vol, cam, iso, image_size=(64, 48),
                      background=(0, 0, 0, 0)))
    _assert_images_match(got, want)
