"""Picking, markers, camera paths, .field loader, tet export,
profiling zones."""

import os
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.render import Camera
from correrender_tpu.render.picking import (
    pick_voxel,
    render_reference_point_marker,
)
from correrender_tpu.app.camera_path import (
    orbit_path,
    keyframe_path,
    render_flythrough,
)
from correrender_tpu.io.base import loader_for_path
from correrender_tpu.io.writers import (
    write_tet_mesh,
    voxels_to_tet_mesh,
)
from correrender_tpu.utils.profiling import zone, timing_summary


BOX = (np.array([-0.25, -0.25, -0.25], np.float32),
       np.array([0.25, 0.25, 0.25], np.float32))


class TestPicking:
    def test_center_pixel_hits_near_face(self):
        cam = Camera(position=(0.0, 0.0, 0.9))
        vox = pick_voxel(cam, (32, 32), (64, 64), (16, 16, 16), BOX)
        assert vox is not None
        x, y, z = vox
        assert z == 15  # near face toward +z camera
        assert 6 <= x <= 9 and 6 <= y <= 9

    def test_miss_returns_none(self):
        cam = Camera(position=(0.0, 0.0, 0.9))
        assert pick_voxel(cam, (0, 0), (64, 64), (16, 16, 16), BOX) is None

    def test_fixed_z_plane(self):
        cam = Camera(position=(0.0, 0.0, 0.9))
        vox = pick_voxel(cam, (32, 32), (64, 64), (16, 16, 16), BOX,
                         fixed_z_fraction=0.5)
        assert vox is not None
        assert vox[2] == 8

    def test_marker_drawn_at_projection(self):
        cam = Camera(position=(0.0, 0.0, 0.9))
        img = np.asarray(
            render_reference_point_marker(
                cam, (8, 8, 8), (16, 16, 16), BOX, image_size=(64, 64)
            )
        )
        # Red disc near the center (centroid of the red channel).
        red = img[..., 0]
        ys, xs = np.mgrid[: img.shape[0], : img.shape[1]]
        cy = (ys * red).sum() / red.sum()
        cx = (xs * red).sum() / red.sum()
        assert abs(cx - 33) < 3 and abs(cy - 31) < 3
        assert red.max() > 0.9


class TestCameraPath:
    def test_orbit_path_closes(self):
        cams = orbit_path(8, radius=0.8)
        assert len(cams) == 8
        for c in cams:
            assert np.linalg.norm(np.asarray(c.position)) == (
                pytest.approx(0.8, abs=1e-5)
            )

    def test_keyframe_interpolation(self):
        keys = [
            Camera(position=(0, 0, 1)),
            Camera(position=(1, 0, 0)),
        ]
        cams = keyframe_path(keys, 5)
        assert len(cams) == 5
        np.testing.assert_allclose(cams[0].position, (0, 0, 1), atol=1e-6)
        np.testing.assert_allclose(cams[-1].position, (1, 0, 0), atol=1e-6)

    def test_flythrough_renders_frames(self, tmp_path):
        from tests.test_app import make_scene

        scene, _ = make_scene(8)
        scene.add_renderer("domain_outline")
        files = render_flythrough(
            scene, orbit_path(3), str(tmp_path), image_size=(32, 32)
        )
        assert len(files) == 3
        assert all(os.path.getsize(f) > 0 for f in files)


class TestFieldFile:
    def test_vec3_float(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(4, 3, 2, 3)).astype(np.float32)  # z,y,x,c
        path = str(tmp_path / "flow.field")
        with open(path, "wb") as f:
            f.write(struct.pack("<3I3I", 2, 3, 4, 3, 1, 0))  # res xyz
            f.write(np.ascontiguousarray(data).tobytes())
        ld = loader_for_path(path).open(path)
        assert ld.field_names == ["u", "v", "w"]
        u = ld.load_field("u")
        np.testing.assert_allclose(u, data[..., 0], rtol=1e-6)

    def test_vec4_half(self, tmp_path):
        data = np.ones((2, 2, 2, 4), np.float16)
        path = str(tmp_path / "p.field")
        with open(path, "wb") as f:
            f.write(struct.pack("<3I3I", 2, 2, 2, 3, 1, 1))
            f.write(data.tobytes())
        ld = loader_for_path(path).open(path)
        assert "p" in ld.field_names


class TestTetMesh:
    def test_voxels_to_tets_and_export(self, tmp_path):
        vol = np.zeros((4, 4, 4), np.float32)
        vol[1:3, 1:3, 1:3] = 1.0  # one full interior cell
        verts, tets = voxels_to_tet_mesh(vol, 0.5)
        assert len(verts) == 8
        assert len(tets) == 6
        path = str(tmp_path / "m.vtk")
        write_tet_mesh(path, verts, tets)
        txt = open(path).read()
        assert "UNSTRUCTURED_GRID" in txt
        assert txt.count("\n10") + txt.count("10\n") >= 6

    def test_empty(self):
        verts, tets = voxels_to_tet_mesh(np.zeros((3, 3, 3)), 0.5)
        assert len(verts) == 0 and len(tets) == 0


class TestProfiling:
    def test_zones_accumulate(self):
        with zone("test_zone"):
            _ = jnp.sum(jnp.ones(100))
        with zone("test_zone"):
            pass
        summary = timing_summary()
        assert summary["test_zone"]["count"] == 2
        assert summary["test_zone"]["total_ms"] >= 0
        assert timing_summary() == {}  # reset
