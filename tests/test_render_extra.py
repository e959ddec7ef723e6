"""Isosurface raycast/mesh, slice and outline renderer tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.render import Camera, TransferFunction
from correrender_tpu.render.iso import iso_render
from correrender_tpu.render.slice_renderer import slice_image, slice_render_3d
from correrender_tpu.render.outline import outline_render
from correrender_tpu.render.mesh import extract_isosurface, vertex_normals


def sphere_volume(n=32, radius=0.35):
    z, y, x = np.meshgrid(
        np.linspace(0, 1, n), np.linspace(0, 1, n), np.linspace(0, 1, n),
        indexing="ij",
    )
    return (
        np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
        .astype(np.float32)
    ), radius


class TestIsoRaycast:
    def test_sphere_silhouette(self):
        vol, r = sphere_volume()
        cam = Camera(position=(0.0, 0.0, 0.9))
        img = np.asarray(
            iso_render(
                jnp.asarray(vol), cam, r, image_size=(64, 64),
                background=(0, 0, 0, 0),
            )
        )
        h, w = img.shape[:2]
        assert img[h // 2, w // 2, 3] == 1.0  # hit at center
        assert img[2, 2, 3] == 0.0  # miss at corner
        # Shading varies across the sphere (not flat).
        hits = img[..., 3] > 0
        assert img[..., 0][hits].std() > 0.01

    def test_no_surface_shows_background(self):
        vol = jnp.zeros((8, 8, 8))
        cam = Camera(position=(0.0, 0.0, 0.9))
        img = np.asarray(
            iso_render(vol, cam, 0.5, background=(0, 0, 1, 1),
                       image_size=(16, 16))
        )
        np.testing.assert_allclose(img[..., 2], 1.0)


class TestSlice:
    def test_slice_image_values(self):
        vol = np.zeros((8, 8, 8), np.float32)
        vol[4] = 1.0  # bright z-plane
        tf = TransferFunction.from_colormap("gray", domain=(0.0, 1.0))
        img = np.asarray(
            slice_image(jnp.asarray(vol), tf, axis="z",
                        position=(4 + 0.5) / 8)
        )
        assert img.shape == (8, 8, 4)
        assert img[4, 4, 0] > 0.95  # white

    def test_slice_3d_plane_visible(self):
        vol = jnp.ones((8, 8, 8)) * 0.8
        tf = TransferFunction.constant_opacity("gray", alpha=1.0)
        cam = Camera(position=(0.3, 0.4, 0.9))
        img = np.asarray(
            slice_render_3d(vol, cam, tf, axis="z", position=0.5,
                            image_size=(32, 32), background=(0, 0, 0, 0))
        )
        assert img[..., 3].max() == 1.0
        assert img[..., 3].min() == 0.0


class TestOutline:
    def test_wireframe_drawn(self):
        cam = Camera(position=(0.4, 0.3, 0.9))
        box = (np.array([-0.25, -0.25, -0.25]), np.array([0.25, 0.25, 0.25]))
        img = np.asarray(
            outline_render(cam, box, image_size=(64, 64),
                           color=(1, 0, 0, 1))
        )
        # Layer mode emits STRAIGHT rgba: constant line color, the
        # wireframe coverage lives in alpha (round-3 convention fix).
        assert img[..., 0].max() > 0.9  # red lines present
        assert img[..., 3].max() == 1.0
        assert (img[..., 3] > 0.5).mean() < 0.35  # coverage is sparse

    def test_connecting_line_face_selection(self):
        # Reference HEBChart::getLinePositions (HEBChart.cpp:944-954):
        # per axis, each endpoint takes the face of its box FACING the
        # other box, or the midpoint when centers align on that axis.
        from correrender_tpu.render.outline import connecting_line_points

        box_a = (np.array([0.0, 0.0, 0.0]), np.array([1.0, 1.0, 1.0]))
        box_b = (np.array([3.0, 0.0, 0.0]), np.array([4.0, 1.0, 1.0]))
        p0, p1 = connecting_line_points(box_a, box_b)
        # x: a faces +x (max face), b faces -x (min face); y/z aligned
        # → midpoints.
        assert np.allclose(p0, [1.0, 0.5, 0.5])
        assert np.allclose(p1, [3.0, 0.5, 0.5])

        box_c = (np.array([0.0, 2.0, -3.0]), np.array([1.0, 3.0, -2.0]))
        p0, p1 = connecting_line_points(box_a, box_c)
        assert np.allclose(p0, [0.5, 1.0, 0.0])   # +y face, -z face
        assert np.allclose(p1, [0.5, 2.0, -2.0])  # -y face, +z face

    def test_segments_render_draws_line(self):
        from correrender_tpu.render.outline import segments_render

        cam = Camera(position=(0.0, 0.0, 1.2))
        p0 = np.array([[-0.3, 0.0, 0.0]], np.float32)
        p1 = np.array([[0.3, 0.0, 0.0]], np.float32)
        img = np.asarray(
            segments_render(cam, p0, p1, image_size=(64, 64),
                            color=(0, 1, 0, 1))
        )
        assert img[..., 1].max() > 0.9  # green line present
        assert (img[..., 3] > 0.5).mean() < 0.2
        # Over a base image, the line composites instead of layering.
        base = np.zeros((64, 64, 4), np.float32)
        base[..., 3] = 1.0
        over = np.asarray(
            segments_render(cam, p0, p1, image_size=(64, 64),
                            color=(0, 1, 0, 1), base_image=base)
        )
        assert over[..., 1].max() > 0.5
        # An endpoint behind the camera masks the segment out.
        p_behind = np.array([[0.0, 0.0, 5.0]], np.float32)
        masked = np.asarray(
            segments_render(cam, p0, p_behind, image_size=(64, 64),
                            color=(0, 1, 0, 1))
        )
        assert masked[..., 3].max() == 0.0


class TestMesh:
    def test_sphere_mesh(self):
        vol, r = sphere_volume(24)
        verts, tris = extract_isosurface(vol, r)
        assert len(verts) > 100
        assert len(tris) > 100
        # All vertices near the sphere surface (voxel space, center 11.5).
        center = np.array([11.5, 11.5, 11.5])
        d = np.linalg.norm(verts - center, axis=-1)
        np.testing.assert_allclose(d / 23.0, r, atol=0.05)

    def test_normals_point_outward(self):
        vol, r = sphere_volume(24)
        verts, tris = extract_isosurface(vol, r)
        normals = vertex_normals(verts, tris)
        center = np.array([11.5, 11.5, 11.5])
        outward = verts - center
        outward /= np.linalg.norm(outward, axis=-1, keepdims=True)
        dots = np.sum(normals * outward, axis=-1)
        # Consistent orientation: most normals aligned one way.
        assert abs(dots.mean()) > 0.8

    def test_empty_iso(self):
        vol = np.zeros((6, 6, 6), np.float32)
        verts, tris = extract_isosurface(vol, 0.5)
        assert len(verts) == 0 and len(tris) == 0

    def test_obj_export_roundtrip(self, tmp_path):
        from correrender_tpu.io import writers

        vol, r = sphere_volume(16)
        verts, tris = extract_isosurface(vol, r)
        path = str(tmp_path / "sphere.obj")
        writers.write_obj(path, verts, tris, vertex_normals(verts, tris))
        lines = open(path).read().splitlines()
        nv = sum(1 for l in lines if l.startswith("v "))
        nf = sum(1 for l in lines if l.startswith("f "))
        assert nv == len(verts) and nf == len(tris)


class TestIsoParityModes:
    def test_analytic_matches_bisection(self):
        import jax.numpy as jnp

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso import iso_render

        n = 32
        z, y, x = np.meshgrid(*[np.linspace(0, 1, n)] * 3, indexing="ij")
        sphere = np.sqrt(
            (x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2
        ).astype(np.float32)
        cam = Camera(position=(0.0, 0.2, 0.8))
        a = np.asarray(iso_render(jnp.asarray(sphere), cam, 0.3,
                                  image_size=(64, 48)))
        b = np.asarray(iso_render(jnp.asarray(sphere), cam, 0.3,
                                  image_size=(64, 48),
                                  intersection_mode="analytic"))
        # Same silhouette; shading within refinement tolerance.
        assert ((a[..., 3] > .5) == (b[..., 3] > .5)).all()
        np.testing.assert_allclose(a, b, atol=0.02)

    def test_snapmc_drops_slivers(self):
        from correrender_tpu.render.mesh import extract_isosurface

        n = 20
        z, y, x = np.meshgrid(*[np.linspace(0, 1, n)] * 3, indexing="ij")
        sphere = np.sqrt(
            (x - .5) ** 2 + (y - .5) ** 2 + (z - .5) ** 2
        ).astype(np.float32)
        v0, t0 = extract_isosurface(sphere, 0.3)
        v1, t1 = extract_isosurface(sphere, 0.3, snap_gamma=0.3)
        assert len(t1) < len(t0)  # slivers removed

        def min_area(v, t):
            a = v[t[:, 1]] - v[t[:, 0]]
            b = v[t[:, 2]] - v[t[:, 0]]
            return 0.5 * np.linalg.norm(np.cross(a, b), axis=1).min()

        assert min_area(v1, t1) > 2 * min_area(v0, t0)
        # Surface still near the sphere (within one voxel).
        r = np.linalg.norm(v1 / (n - 1) - 0.5, axis=1)
        assert np.abs(r - 0.3).max() < 1.5 / (n - 1)


class TestNanMode:
    def test_yellow_marks_nan_voxels(self):
        import jax.numpy as jnp

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.dvr import dvr_render
        from correrender_tpu.render.tf import TransferFunction

        vol = np.full((8, 8, 8), np.nan, np.float32)
        vol[2:6, 2:6, 2:6] = 0.5
        cam = Camera(position=(0.0, 0.2, 0.8))
        tf = TransferFunction.from_colormap("coolwarm", domain=(0, 1))
        a = np.asarray(dvr_render(jnp.asarray(vol), cam, tf,
                                  image_size=(48, 36)))
        b = np.asarray(dvr_render(jnp.asarray(vol), cam, tf,
                                  image_size=(48, 36), nan_mode="yellow"))
        assert np.isfinite(a).all() and np.isfinite(b).all()
        yellow = (b[..., 0] > 0.9) & (b[..., 1] > 0.9) & (b[..., 2] < 0.1)
        assert yellow.any()
        # ignore mode renders NaN as fully transparent instead.
        assert not ((a[..., 0] > 0.9) & (a[..., 1] > 0.9)
                    & (a[..., 2] < 0.1)).any()


class TestIntersectionSolvers:
    def test_all_solvers_agree_on_smooth_surface(self):
        # The four solver modes (reference IntersectionSolver enum)
        # must find the same sphere surface to sub-step accuracy.
        import jax.numpy as jnp

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso import iso_render

        zz, yy, xx = np.mgrid[0:16, 0:16, 0:16] / 15.0
        sph = (0.6 - np.sqrt((xx - .5) ** 2 + (yy - .5) ** 2
                             + (zz - .5) ** 2)).astype(np.float32)
        cam = Camera(position=(0.0, 0.2, 0.8))
        kw = dict(image_size=(48, 36), background=(0, 0, 0, 0))
        imgs = {
            m: np.asarray(iso_render(jnp.asarray(sph), cam, 0.35,
                                     intersection_mode=m, **kw))
            for m in ("bisection", "linear", "marmitt", "analytic")
        }
        ref = imgs["analytic"]
        for m, im in imgs.items():
            assert (im[..., 3] > 0.5).sum() == (ref[..., 3] > 0.5).sum()
            assert np.abs(im - ref).max() < 0.05, m


class TestClosedSurface:
    def test_caps_boundary_cut(self):
        # Volume entirely above the iso value: the open surface has no
        # sign change (nothing rendered); the closed variant caps the
        # box faces (CLOSE_ISOSURFACES, IsoSurfaceRayCasting.glsl:728).
        import jax.numpy as jnp

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso import iso_render

        vol = np.full((8, 8, 8), 1.0, np.float32)
        cam = Camera(position=(0.0, 0.2, 0.8))
        kw = dict(image_size=(48, 36), background=(0, 0, 0, 0))
        a = np.asarray(iso_render(jnp.asarray(vol), cam, 0.5, **kw))
        b = np.asarray(iso_render(jnp.asarray(vol), cam, 0.5,
                                  closed_surface=True, **kw))
        assert int((a[..., 3] > 0.5).sum()) == 0
        assert int((b[..., 3] > 0.5).sum()) > 500

    def test_interior_surface_unchanged(self):
        # A surface that never touches the boundary renders
        # identically in both modes.
        import jax.numpy as jnp

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso import iso_render

        zz, yy, xx = np.mgrid[0:16, 0:16, 0:16] / 15.0
        sph = (0.6 - np.sqrt((xx - .5) ** 2 + (yy - .5) ** 2
                             + (zz - .5) ** 2)).astype(np.float32)
        cam = Camera(position=(0.0, 0.2, 0.8))
        kw = dict(image_size=(48, 36), background=(0, 0, 0, 0))
        c = np.asarray(iso_render(jnp.asarray(sph), cam, 0.35, **kw))
        d = np.asarray(iso_render(jnp.asarray(sph), cam, 0.35,
                                  closed_surface=True, **kw))
        np.testing.assert_allclose(c, d, atol=1e-6)


class TestModelTransform:
    def test_identity_matches_untransformed(self):
        import jax.numpy as jnp

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.dvr import dvr_render
        from correrender_tpu.render.tf import TransferFunction

        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.random((16, 16, 16)).astype(np.float32))
        cam = Camera(position=(0.0, 0.2, 0.8))
        tf = TransferFunction.from_colormap("coolwarm", domain=(0, 1))
        a = np.asarray(dvr_render(vol, cam, tf, image_size=(48, 36)))
        b = np.asarray(dvr_render(vol, cam, tf, image_size=(48, 36),
                                  model_matrix=np.eye(4)))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_rotation_matches_rotated_volume(self):
        # Rendering a z-rotated model must equal rendering the
        # pre-rotated volume (90° about z maps cleanly onto the grid).
        import jax.numpy as jnp

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.dvr import dvr_render
        from correrender_tpu.render.tf import TransferFunction

        rng = np.random.default_rng(1)
        vol = rng.random((16, 16, 16)).astype(np.float32)
        # Model matrix (x, y) → (-y, x); the equivalent pre-rotated
        # grid is rot90 with k=-1 over (y, x) (verified exact on CPU).
        vol_rot = np.rot90(vol, k=-1, axes=(1, 2)).copy()
        m = np.eye(4, dtype=np.float32)
        m[0, 0] = 0.0; m[0, 1] = -1.0
        m[1, 0] = 1.0; m[1, 1] = 0.0
        cam = Camera(position=(0.1, 0.25, 0.8))
        tf = TransferFunction.from_colormap("coolwarm", domain=(0, 1))
        a = np.asarray(dvr_render(jnp.asarray(vol), cam, tf,
                                  image_size=(48, 36), model_matrix=m))
        b = np.asarray(dvr_render(jnp.asarray(vol_rot), cam, tf,
                                  image_size=(48, 36)))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_iso_rotation_matches_rotated_volume(self):
        # Same 90-degree-z check for the isosurface raycaster.
        import jax.numpy as jnp

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso import iso_render

        rng = np.random.default_rng(3)
        vol = rng.random((16, 16, 16)).astype(np.float32)
        vol_rot = np.rot90(vol, k=-1, axes=(1, 2)).copy()
        m = np.eye(4, dtype=np.float32)
        m[0, 0] = 0.0; m[0, 1] = -1.0
        m[1, 0] = 1.0; m[1, 1] = 0.0
        cam = Camera(position=(0.1, 0.25, 0.8))
        a = np.asarray(iso_render(jnp.asarray(vol), cam, 0.5,
                                  image_size=(48, 36), model_matrix=m))
        b = np.asarray(iso_render(jnp.asarray(vol_rot), cam, 0.5,
                                  image_size=(48, 36)))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_catalog_transform_routes_exact_path(self, tmp_path):
        import json

        from correrender_tpu.io import load_catalog, writers
        from correrender_tpu.io.catalog import open_dataset
        from correrender_tpu.app.state import Scene

        rng = np.random.default_rng(2)
        vol = rng.random((8, 8, 8)).astype(np.float32)
        writers.write_netcdf(str(tmp_path / "t.nc"), vol)
        catalog = {"datasets": [{
            "name": "t", "filename": "t.nc",
            "transform": "0 -1 0 0  1 0 0 0  0 0 1 0  0 0 0 1",
        }]}
        (tmp_path / "datasets.json").write_text(json.dumps(catalog))
        info = load_catalog(str(tmp_path / "datasets.json"))[0]
        vd = open_dataset(info)
        assert vd.model_matrix.shape == (4, 4)
        scene = Scene(vd)
        scene.add_renderer("dvr")
        img = np.asarray(scene.render_view(0, image_size=(32, 24)))
        assert np.isfinite(img).all()
        # iso_ray also honors the transform (routes around the
        # axis-aligned shear-warp fast path).
        scene2 = Scene(vd)
        scene2.add_renderer("iso_ray", iso_value=0.5)
        img2 = np.asarray(scene2.render_view(0, image_size=(32, 24)))
        assert np.isfinite(img2).all()


class TestEyeInsideFallback:
    def test_dvr_shearwarp_inside_box_matches_exact(self):
        # Eye inside the slab: behind-eye slices flip the projection
        # sign and the shear-warp composites mirrored content (round-3
        # review). Inside-box cameras must take the exact marcher.
        from correrender_tpu.render.dvr import dvr_render
        from correrender_tpu.render.dvr_fast import dvr_shearwarp
        from correrender_tpu.render.tf import TransferFunction

        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.random((24, 24, 24), np.float32))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(0, 1),
            opacity_points=((0.0, 0.2), (1.0, 0.8)),
        )
        cam = Camera(position=(0.02, 0.01, 0.1))  # inside ±0.25 box
        fast = np.asarray(
            dvr_shearwarp(vol, cam, tf, image_size=(64, 48))
        )
        exact = np.asarray(
            dvr_render(vol, cam, tf, image_size=(64, 48))
        )
        np.testing.assert_array_equal(fast, exact)  # literal fallback
        assert np.isfinite(fast).all()

    def test_iso_shearwarp_inside_box_matches_exact(self):
        from correrender_tpu.render.iso import iso_render
        from correrender_tpu.render.iso_fast import iso_shearwarp

        vol, _ = sphere_volume(24), None
        vol = vol[0] if isinstance(vol, tuple) else vol
        cam = Camera(position=(0.0, 0.02, 0.05))
        fast = np.asarray(
            iso_shearwarp(vol, cam, 0.5, image_size=(64, 48))
        )
        exact = np.asarray(
            iso_render(vol, cam, 0.5, image_size=(64, 48))
        )
        np.testing.assert_array_equal(fast, exact)


class TestOutlineDegenerateCorner:
    def test_corner_in_camera_plane_no_nan(self):
        # A corner with w_clip == 0 projects to inf/NaN; the invalid-
        # edge mask must be a where (NaN * 0.0 = NaN poisoned every
        # pixel through the max — round-3 review).
        from correrender_tpu.render.outline import outline_render

        box = (np.array([-0.25, -0.25, -0.25], np.float32),
               np.array([0.25, 0.25, 0.25], np.float32))
        # Eye placed so a corner lies exactly in the camera plane
        # (z_view == 0 for that corner).
        cam = Camera(position=(0.25, 0.25, 0.25),
                     look_at_point=(-0.25, -0.25, -0.25))
        img = np.asarray(
            outline_render(cam, box, image_size=(48, 32))
        )
        assert np.isfinite(img).all()


class TestMeshWatertight:
    def test_closed_surface_every_edge_shared_twice(self):
        # A sphere fully inside the grid extracts a CLOSED surface:
        # every edge must belong to exactly two triangles. The broken
        # 6-tet table (fanned around a face diagonal; ~25% of each
        # cell uncovered) produced boundary edges everywhere.
        from collections import Counter

        vol, r = sphere_volume(20)
        verts, tris = extract_isosurface(vol, r)
        assert len(tris) > 100
        # Deduplicate vertices (tets emit per-triangle corners).
        key = np.round(np.asarray(verts), 4)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        edges = Counter()
        for t in np.asarray(tris):
            a, b, c = inv[t[0]], inv[t[1]], inv[t[2]]
            for e in ((a, b), (b, c), (c, a)):
                edges[tuple(sorted(e))] += 1
        counts = np.array(list(edges.values()))
        assert (counts == 2).all(), (
            f"{(counts != 2).sum()} non-manifold edges "
            f"(min {counts.min()}, max {counts.max()})"
        )


class TestColorLegend:
    def test_overlay_draws_bar_and_labels(self):
        from correrender_tpu.render.legend import color_legend_overlay

        img = np.zeros((240, 320, 4), np.float32)
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(-1.234, 5.678)
        )
        out = np.asarray(color_legend_overlay(img, tf))
        assert out.shape == img.shape
        # Gradient bar on the right, opaque, colored.
        right = out[:, 260:]
        assert right[..., 3].max() == 1.0
        assert right[..., :3].std() > 0.05
        # Left half untouched.
        np.testing.assert_array_equal(out[:, :160], img[:, :160])

    def test_scene_show_legend(self):
        from correrender_tpu.app.state import Scene
        from correrender_tpu.core import GridMetadata, VolumeData

        vol, _ = sphere_volume(16)
        vd = VolumeData(GridMetadata(xs=16, ys=16, zs=16, es=1))
        vd.add_field("f", lambda t, e: np.asarray(vol))
        sc = Scene(vd, views=[Camera(position=(0.1, 0.2, 0.8))])
        sc.add_renderer("dvr", field="f")
        plain = np.asarray(sc.render_view(0, image_size=(96, 72)))
        with_legend = np.asarray(
            sc.render_view(0, image_size=(96, 72), show_legend=True)
        )
        assert not np.array_equal(plain, with_legend)


class TestFixedZPickScrub:
    """Fixed-z-plane depth scrub (PointPicker.cpp:96-135): first/last
    must follow the pick ray's z sign — a camera below the volume
    previously got an inverted clamp that pinned the focus to the top
    face (round-3 review)."""

    BOX = ((-0.5, -0.5, -0.25), (0.5, 0.5, 0.25))

    def _hit(self, cam_z):
        from correrender_tpu.render.picking import pick_hit_points

        cam = Camera(position=(0.05, 0.1, cam_z))
        return pick_hit_points(cam, (48, 36), (96, 72), self.BOX,
                               fixed_z_fraction=0.5)

    @pytest.mark.parametrize("cam_z", [0.9, -0.9])
    def test_scrub_spans_volume_both_sides(self, cam_z):
        from correrender_tpu.render.picking import scrub_focus

        hit = self._hit(cam_z)
        assert hit is not None
        first, last, d = hit["first"], hit["last"], hit["direction"]
        # first = near z face, last = far face, along the ray's z sign.
        assert np.sign(d[2]) == np.sign(-cam_z)
        assert np.dot(last - first, d) > 0
        span = abs(self.BOX[1][2] - self.BOX[0][2])
        # Forward scrub clamps at the FAR face, backward at the near
        # face — for both camera sides.
        scrub_focus(hit, 100.0)
        assert hit["focus"][2] == pytest.approx(last[2])
        scrub_focus(hit, -100.0)
        assert hit["focus"][2] == pytest.approx(first[2])
        # A small scrub from the plane stays strictly inside.
        hit = self._hit(cam_z)
        scrub_focus(hit, span / 8)
        lo, hi = sorted((first[2], last[2]))
        assert lo <= hit["focus"][2] <= hi


class TestObliqueSlice:
    """Oblique plane + lighting/NaN/ground parity
    (SliceRenderer.cpp:360-412, Slice.glsl)."""

    def _tf(self):
        return TransferFunction.constant_opacity("gray", alpha=1.0)

    def test_axis_normal_matches_axis_path(self):
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.random((8, 8, 8)), jnp.float32)
        cam = Camera(position=(0.3, 0.4, 0.9))
        kw = dict(image_size=(32, 32), background=(0, 0, 0, 0))
        a = np.asarray(slice_render_3d(
            vol, cam, self._tf(), axis="z", position=0.4, **kw))
        b = np.asarray(slice_render_3d(
            vol, cam, self._tf(), normal=(0, 0, 1), position=0.4, **kw))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_diagonal_plane_renders(self):
        vol = jnp.ones((8, 8, 8)) * 0.8
        cam = Camera(position=(0.3, 0.4, 0.9))
        img, depth = slice_render_3d(
            vol, cam, self._tf(), normal=(1, 1, 1), position=0.5,
            image_size=(32, 32), background=(0, 0, 0, 0),
            return_depth=True,
        )
        img, depth = np.asarray(img), np.asarray(depth)
        assert img[..., 3].max() == 1.0  # plane visible
        assert np.isfinite(depth).any()
        # plane_dist form must agree with the position form.
        n = np.ones(3) / np.sqrt(3.0)
        from correrender_tpu.render.camera import default_render_box

        bmin, bmax = default_render_box((8, 8, 8))
        corners = np.array([[x, y, z]
                            for x in (bmin[0], bmax[0])
                            for y in (bmin[1], bmax[1])
                            for z in (bmin[2], bmax[2])])
        proj = corners @ n
        d = proj.min() + 0.5 * (proj.max() - proj.min())
        img2 = np.asarray(slice_render_3d(
            vol, cam, self._tf(), normal=(1, 1, 1), plane_dist=d,
            image_size=(32, 32), background=(0, 0, 0, 0),
        ))
        np.testing.assert_allclose(img, img2, atol=1e-6)

    def test_lighting_factor_blends(self):
        vol = jnp.ones((8, 8, 8)) * 0.8
        cam = Camera(position=(0.3, 0.4, 0.9))
        kw = dict(normal=(1, 0, 1), position=0.5,
                  image_size=(32, 32), background=(0, 0, 0, 0))
        flat = np.asarray(slice_render_3d(
            vol, cam, self._tf(), lighting_factor=0.0, **kw))
        lit = np.asarray(slice_render_3d(
            vol, cam, self._tf(), lighting_factor=1.0, **kw))
        hits = flat[..., 3] > 0
        assert hits.any()
        assert np.abs(flat[..., :3][hits] - lit[..., :3][hits]).max() \
            > 0.01  # shading changes color ...
        np.testing.assert_allclose(flat[..., 3], lit[..., 3])  # not alpha

    def test_nan_yellow(self):
        vol = np.full((8, 8, 8), np.nan, np.float32)
        cam = Camera(position=(0.0, 0.0, 0.9))
        img = np.asarray(slice_render_3d(
            jnp.asarray(vol), cam, self._tf(), axis="z", position=0.5,
            nan_handling="yellow", image_size=(24, 24),
            background=(0, 0, 0, 0),
        ))
        hits = img[..., 3] > 0
        assert hits.any()
        np.testing.assert_allclose(img[..., 0][hits], 1.0, atol=1e-5)
        np.testing.assert_allclose(img[..., 1][hits], 1.0, atol=1e-5)
        np.testing.assert_allclose(img[..., 2][hits], 0.0, atol=1e-5)
        ign = np.asarray(slice_render_3d(
            jnp.asarray(vol), cam, self._tf(), axis="z", position=0.5,
            image_size=(24, 24), background=(0, 0, 0, 0),
        ))
        assert (ign[..., 3] == 0).all()  # ignore: fully transparent

    def test_fix_on_ground_samples_true_plane(self):
        # Volume bright only in the TOP z-slab; the grounded plane at
        # position≈1 must show that content (sampled at the true
        # plane) while its geometry depth matches a floor plane.
        vol = np.zeros((8, 8, 8), np.float32)
        vol[7] = 1.0
        tf = self._tf()
        cam = Camera(position=(0.2, 0.3, 0.9))
        kw = dict(image_size=(32, 32), background=(0, 0, 0, 0),
                  return_depth=True)
        g_img, g_depth = map(np.asarray, slice_render_3d(
            jnp.asarray(vol), cam, tf, axis="z", position=15.5 / 16,
            fix_on_ground=True, **kw))
        f_img, f_depth = map(np.asarray, slice_render_3d(
            jnp.asarray(vol), cam, tf, axis="z", position=0.0,
            **kw))
        hits = g_img[..., 3] > 0
        assert hits.any()
        assert g_img[..., 0][hits].mean() > 0.9  # top-slab content
        # Geometry sits at the floor: same depth footprint as a real
        # bottom slice where both are visible.
        both = hits & (f_img[..., 3] > 0)
        assert both.any()
        np.testing.assert_allclose(
            g_depth[both], f_depth[both], atol=1e-4)

    def test_vertical_plane_fix_on_ground_raises(self):
        vol = jnp.zeros((4, 4, 4))
        cam = Camera(position=(0.0, 0.0, 0.9))
        import pytest

        with pytest.raises(ValueError, match="z component"):
            slice_render_3d(vol, cam, self._tf(), normal=(1, 0, 0),
                            fix_on_ground=True)

    def test_scene_reference_settings_keys_roundtrip(self, tmp_path):
        from correrender_tpu.app.state import Scene
        from correrender_tpu.core.fields import VolumeData, GridMetadata

        rng = np.random.default_rng(2)
        data = rng.random((1, 1, 8, 8, 8)).astype(np.float32)

        def make_vd():
            grid = GridMetadata(xs=8, ys=8, zs=8, ts=1, es=1)
            vd = VolumeData(grid)
            vd.add_field("data", lambda t, e: data[e, t])
            return vd

        scene = Scene(make_vd())
        scene.add_renderer(
            "slice", field="data", normal_x=1.0, normal_y=0.0,
            normal_z=1.0, plane_dist=0.05, lighting_factor=0.5,
            nan_handling="ignore", fix_on_ground=False,
        )
        before = np.asarray(scene.render_view(0, image_size=(32, 24)))
        path = str(tmp_path / "s.json")
        scene.save_state(path)
        scene2 = Scene.load_state(path, volume_data=make_vd())
        after = np.asarray(scene2.render_view(0, image_size=(32, 24)))
        np.testing.assert_array_equal(before, after)
        assert before[..., 3].max() > 0


class TestIsoAxialSupersample:
    """Axial supersampling of the iso fast path (VERDICT r3 #3)."""

    def _vol(self, g=48):
        import jax

        vol = jax.random.uniform(jax.random.key(5), (g, g, g))
        return jnp.asarray(jax.scipy.signal.convolve(
            vol, jnp.ones((3, 3, 3)) / 27.0, mode="same"))

    def test_interleave_is_exact_lerp(self):
        from correrender_tpu.render.iso_fast import _axial_interleave

        cvol = jnp.arange(2 * 3 * 2 * 4, dtype=jnp.float32).reshape(
            2, 3, 2, 4)
        out = np.asarray(_axial_interleave(cvol, 2))
        assert out.shape == (3, 3, 2, 4)
        np.testing.assert_allclose(out[0], np.asarray(cvol[0]))
        np.testing.assert_allclose(
            out[1], 0.5 * np.asarray(cvol[0] + cvol[1]))
        np.testing.assert_allclose(out[2], np.asarray(cvol[1]))

    def test_supersample_improves_match_with_exact(self):
        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso import iso_render
        from correrender_tpu.render.iso_fast import iso_shearwarp
        from correrender_tpu.utils.metrics import ssim

        vol = self._vol()
        cam = Camera(position=(0.05, 0.3, 0.85))
        size = (160, 120)
        exact = np.asarray(iso_render(
            vol, cam, 0.55, image_size=size, background=(0, 0, 0, 1)))
        scores = {}
        for ss in (1, 2):
            fast = np.asarray(iso_shearwarp(
                vol, cam, 0.55, image_size=size,
                background=(0, 0, 0, 1), axial_supersample=ss))
            scores[ss] = ssim(fast[..., :3], exact[..., :3])
        assert scores[2] > scores[1]

    def test_prepared_matches_unprepared(self):
        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso_fast import (
            iso_shearwarp,
            prepare_iso_shearwarp,
        )

        vol = self._vol(32)
        cam = Camera(position=(0.05, 0.3, 0.85))
        prep = prepare_iso_shearwarp(vol, cam, axial_supersample=2)
        a = np.asarray(iso_shearwarp(
            vol, cam, 0.55, image_size=(64, 48), prepared=prep,
            axial_supersample=2))
        b = np.asarray(iso_shearwarp(
            vol, cam, 0.55, image_size=(64, 48), axial_supersample=2))
        np.testing.assert_array_equal(a, b)
        # A supersample mismatch invalidates the prepared key
        # (silently rebuilt) instead of rendering wrong geometry.
        c = np.asarray(iso_shearwarp(
            vol, cam, 0.55, image_size=(64, 48), prepared=prep,
            axial_supersample=1))
        d = np.asarray(iso_shearwarp(
            vol, cam, 0.55, image_size=(64, 48)))
        np.testing.assert_array_equal(c, d)

    def test_scene_iso_quality_exact(self):
        """renderer node quality='exact' routes to the exact marcher."""
        import jax

        from correrender_tpu.app.state import Scene
        from correrender_tpu.core import GridMetadata, VolumeData
        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso import iso_render

        vol = self._vol(16)
        vd = VolumeData(GridMetadata(xs=16, ys=16, zs=16, es=1))
        vd.add_field("f", lambda t, e: vol)
        cam = Camera(position=(0.05, 0.3, 0.85))
        scene = Scene(vd, views=[cam])
        scene.add_renderer("iso_ray", field="f", iso_value=0.55,
                           quality="exact")
        got = np.asarray(scene.render_view(image_size=(64, 48)))
        box = vd.grid.render_box()
        # Since round 5 the exact route is the Pallas per-pixel
        # marcher (render/raymarch_exact.py) — the scene's output must
        # match IT exactly; the fixed-dt XLA marcher agrees up to its
        # different quadrature abscissae (similarity, not equality).
        from correrender_tpu.render.raymarch_exact import (
            iso_render_exact,
        )

        want, _ = iso_render_exact(
            vol, cam, 0.55, image_size=(64, 48), box=box,
            background=(0, 0, 0, 0), return_depth=True)
        want = np.asarray(want)
        cov = want[..., 3] > 0.5
        np.testing.assert_allclose(got[cov][:, :3], want[cov][:, :3],
                                   atol=1e-5)
        ref, _ = iso_render(
            vol, cam, 0.55, image_size=(64, 48), box=box,
            background=(0, 0, 0, 0), return_depth=True)
        ref = np.asarray(ref)
        covr = ref[..., 3] > 0.5
        agree = (cov == covr).mean()
        assert agree > 0.97, f"coverage agreement {agree}"
        d = np.abs(got[cov & covr][:, :3] - ref[cov & covr][:, :3])
        assert np.quantile(d, 0.9) < 0.12, np.quantile(d, 0.9)


class TestDvrBoundarySensitivity:
    """The cross-backend DVR delta (BENCH dvr_exact_tpu_vs_cpu_delta)
    is a boundary-sample knife edge at ray-box entry (ROUND4.md): a
    1-ULP-scale perturbation of the ray origin may flip one march
    sample on isolated rays, and must NOT cause broad image drift.
    This pins the bounded-behavior claim within one backend."""

    def test_epsilon_camera_shift_changes_isolated_pixels_only(self):
        import jax

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.dvr import dvr_render
        from correrender_tpu.render.tf import TransferFunction

        vol = jax.random.uniform(jax.random.key(5), (48, 48, 48))
        vol = jnp.asarray(jax.scipy.signal.convolve(
            vol, jnp.ones((3, 3, 3)) / 27.0, mode="same"))
        tf = TransferFunction.from_colormap(
            "coolwarm", domain=(0.0, 1.0),
            opacity_points=((0.0, 0.0), (1.0, 0.9)))
        size = (160, 120)
        a = np.asarray(dvr_render(
            vol, Camera(position=(0.05, 0.3, 0.85)), tf,
            image_size=size))
        b = np.asarray(dvr_render(
            vol, Camera(position=(0.05, 0.3, 0.85 + 1e-6)), tf,
            image_size=size))
        d = np.abs(a - b).max(axis=-1)
        # Continuous shading responds smoothly (tiny p99); only
        # isolated boundary-sample flips may exceed 1e-3.
        assert np.percentile(d, 99) < 1e-3
        assert (d > 1e-3).mean() < 5e-3


class TestIsoRenderBanding:
    """Row-band tiling of the exact marcher: single-pass 1080p crashed
    the tunneled TPU worker (ROUND4.md); bands must be pixel-exact."""

    def test_banded_equals_single_pass(self):
        import jax

        from correrender_tpu.render.camera import Camera
        from correrender_tpu.render.iso import iso_render

        vol = jax.random.uniform(jax.random.key(5), (24, 24, 24))
        vol = jnp.asarray(jax.scipy.signal.convolve(
            vol, jnp.ones((3, 3, 3)) / 27.0, mode="same"))
        cam = Camera(position=(0.05, 0.3, 0.85))
        # 70 rows over 16-row bands: exercises padding of the last band.
        a = iso_render(vol, cam, 0.55, image_size=(96, 70),
                       return_depth=True)
        b = iso_render(vol, cam, 0.55, image_size=(96, 70),
                       return_depth=True, max_rays_per_pass=96 * 16)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        fin = np.isfinite(np.asarray(a[1]))
        assert (np.isfinite(np.asarray(b[1])) == fin).all()
        np.testing.assert_array_equal(np.asarray(a[1])[fin],
                                      np.asarray(b[1])[fin])
