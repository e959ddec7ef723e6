"""Diagram overlay compositing (VERDICT r3 #7).

The reference's diagram subsystem draws charts INTO the 3D view
(DiagramRenderer.hpp:62-100); here `diagrams/raster.py` rasterizes the
SVG subset `diagrams/svg.py` emits and `Scene.render_view` composites
diagram nodes over rendered frames — so screenshots, `cli state`
renders, and flythrough videos show the charts like the reference.
"""

import json
import os

import numpy as np
import pytest

from correrender_tpu.diagrams.raster import (
    composite_overlay,
    rasterize_svg,
)
from correrender_tpu.diagrams.svg import SvgCanvas

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


class TestRasterizer:
    def test_rect_fill(self):
        c = SvgCanvas(40, 40, background=None)
        c.rect(10, 10, 20, 20, fill=(1.0, 0.0, 0.0))
        img = rasterize_svg(c.to_svg())
        assert img.shape == (40, 40, 4)
        np.testing.assert_allclose(img[20, 20], [1, 0, 0, 1], atol=0.02)
        assert img[5, 5, 3] == 0.0  # outside untouched

    def test_annulus_hole_preserved(self):
        """Even-odd fill: the annulus hole must stay transparent."""
        c = SvgCanvas(60, 60, background=None)
        c.annulus(30, 30, 10, 25, fill=(0.0, 0.5, 1.0))
        img = rasterize_svg(c.to_svg())
        assert img[30, 30, 3] < 0.05          # hole
        assert img[30, 30 + 17, 3] > 0.9      # ring body
        assert img[30, 30 + 28, 3] < 0.05     # outside

    def test_translucent_stroke_uniform_at_joins(self):
        """Stroke quads + round joins overlap; union coverage must
        blend ONCE (no double-dark elbows, no even-odd holes)."""
        c = SvgCanvas(60, 60, background=None)
        c.path([(10, 50), (30, 10), (50, 50)], color=(0, 0, 0),
               width=6.0, opacity=0.5)
        img = rasterize_svg(c.to_svg())
        # Alpha at the elbow == alpha mid-segment == ~0.5.
        elbow = img[14, 30, 3]
        mid = img[30, 19, 3]
        assert abs(elbow - 0.5) < 0.1, elbow
        assert abs(mid - 0.5) < 0.1, mid

    def test_circle_and_line(self):
        c = SvgCanvas(50, 50, background=None)
        c.circle(25, 25, 10, fill=(0, 1, 0))
        c.line(0, 25, 50, 25, color=(0, 0, 1), width=2)
        img = rasterize_svg(c.to_svg())
        np.testing.assert_allclose(img[20, 25, :3], [0, 1, 0],
                                   atol=0.05)
        np.testing.assert_allclose(img[25, 2, :3], [0, 0, 1],
                                   atol=0.05)

    def test_text_renders_glyphs(self):
        pytest.importorskip("matplotlib")
        c = SvgCanvas(100, 40, background=None)
        c.text(50, 25, "Hg", size=20)
        img = rasterize_svg(c.to_svg())
        assert (img[:, :, 3] > 0.5).sum() > 40  # some glyph coverage

    def test_arc_ring_sector(self):
        import math

        c = SvgCanvas(60, 60, background=None)
        c.arc_ring(30, 30, 10, 25, -0.5 * math.pi, 0.0,
                   fill=(1, 0, 1))
        img = rasterize_svg(c.to_svg())
        # Sector spans upper-right quadrant only.
        assert img[13, 40, 3] > 0.8           # inside sector
        assert img[47, 40, 3] < 0.05          # opposite quadrant

    def test_scale(self):
        c = SvgCanvas(40, 40, background=None)
        c.rect(0, 0, 40, 40, fill="black")
        img = rasterize_svg(c.to_svg(), scale=0.5)
        assert img.shape == (20, 20, 4)

    def test_golden_stability(self):
        """Fixed SVG rasterizes identically across sessions (no text
        — glyph outlines may shift across matplotlib versions)."""
        c = SvgCanvas(32, 32, background="white")
        c.rect(4, 4, 10, 10, fill=(1, 0, 0), opacity=0.8)
        c.circle(22, 22, 6, fill=(0, 0, 1), stroke=(0, 0, 0))
        c.annulus(12, 22, 3, 7, fill=(0, 0.6, 0))
        c.path([(2, 30), (16, 2), (30, 30)], color=(0.3, 0.3, 0.3),
               width=2, opacity=0.5)
        img = rasterize_svg(c.to_svg())
        path = os.path.join(GOLDENS, "raster_golden.npz")
        if not os.path.exists(path):  # pragma: no cover - regen hook
            np.savez_compressed(path, img=img)
            pytest.skip("golden written")
        with np.load(path) as g:
            np.testing.assert_allclose(img, g["img"], atol=1e-5)


class TestCompositeOverlay:
    def test_corner_placement_and_alpha(self):
        frame = np.zeros((100, 200, 4), np.float32)
        overlay = np.ones((30, 40, 4), np.float32)
        out = composite_overlay(frame, overlay, anchor="bottom_right",
                                margin=8)
        assert out[100 - 8 - 1, 200 - 8 - 1, 0] == 1.0
        assert out[10, 10, 0] == 0.0
        out2 = composite_overlay(frame, overlay, anchor="top_left",
                                 margin=4)
        assert out2[4, 4, 0] == 1.0

    def test_opacity(self):
        frame = np.zeros((50, 50, 4), np.float32)
        overlay = np.ones((20, 20, 4), np.float32)
        out = composite_overlay(frame, overlay, opacity=0.5)
        assert abs(out[40, 40, 0] - 0.5) < 1e-6


def _scene_with_matrix_node():
    import jax.numpy as jnp

    from correrender_tpu.app.state import Scene
    from correrender_tpu.core.fields import GridMetadata, VolumeData

    rng = np.random.default_rng(0)
    zs, ys, xs = 8, 16, 16
    a = rng.random((zs, ys, xs)).astype(np.float32)
    b = (a + 0.3 * rng.random((zs, ys, xs))).astype(np.float32)
    vd = VolumeData(GridMetadata(xs=xs, ys=ys, zs=zs, es=1))
    vd.add_field("fa", lambda t, e: jnp.asarray(a))
    vd.add_field("fb", lambda t, e: jnp.asarray(b))
    scene = Scene(vd)
    scene.add_renderer("dvr", field="fa")
    scene.renderers.append(
        {"type": "correlation_matrix", "view": 0, "measure": "pearson"})
    return scene


class TestSceneOverlay:
    def test_render_view_composites_diagram(self):
        scene = _scene_with_matrix_node()
        with_ov = np.asarray(scene.render_view(
            image_size=(160, 120)))
        without = np.asarray(scene.render_view(
            image_size=(160, 120), show_diagram_overlays=False))
        # Bottom-right corner carries the chart (white background).
        corner_delta = np.abs(
            with_ov[70:110, 100:150] - without[70:110, 100:150]).max()
        assert corner_delta > 0.3
        # Top-left corner untouched.
        np.testing.assert_allclose(with_ov[:20, :20],
                                   without[:20, :20], atol=1e-6)

    def test_overlay_flag_disables(self):
        scene = _scene_with_matrix_node()
        scene.renderers[-1]["overlay"] = False
        with_ov = np.asarray(scene.render_view(image_size=(160, 120)))
        without = np.asarray(scene.render_view(
            image_size=(160, 120), show_diagram_overlays=False))
        np.testing.assert_allclose(with_ov, without, atol=1e-6)

    def test_overlay_cached_across_frames(self):
        scene = _scene_with_matrix_node()
        scene.render_view(image_size=(160, 120))
        assert len(scene._overlay_cache) == 1
        scene.render_view(image_size=(160, 120))
        assert len(scene._overlay_cache) == 1

    def test_failing_diagram_drops_overlay(self):
        scene = _scene_with_matrix_node()
        scene.renderers.append({"type": "time_series_correlation",
                                "view": 0})  # no source → raises
        img = np.asarray(scene.render_view(image_size=(160, 120)))
        assert np.isfinite(img).all()


class TestCliStateOverlay:
    def test_state_render_contains_chart(self, tmp_path):
        """`cli state` on a diagram-bearing scene produces a PNG with
        the chart composited (VERDICT r3 #7 acceptance)."""
        from PIL import Image

        from correrender_tpu.app import cli
        from correrender_tpu.io import writers

        rng = np.random.default_rng(1)
        data = rng.random((8, 16, 16)).astype(np.float32)
        nc = str(tmp_path / "d.nc")
        writers.write_netcdf(nc, data, name="temp")
        doc = {
            "dataset": {"filename": nc},
            "views": [{"camera": {"position": [0.0, 0.2, 0.9]}}],
            "renderers": [
                {"type": "dvr", "view": 0, "field": "temp"},
                {"type": "correlation_matrix", "view": 0,
                 "measure": "pearson"},
            ],
        }
        state = str(tmp_path / "scene.json")
        with open(state, "w") as f:
            json.dump(doc, f)
        out = str(tmp_path / "frame.png")
        cli.main(["state", "--load", state, "--output", out,
                  "--size", "200x150"])
        img = np.asarray(Image.open(out), np.float32) / 255.0
        # Chart background (near-white) pixels exist in the
        # bottom-right quadrant; a bare DVR of this data has none.
        corner = img[75:, 100:]
        white = (corner[:, :, :3] > 0.85).all(axis=-1).mean()
        assert white > 0.05, f"white fraction {white}"


class TestFlythroughOverlay:
    def test_flythrough_frames_carry_chart(self, tmp_path):
        """Flythrough videos show diagram overlays like the
        reference's in-view charts (VERDICT r3 #7 acceptance: 'a
        flythrough video ... with a diagram node' shows the chart)."""
        from PIL import Image

        from correrender_tpu.app.camera_path import (
            orbit_path,
            render_flythrough,
        )

        scene = _scene_with_matrix_node()
        files = render_flythrough(
            scene, orbit_path(2), str(tmp_path), image_size=(160, 120))
        assert len(files) == 2
        for f in files:
            img = np.asarray(Image.open(f), np.float32) / 255.0
            corner = img[70:112, 90:152]
            white = (corner[:, :, :3] > 0.85).all(axis=-1).mean()
            assert white > 0.03, f


class TestRasterizerEdgeCases:
    def test_rotated_text(self):
        pytest.importorskip("matplotlib")
        c = SvgCanvas(80, 80, background=None)
        c.text(40, 40, "W", size=30, rotate=90.0)
        img = rasterize_svg(c.to_svg())
        assert (img[:, :, 3] > 0.5).sum() > 20
        # Rotation changes the coverage pattern vs unrotated.
        c2 = SvgCanvas(80, 80, background=None)
        c2.text(40, 40, "W", size=30)
        img2 = rasterize_svg(c2.to_svg())
        assert np.abs(img - img2).max() > 0.3

    def test_large_arc_flag(self):
        import math

        c = SvgCanvas(60, 60, background=None)
        # > pi sector exercises the large-arc branch of the flattener.
        c.arc_ring(30, 30, 8, 24, 0.0, 1.5 * math.pi, fill=(0, 0, 1))
        img = rasterize_svg(c.to_svg())

        def probe(theta):
            x = int(round(30 + 16 * math.cos(theta)))
            y = int(round(30 + 16 * math.sin(theta)))
            return img[y, x, 3]

        # Sweep covers 0..1.5pi (screen y-down: right, down, left,
        # up-left); the open quadrant is 1.5pi..2pi (up-right).
        assert probe(0.25 * math.pi) > 0.5
        assert probe(math.pi) > 0.5
        assert probe(1.25 * math.pi) > 0.5
        assert probe(1.75 * math.pi) < 0.1

    def test_empty_svg(self):
        c = SvgCanvas(20, 20, background=None)
        img = rasterize_svg(c.to_svg())
        assert img.shape == (20, 20, 4) and img.max() == 0.0
