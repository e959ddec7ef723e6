"""HEB drill-down stack, TF serialization, scene markers, flythrough CLI."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.diagrams.drilldown import HEBDrilldown
from correrender_tpu.render.tf import TransferFunction
from correrender_tpu.utils import fixtures


@pytest.fixture(scope="module")
def box_stack():
    data = fixtures.synth_box_ensemble(xs=32, ys=32, zs=8, members=48)
    return np.moveaxis(data, 0, -1)


class TestDrilldown:
    def test_drill_and_pop(self, box_stack, tmp_path):
        dd = HEBDrilldown(box_stack, downsample_factor=8, max_chords=20)
        assert dd.depth == 1
        root_chords = list(dd.current_chart().chords)
        assert root_chords
        focus = dd.drill_into_chord(0)
        assert dd.depth == 2
        assert focus is dd.current_chart()
        # Focus chart analyzes (at most) the pair's bounding box at
        # finer granularity than the parent.
        assert focus.stack.size <= box_stack.size
        assert focus.factor < dd.levels[0][0].factor
        regions = dd.selected_regions()
        assert len(regions) == 2
        for r in regions:
            assert 0 <= r.x_min <= r.x_max < 32
            assert 0 <= r.z_min <= r.z_max < 8
        paths = dd.render_svgs(str(tmp_path / "dd"))
        assert len(paths) == 2
        assert all(os.path.getsize(p) > 0 for p in paths)
        dd.pop()
        assert dd.depth == 1
        assert dd.current_chart().chords == root_chords

    def test_focus_sampling_overrides(self, box_stack):
        # Reference sampling_method_type_focus / num_samples_focus:
        # the drilled levels use their own sampling settings while the
        # context chart keeps the cheap mean sweep.
        dd = HEBDrilldown(
            box_stack, downsample_factor=8, max_chords=20,
            sampling_method="mean",
            focus_sampling_method="plastic", focus_num_samples=9,
        )
        assert dd.current_chart().sampling_method == "mean"
        focus = dd.drill_into_chord(0)
        assert focus.sampling_method == "plastic"
        assert focus.num_samples == 9
        assert focus.chords  # still finds correlations

    def test_context_chart_highlights_drilled_chord(self, box_stack):
        dd = HEBDrilldown(box_stack, downsample_factor=8, max_chords=20)
        # Root context (depth 1): no highlight, plain render.
        root_svg = dd.render_context_svg(size=400)
        assert "<svg" in root_svg

        dd.drill_into_chord(0)
        assert dd.drilled_leaf_pairs  # tracked for the highlight
        ctx = dd.render_context_svg(size=400)
        # Selection colors (orange/cyan leaf dots) appear only in the
        # highlighted context render.
        assert "rgb(242,140,38)" in ctx and "rgb(51,204,242)" in ctx
        assert "rgb(242,140,38)" not in root_svg
        dd.pop()
        assert not dd.drilled_leaf_pairs

    def test_focus_chart_tooltips_are_absolute(self, box_stack):
        dd = HEBDrilldown(box_stack, downsample_factor=8, max_chords=20)
        focus = dd.drill_into_chord(0)
        oz, oy, ox = focus.offset
        assert focus.offset == dd.levels[-1][2]
        if (oz, oy, ox) == (0, 0, 0):
            # Pick a chord whose focus domain is offset; drill again
            # if needed — synth boxes sit off-origin, so at least one
            # top chord has a nonzero offset.
            for k in range(1, len(dd.levels[0][0].chords)):
                dd.pop()
                focus = dd.drill_into_chord(k)
                oz, oy, ox = focus.offset
                if (oz, oy, ox) != (0, 0, 0):
                    break
        assert focus.offset != (0, 0, 0)
        svg = focus.render_svg()
        # The first leaf's tooltip must carry the crop offset.
        r = focus._upscale(focus.leaves[0])
        assert f"[{r.x_min + ox}-" in svg

    def test_drill_without_chords_raises(self):
        rng = np.random.default_rng(0)
        noise = rng.normal(size=(8, 8, 8, 16)).astype(np.float32)
        dd = HEBDrilldown(noise, downsample_factor=4, max_chords=5,
                          threshold=2.0)  # impossible threshold
        with pytest.raises(ValueError):
            dd.drill_into_chord(0)


class TestTFSerialization:
    def test_control_points_roundtrip(self):
        tf = TransferFunction.from_control_points(
            [(0.0, (0, 0, 1)), (0.5, (1, 1, 1)), (1.0, (1, 0, 0))],
            [(0.0, 0.0), (0.3, 0.8), (1.0, 0.2)],
            domain=(-2.0, 3.0),
        )
        assert tf.domain == (-2.0, 3.0)
        # domain (−2,3): scalar 0.5 → normalized 0.5; opacity interp
        # between (0.3, 0.8) and (1.0, 0.2) → 0.8 − (0.2/0.7)·0.6 ≈ 0.629.
        mid = np.asarray(tf(jnp.asarray(0.5)))
        np.testing.assert_allclose(mid, [1, 1, 1, 0.6286], atol=0.02)
        tf2 = TransferFunction.from_dict(tf.to_dict())
        np.testing.assert_allclose(
            np.asarray(tf2.lut), np.asarray(tf.lut), atol=1e-6
        )
        assert tf2.domain == tf.domain

    def test_scene_state_keeps_tfs(self, tmp_path):
        from tests.test_app import make_scene
        from correrender_tpu.app.state import Scene
        from correrender_tpu.core import GridMetadata, VolumeData

        scene, data = make_scene(8)
        scene.transfer_functions["data"] = (
            TransferFunction.from_colormap("viridis", domain=(-1, 2))
        )
        path = str(tmp_path / "s.json")
        scene.save_state(path, dataset={"synthetic": True})
        vd2 = VolumeData(GridMetadata(xs=16, ys=16, zs=8, es=8))
        vd2.add_field("data", lambda t, e: data[e])
        scene2 = Scene.load_state(path, volume_data=vd2)
        tf2 = scene2.transfer_functions["data"]
        assert tf2.domain == (-1, 2)


class TestSceneMarkers:
    def test_reference_point_marker_rendered(self):
        from tests.test_app import make_scene
        from correrender_tpu.calculators.correlation import (
            CorrelationCalculator,
        )

        scene, _ = make_scene(10)
        name = scene.add_calculator(
            CorrelationCalculator("data", reference_point=(8, 8, 4))
        )
        plain = np.asarray(
            scene.render_view(0, image_size=(64, 64))
        )
        marked = np.asarray(
            scene.render_view(0, image_size=(64, 64),
                              show_reference_points=True)
        )
        assert not np.allclose(plain, marked)
        # The marker adds saturated red somewhere.
        assert (marked[..., 0] - marked[..., 1] > 0.5).any()


class TestFlythroughCli:
    def test_flythrough_command(self, tmp_path):
        from correrender_tpu.app import cli
        from correrender_tpu.io import writers

        data = fixtures.synth_box_ensemble(xs=8, ys=8, zs=4, members=6)
        ds = str(tmp_path / "d.nc")
        writers.write_netcdf(ds, data[:, None], name="temp")
        out_dir = str(tmp_path / "fly")
        cli.main([
            "flythrough", "--dataset", ds, "--frames", "2",
            "--size", "32x24", "--output-dir", out_dir,
        ])
        files = sorted(os.listdir(out_dir))
        assert len(files) == 2


class TestLevelTupleConsistency:
    """Each drill level carries (chart, pair, offset, drilled) in ONE
    tuple so off-lock readers (frame overlay, context SVG) get a
    consistent snapshot — a second list racing a pop() was the round-3
    review's IndexError (render_context_svg vs heb_pop)."""

    def _dd(self):
        from correrender_tpu.diagrams.drilldown import HEBDrilldown
        data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8,
                                           members=16)
        stack = np.moveaxis(data, 0, -1)
        return HEBDrilldown(stack, downsample_factor=8, num_samples=4,
                            sampling_method="mean")

    def test_drilled_pair_rides_the_level(self):
        dd = self._dd()
        assert dd.levels[0][3] is None
        dd.drill_into_chord(0)
        assert dd.levels[-1][3] == dd.drilled_leaf_pairs[-1]
        assert len(dd.drilled_leaf_pairs) == dd.depth - 1
        dd.pop()
        assert dd.drilled_leaf_pairs == []

    def test_context_svg_consistent_after_pop(self):
        dd = self._dd()
        dd.drill_into_chord(0)
        svg = dd.render_context_svg(size=200)
        assert "<svg" in svg
        dd.pop()
        # At depth 1 the context chart is just the root chart.
        svg = dd.render_context_svg(size=200)
        assert "<svg" in svg
