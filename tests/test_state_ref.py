"""Reference app-state JSON interchange (app/state_ref.py).

Fixtures below are authored in the REFERENCE FORMAT (the schema of
MainAppState.cpp:106-205 / the sgl TF-widget XML visible in
ReplicabilityState.hpp) with this test's own values — they exercise
format compatibility, not reference content.
"""

import json
import math

import numpy as np
import pytest

from correrender_tpu.app.state import Scene
from correrender_tpu.app.state_ref import (
    camera_from_reference,
    camera_to_reference,
    convert_reference_state,
    is_reference_state,
    reference_state_from_scene,
)
from correrender_tpu.core import GridMetadata, VolumeData
from correrender_tpu.render.camera import Camera
from correrender_tpu.render.tf import (
    TransferFunction,
    tf_from_xml_string,
    tf_to_xml_string,
)
from correrender_tpu.utils import fixtures

TF_XML = """<TransferFunction colorspace="sRGB" \
interpolation_colorspace="Linear RGB">
    <OpacityPoints>
        <OpacityPoint position="0" opacity="1"/>
        <OpacityPoint position="0.4" opacity="0"/>
        <OpacityPoint position="1" opacity="0.5"/>
    </OpacityPoints>
    <ColorPoints color_data="ushort">
        <ColorPoint position="0" r="0" g="32768" b="65535"/>
        <ColorPoint position="1" r="65535" g="16384" b="0"/>
    </ColorPoints>
</TransferFunction>
\x00"""


def make_volume(members=12):
    data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8,
                                       members=members)
    vd = VolumeData(GridMetadata(xs=16, ys=16, zs=8, es=members))
    vd.add_field("data", lambda t, e: data[e])
    return vd, data


def reference_doc():
    """A reference-format state document (authored here)."""
    return {
        "window_size": {"x": 1920, "y": 1080},
        "global_camera": {
            "fovy": 0.9272952079772949,
            "lookat": {"x": 0.0, "y": 0.0, "z": 0.0},
            "pitch": 0.0,
            "position": {"x": 0.0, "y": 0.0, "z": 0.6},
            "yaw": -1.5707963705062866,
        },
        "views": [
            {"name": "3D View 1##data_view_0",
             "sync_with_global_camera": True},
            {"name": "3D View 2##data_view_1",
             "sync_with_global_camera": False,
             "camera": {
                 "fovy": 0.7853981852531433,
                 "lookat": {"x": 0.0, "y": 0.0, "z": 0.0},
                 "pitch": -0.5,
                 "position": {"x": 0.4, "y": 0.3, "z": 0.4},
                 "yaw": -2.2,
             }},
        ],
        "dock_data": "[Window][###data_view_0]\nPos=0,0\n",
        "calculators": [
            {
                "type": "correlation",
                "state": {
                    "calculate_absolute_value": "0",
                    "correlation_measure_type": "pearson",
                    "correlation_mode": "Ensemble",
                    "data_mode": "Buffer Array",
                    "device": "CUDA",
                    "fix_picking_z": "1",
                    "kmi_neighbors": "3",
                    "kraskov_estimator_index": "1",
                    "mi_bins": "40",
                    "reference_point_x": "3",
                    "reference_point_y": "4",
                    "reference_point_z": "5",
                    "scalar_field_idx": "0",
                    "use_buffer_tiling": "1",
                    "use_separate_fields": "0",
                },
            },
            {
                "type": "binary_operator",
                "state": {
                    "binary_operator_type": "Absolute Difference",
                    "scalar_field_idx_0": "0",
                    "scalar_field_idx_1": "1",
                },
            },
        ],
        "renderers": [
            {
                "type": "domain_outline",
                "state": {
                    "line_width": "0.002",
                    "use_depth_cues": "1",
                    "view_visibility": "11",
                },
            },
            {
                "type": "dvr",
                "state": {
                    "attenuation_coefficient": "150",
                    "nan_handling": "yellow",
                    "selected_field_idx": "1",
                    "step_size": "0.2",
                    "view_visibility": "10",
                },
            },
            {
                "type": "iso_ray",
                "state": {
                    "analytic_intersections": "0",
                    "close_iso_surface": "1",
                    "intersection_solver": "Marmitt",
                    "iso_surface_color_r": "0.3",
                    "iso_surface_color_g": "0.6",
                    "iso_surface_color_b": "0.9",
                    "iso_surface_color_a": "1",
                    "iso_value": "0.25",
                    "selected_field_idx": "0",
                    "step_size": "0.25",
                    "view_visibility": "01",
                },
            },
        ],
        "volume_data": {
            "name": "test_ensemble",
            "current_time_step_idx": 0,
            "current_ensemble_idx": 2,
            "transfer_functions": [
                {
                    "data": TF_XML,
                    "selected_range": {"min": -2.0, "max": 2.0},
                    "is_selected_range_fixed": True,
                },
                {
                    "data": TF_XML,
                    "selected_range": {"min": -1.0, "max": 1.0},
                    "is_selected_range_fixed": True,
                },
            ],
        },
    }


class TestTfXml:
    def test_parse_endpoints_exact(self):
        tf = tf_from_xml_string(TF_XML, domain=(-1.0, 1.0))
        lut = np.asarray(tf.lut)
        assert tf.domain == (-1.0, 1.0)
        # Endpoint LUT entries equal the decoded control points.
        np.testing.assert_allclose(
            lut[0, :3], [0.0, 32768 / 65535, 1.0], atol=1e-6)
        np.testing.assert_allclose(
            lut[-1, :3], [1.0, 16384 / 65535, 0.0], atol=1e-6)
        assert lut[0, 3] == 1.0 and abs(lut[-1, 3] - 0.5) < 1e-6

    def test_linear_rgb_interpolation_differs_from_srgb(self):
        srgb = TransferFunction.from_control_points(
            [(0.0, (0.0, 0.5, 1.0)), (1.0, (1.0, 0.25, 0.0))],
            [(0.0, 1.0), (1.0, 1.0)],
        )
        linear = TransferFunction.from_control_points(
            [(0.0, (0.0, 0.5, 1.0)), (1.0, (1.0, 0.25, 0.0))],
            [(0.0, 1.0), (1.0, 1.0)],
            interpolate_linear_rgb=True,
        )
        mid_s = np.asarray(srgb.lut)[128, :3]
        mid_l = np.asarray(linear.lut)[128, :3]
        # Linear-RGB midpoint is brighter after re-encoding.
        assert mid_l[0] > mid_s[0] + 0.05

    def test_roundtrip_lossless_with_control_points(self):
        tf = tf_from_xml_string(TF_XML, domain=(0.0, 1.0))
        xml = tf_to_xml_string(tf)
        tf2 = tf_from_xml_string(xml, domain=tf.domain)
        np.testing.assert_allclose(np.asarray(tf.lut),
                                   np.asarray(tf2.lut), atol=2e-5)

    def test_lut_only_tf_exports(self):
        tf = TransferFunction(lut=np.random.RandomState(0)
                              .rand(256, 4).astype(np.float32))
        xml = tf_to_xml_string(tf, num_points=9)
        assert xml.count("<ColorPoint ") == 9
        tf2 = tf_from_xml_string(xml)
        assert np.asarray(tf2.lut).shape == (256, 4)

    def test_ubyte_color_data(self):
        xml = TF_XML.replace('color_data="ushort"', 'color_data="ubyte"'
                             ).replace('b="65535"', 'b="255"').replace(
            'g="32768"', 'g="128"').replace('r="65535"', 'r="255"'
                                            ).replace('g="16384"',
                                                      'g="64"')
        tf = tf_from_xml_string(xml)
        assert abs(float(np.asarray(tf.lut)[0, 2]) - 1.0) < 1e-6


class TestCameraInterchange:
    def test_yaw_pitch_default_looks_down_minus_z(self):
        cam = camera_from_reference({
            "fovy": 0.9,
            "position": {"x": 0, "y": 0, "z": 0.6},
            "lookat": {"x": 0, "y": 0, "z": 0},
            "yaw": -math.pi / 2, "pitch": 0.0,
        })
        direction = np.subtract(cam.look_at_point, cam.position)
        direction /= np.linalg.norm(direction)
        np.testing.assert_allclose(direction, [0, 0, -1], atol=1e-6)
        # Look-at distance preserved as the orbit pivot.
        np.testing.assert_allclose(cam.look_at_point, [0, 0, 0],
                                   atol=1e-6)

    def test_quaternion_identity(self):
        cam = camera_from_reference({
            "position": {"x": 0, "y": 0, "z": 1.0},
            "lookat": {"x": 0, "y": 0, "z": 0},
            "orientation": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
        })
        direction = np.subtract(cam.look_at_point, cam.position)
        np.testing.assert_allclose(direction / np.linalg.norm(direction),
                                   [0, 0, -1], atol=1e-6)

    def test_roundtrip(self):
        cam = Camera(position=(0.2, 0.5, 0.7),
                     look_at_point=(0.0, 0.1, 0.0),
                     fovy=0.9)
        node = camera_to_reference(cam)
        cam2 = camera_from_reference(node)
        np.testing.assert_allclose(cam2.position, cam.position,
                                   atol=1e-6)
        np.testing.assert_allclose(cam2.look_at_point,
                                   cam.look_at_point, atol=1e-5)
        assert abs(cam2.fovy - cam.fovy) < 1e-9


class TestDetection:
    def test_reference_doc_detected(self):
        assert is_reference_state(reference_doc())

    def test_native_doc_not_detected(self):
        vd, _ = make_volume()
        scene = Scene(vd)
        scene.add_renderer("dvr")
        assert not is_reference_state({
            "version": 1,
            "renderers": scene.renderers,
            "calculators": [],
        })


class TestConvert:
    def test_full_document(self):
        doc = reference_doc()
        ours, warnings = convert_reference_state(doc, ["data"])
        assert ours["current_member"] == 2
        assert len(ours["views"]) == 2
        # Calculator 0: index 0 resolves to the dataset field.
        calc = ours["calculators"][0]
        assert calc["scalar_field_name"] == "data"
        assert calc["correlation_measure_type"] == "pearson"
        assert calc["reference_point_x"] == 3
        assert calc["calculate_absolute_value"] is False
        # GPU-plumbing keys preserved silently.
        assert calc["_ref_extra"]["data_mode"] == "Buffer Array"
        # Calculator 1: index 1 resolves to calculator 0's output.
        binop = ours["calculators"][1]
        assert binop["scalar_field_name_0"] == "data"
        assert binop["scalar_field_name_1"] == "Pearson Correlation"
        # Renderers: view_visibility "11" duplicates across views.
        outlines = [r for r in ours["renderers"]
                    if r["type"] == "domain_outline"]
        assert sorted(r["view"] for r in outlines) == [0, 1]
        dvr = next(r for r in ours["renderers"] if r["type"] == "dvr")
        assert dvr["view"] == 0
        assert dvr["field"] == "Pearson Correlation"
        assert dvr["attenuation"] == 150.0
        assert dvr["nan_mode"] == "yellow"
        assert dvr["step_size"] == 0.2
        iso = next(r for r in ours["renderers"] if r["type"] == "iso_ray")
        assert iso["view"] == 1
        assert iso["intersection_mode"] == "marmitt"
        assert iso["closed_surface"] is True
        assert iso["color"] == (0.3, 0.6, 0.9, 1.0)
        # Transfer functions keyed by resolved field names.
        assert set(ours["transfer_functions"]) == {
            "data", "Pearson Correlation"}
        assert ours["transfer_functions"]["Pearson Correlation"][
            "domain"] == [-1.0, 1.0]

    def test_separate_fields_resolution(self):
        doc = {
            "calculators": [{
                "type": "correlation",
                "state": {
                    "correlation_field_mode": "Separate Symmetric",
                    "scalar_field_idx_ref": "1",
                    "scalar_field_idx_query": "0",
                    "correlation_measure_type": "spearman",
                },
            }],
        }
        ours, _ = convert_reference_state(doc, ["a", "b"])
        calc = ours["calculators"][0]
        assert calc["scalar_field_name"] == "a"
        assert calc["scalar_field_name_ref"] == "b"
        assert calc["correlation_field_mode"] == "Separate Symmetric"

    def test_out_of_range_index_warns(self):
        doc = {"renderers": [{
            "type": "dvr", "state": {"selected_field_idx": "7"},
        }]}
        ours, warnings = convert_reference_state(doc, ["data"])
        assert ours["renderers"][0]["field"] == "data"
        assert any("out of range" in w for w in warnings)


class TestEndToEnd:
    def test_load_reference_state_and_render(self, tmp_path):
        vd, _ = make_volume()
        doc = reference_doc()
        path = tmp_path / "ref_state.json"
        path.write_text(json.dumps(doc))
        scene = Scene.load_state(str(path), volume_data=vd)
        assert len(scene.views) == 2
        calcs = list(scene.volume_data.calculators.values())
        assert calcs[0].type_id == "correlation"
        assert calcs[0].reference_point == (3, 4, 5)
        assert calcs[0]._ref_extra["device"] == "CUDA"
        img = np.asarray(scene.render_view(0, image_size=(48, 32)))
        assert img.shape == (32, 48, 4)
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0
        # View 1 (iso renderer with Marmitt solver) renders too.
        img1 = np.asarray(scene.render_view(1, image_size=(48, 32)))
        assert np.isfinite(img1).all()

    def test_dataset_by_filename(self, tmp_path):
        from correrender_tpu.io import writers

        data = fixtures.synth_box_ensemble(xs=8, ys=8, zs=4, members=6)
        nc = str(tmp_path / "ens.nc")
        writers.write_netcdf(nc, data[:, None])  # (E, T, Z, Y, X)
        doc = {
            "global_camera": {
                "fovy": 0.9,
                "position": {"x": 0, "y": 0, "z": 0.6},
                "lookat": {"x": 0, "y": 0, "z": 0},
                "yaw": -math.pi / 2, "pitch": 0.0,
            },
            "renderers": [{"type": "dvr", "state": {
                "selected_field_idx": "0"}}],
            "volume_data": {"filename": nc},
        }
        path = tmp_path / "state.json"
        path.write_text(json.dumps(doc))
        scene = Scene.load_state(str(path))
        img = np.asarray(scene.render_view(0, image_size=(32, 24)))
        assert img.shape == (24, 32, 4)

    def test_name_without_catalog_raises(self, tmp_path):
        path = tmp_path / "state.json"
        path.write_text(json.dumps(
            {"volume_data": {"name": "nope"}, "renderers": []}))
        with pytest.raises(ValueError, match="catalog"):
            Scene.load_state(str(path))


class TestExport:
    def _scene(self):
        vd, _ = make_volume()
        scene = Scene(vd, views=[Camera(position=(0.0, 0.2, 0.8))])
        from correrender_tpu.calculators.correlation import (
            CorrelationCalculator,
        )

        name = scene.add_calculator(CorrelationCalculator(
            "data", measure="mi_binned", reference_point=(2, 3, 4),
            num_bins=32,
        ))
        scene.add_renderer("dvr", field=name, attenuation=120.0)
        scene.add_renderer("iso_ray", field="data", iso_value=0.4,
                           closed_surface=True,
                           intersection_mode="analytic")
        scene.dataset_info = {"name": "test_ensemble"}
        return scene, name

    def test_reference_format_save(self, tmp_path):
        scene, name = self._scene()
        path = str(tmp_path / "ref_out.json")
        scene.save_state(path, reference_format=True)
        doc = json.load(open(path))
        assert is_reference_state(doc)
        # SettingsMap values are strings, keyed by reference names.
        calc_state = doc["calculators"][0]["state"]
        assert calc_state["correlation_measure_type"] == "mi_binned"
        assert calc_state["mi_bins"] == "32"
        assert calc_state["scalar_field_idx"] == "0"
        dvr_state = next(r for r in doc["renderers"]
                         if r["type"] == "dvr")["state"]
        assert dvr_state["attenuation_coefficient"] == "120.0"
        assert dvr_state["selected_field_idx"] == "1"
        assert dvr_state["view_visibility"] == "1"
        iso_state = next(r for r in doc["renderers"]
                         if r["type"] == "iso_ray")["state"]
        assert iso_state["intersection_solver"] == "Schwarze"
        assert iso_state["close_iso_surface"] == "1"
        # TF XML present for every field.
        tf_nodes = doc["volume_data"]["transfer_functions"]
        assert len(tf_nodes) == 2

    def test_export_import_roundtrip(self, tmp_path):
        scene, name = self._scene()
        path = str(tmp_path / "ref_out.json")
        # Materialize a TF so the export carries a real XML string.
        scene.tf_for("data")
        scene.save_state(path, reference_format=True)
        vd2, _ = make_volume()
        scene2 = Scene.load_state(path, volume_data=vd2)
        calc = list(scene2.volume_data.calculators.values())[0]
        assert calc.num_bins == 32
        assert calc.reference_point == (2, 3, 4)
        dvr = next(r for r in scene2.renderers if r["type"] == "dvr")
        assert dvr["field"] == name
        assert dvr["attenuation"] == 120.0
        iso = next(r for r in scene2.renderers if r["type"] == "iso_ray")
        assert iso["intersection_mode"] == "analytic"
        assert iso["closed_surface"] is True
        np.testing.assert_allclose(
            scene2.views[0].position, scene.views[0].position,
            atol=1e-6)


class TestSetPredicateParity:
    def test_count_range_ramp(self):
        from correrender_tpu.calculators.set_predicate import (
            SetPredicateCalculator,
        )

        vd = VolumeData(GridMetadata(xs=4, ys=4, zs=2, es=8))
        rng = np.random.RandomState(0)
        data = rng.rand(8, 2, 4, 4).astype(np.float32)
        vd.add_field("f", lambda t, e: data[e])
        calc = SetPredicateCalculator(
            "f", comparison=">", threshold=0.5,
            aggregation="count_range", count_lower=2, count_upper=6,
        )
        calc.bind(vd)
        out = np.asarray(calc.compute(0, 0))
        count = (data > 0.5).sum(axis=0)
        expected = np.clip((count - 2) / 4.0, 0.0, 1.0)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_count_step_when_equal(self):
        from correrender_tpu.calculators.set_predicate import (
            SetPredicateCalculator,
        )

        vd = VolumeData(GridMetadata(xs=2, ys=2, zs=1, es=4))
        data = np.stack([np.full((1, 2, 2), v, np.float32)
                         for v in (0.0, 1.0, 1.0, 1.0)])
        vd.add_field("f", lambda t, e: data[e])
        calc = SetPredicateCalculator(
            "f", comparison=">=", threshold=1.0,
            aggregation="count_range", count_lower=3, count_upper=3,
        )
        calc.bind(vd)
        out = np.asarray(calc.compute(0, 0))
        # count == 3 everywhere → clamp(3 − 3) = 0; one more member
        # passing would flip it to 1 (the reference's step semantics).
        np.testing.assert_allclose(out, 0.0)

    def test_glyph_comparisons(self):
        from correrender_tpu.calculators.set_predicate import (
            SetPredicateCalculator,
        )

        calc = SetPredicateCalculator("f", comparison="!=")
        assert calc.comparison == "not_equal"
        settings = {
            "comparison_operator_type": "==",
            "comparison_value": "0.5",
            "count_lower": "1",
            "count_upper": "4",
        }
        calc2 = SetPredicateCalculator.from_settings(settings)
        assert calc2.comparison == "equal"
        assert calc2.threshold == 0.5
        assert calc2.aggregation == "count_range"


class TestDiagramNodes:
    def test_render_diagram_from_reference_state(self, tmp_path):
        vd, _ = make_volume()
        doc = {
            "renderers": [
                {"type": "diagram", "state": {
                    "correlation_measure_type": "pearson",
                    "downscaling_factor_x": "4",
                    "downscaling_factor_y": "4",
                    "downscaling_factor_z": "2",
                    "sampling_method_type": "Quasirandom Plastic",
                    "num_samples": "8",
                    "beta": "0.8",
                    "curve_thickness": "1.5",
                    "use_absolute_correlation_measure": "1",
                    "correlation_range_lower": "0.2",
                    "correlation_range_upper": "1",
                }},
                {"type": "scatter_plot", "state": {
                    "field0": "0", "field1": "0", "point_size": "3",
                }},
                {"type": "correlation_matrix", "state": {
                    "correlation_measure_type": "spearman",
                }},
            ],
        }
        path = tmp_path / "diag_state.json"
        path.write_text(json.dumps(doc))
        scene = Scene.load_state(str(path), volume_data=vd)
        diagrams = [r for r in scene.renderers
                    if r["type"] in scene.DIAGRAM_TYPES]
        assert len(diagrams) == 3
        heb_node = next(r for r in diagrams if r["type"] == "diagram")
        assert heb_node["downsample_xyz"] == (4, 4, 2)
        assert heb_node["sampling_method"] == "plastic"
        assert heb_node["absolute"] is True
        svg = scene.render_diagram(heb_node, size=300)
        assert svg.startswith("<svg") or "<svg" in svg
        scatter_svg = scene.render_diagram(
            next(r for r in diagrams if r["type"] == "scatter_plot"))
        assert "<svg" in scatter_svg
        matrix_svg = scene.render_diagram(
            next(r for r in diagrams if r["type"] == "correlation_matrix"))
        assert "<svg" in matrix_svg

    def test_unknown_color_map_degrades(self, tmp_path):
        """Unknown color_map names in reference state files fall back
        to the default (with a warning + _ref_extra stash) instead of
        raising KeyError at render time (ADVICE r3)."""
        from correrender_tpu.app.state_ref import convert_reference_state

        vd, _ = make_volume()
        doc = {
            "renderers": [
                {"type": "correlation_matrix", "state": {
                    "correlation_measure_type": "pearson",
                    "color_map": "No Such Map",
                }},
                {"type": "time_series_correlation", "state": {
                    "correlation_measure_type": "pearson",
                    "color_map": "Also Unknown",
                }},
            ],
        }
        out, warnings = convert_reference_state(doc, vd.field_names)
        nodes = {r["type"]: r for r in out["renderers"]}
        assert "color_map" not in nodes["correlation_matrix"]
        assert nodes["correlation_matrix"]["_ref_extra"]["color_map"] \
            == "No Such Map"
        assert "color_map" not in nodes["time_series_correlation"]
        assert any("color map" in w for w in warnings)
        # Known names still import (canonical display spelling).
        doc["renderers"][0]["state"]["color_map"] = "cool_to_warm"
        out2, _ = convert_reference_state(doc, vd.field_names)
        assert out2["renderers"][0]["color_map"] == "Cool to Warm"
        # And the degraded matrix node renders without KeyError.
        path = tmp_path / "badmap.json"
        path.write_text(json.dumps(doc))
        scene = Scene.load_state(str(path), volume_data=vd)
        node = next(r for r in scene.renderers
                    if r["type"] == "correlation_matrix")
        assert "<svg" in scene.render_diagram(node)

    def test_timeseries_node_needs_source(self):
        vd, _ = make_volume()
        scene = Scene(vd)
        with pytest.raises(ValueError, match="time-series"):
            scene.render_diagram({"type": "time_series_correlation"})


class TestViewStateFlag:
    def test_view_accepts_state_file(self, tmp_path, monkeypatch):
        """`cli view --state ref.json` builds the scene from the state
        file (no --dataset needed) and hands it to serve()."""
        from correrender_tpu.io import writers
        from correrender_tpu.app import cli

        data = fixtures.synth_box_ensemble(xs=8, ys=8, zs=4, members=6)
        nc = str(tmp_path / "ens.nc")
        writers.write_netcdf(nc, data[:, None])
        doc = {
            "renderers": [{"type": "dvr",
                           "state": {"selected_field_idx": "0"}}],
            "volume_data": {"filename": nc},
        }
        state = tmp_path / "state.json"
        state.write_text(json.dumps(doc))

        served = {}

        def fake_serve(scene, **kw):
            served["scene"] = scene

        import correrender_tpu.app.viewer as viewer

        monkeypatch.setattr(viewer, "serve", fake_serve)
        monkeypatch.setattr(
            "sys.argv",
            ["cli", "view", "--state", str(state), "--size", "64x48"],
        )
        cli.main()
        assert served["scene"].renderers[0]["type"] == "dvr"

    def test_view_without_dataset_or_state_errors(self, monkeypatch):
        from correrender_tpu.app import cli

        monkeypatch.setattr("sys.argv", ["cli", "view"])
        with pytest.raises(SystemExit, match="--dataset or --state"):
            cli.main()


class TestWindowSize:
    def test_window_size_honored(self, tmp_path):
        vd, _ = make_volume()
        doc = {"window_size": {"x": 640, "y": 360},
               "renderers": [{"type": "domain_outline", "state": {}}]}
        path = tmp_path / "state.json"
        path.write_text(json.dumps(doc))
        scene = Scene.load_state(str(path), volume_data=vd)
        assert scene.window_size == (640, 360)


class TestReviewFindings:
    """Regressions for the round-3 interchange review pass."""

    def test_unknown_types_skip_without_crash(self, tmp_path):
        vd, _ = make_volume()
        doc = {
            "calculators": [
                {"type": "frobnicator", "state": {"x": "1"}},
                {"type": "correlation", "state": {
                    # Index 2 = data(0) + frobnicator placeholder(1)
                    # + ... wait: this node's own output isn't built
                    # yet, so 0=data, 1=frobnicator output.
                    "scalar_field_idx": "0",
                    "correlation_measure_type": "pearson"}},
            ],
            "renderers": [
                {"type": "hologram", "state": {}},
                # Index 2 = pearson output (data, frobnicator, pearson).
                {"type": "dvr", "state": {"selected_field_idx": "2"}},
            ],
        }
        path = tmp_path / "s.json"
        path.write_text(json.dumps(doc))
        scene = Scene.load_state(str(path), volume_data=vd)
        # Unknown nodes dropped; field indexing preserved through the
        # placeholder.
        assert len(scene.volume_data.calculators) == 1
        dvr = next(r for r in scene.renderers if r["type"] == "dvr")
        assert dvr["field"] == "Pearson Correlation"

    def test_bitmask_scalar_field_selection_survives(self):
        doc = {"renderers": [{"type": "correlation_matrix", "state": {
            "scalar_field_selection": "0101",
        }}]}
        ours, _ = convert_reference_state(doc, ["a", "b", "c", "d"])
        node = ours["renderers"][0]
        assert node["_ref_extra"]["scalar_field_selection"] == "0101"
        ref = reference_state_from_scene.__module__  # module sanity
        assert ref == "correrender_tpu.app.state_ref"

    def test_hidden_renderer_round_trip(self, tmp_path):
        vd, _ = make_volume()
        doc = {"renderers": [
            {"type": "dvr", "state": {"selected_field_idx": "0",
                                      "view_visibility": "00"}},
        ]}
        path = tmp_path / "s.json"
        path.write_text(json.dumps(doc))
        scene = Scene.load_state(str(path), volume_data=vd)
        node = scene.renderers[0]
        assert node["hidden"] is True
        # Hidden renderers do not draw.
        img = np.asarray(scene.render_view(0, image_size=(32, 24)))
        assert img[..., 3].max() == 0
        # Re-export restores the all-zeros mask.
        out = tmp_path / "back.json"
        scene.save_state(str(out), reference_format=True)
        back = json.load(open(out))
        vis = back["renderers"][0]["state"]["view_visibility"]
        assert set(vis) == {"0"}

    def test_tf_control_points_survive_native_round_trip(self, tmp_path):
        vd, _ = make_volume()
        doc = reference_doc()
        p1 = tmp_path / "ref.json"
        p1.write_text(json.dumps(doc))
        scene = Scene.load_state(str(p1), volume_data=vd)
        # native save → native load → reference export keeps the
        # ORIGINAL widget points (not a 17-point LUT resample).
        p2 = str(tmp_path / "native.json")
        scene.save_state(p2)
        vd2, _ = make_volume()
        scene2 = Scene.load_state(p2, volume_data=vd2)
        tf = scene2.transfer_functions["data"]
        assert len(tf.color_points) == 2
        assert len(tf.opacity_points) == 3
        p3 = str(tmp_path / "back_ref.json")
        scene2.save_state(p3, reference_format=True)
        back = json.load(open(p3))
        xml = back["volume_data"]["transfer_functions"][0]["data"]
        assert xml.count("<ColorPoint ") == 2
        assert xml.count("<OpacityPoint ") == 3

    def test_separate_fields_export_uses_query_key(self, tmp_path):
        from correrender_tpu.calculators.correlation import (
            CorrelationCalculator,
        )

        vd, _ = make_volume()
        vd.add_field("data2", lambda t, e: np.zeros((8, 16, 16),
                                                    np.float32))
        scene = Scene(vd)
        scene.add_calculator(CorrelationCalculator(
            "data", field_name_ref="data2", symmetric_fields=True,
            measure="pearson",
        ))
        path = str(tmp_path / "ref.json")
        scene.save_state(path, reference_format=True)
        state = json.load(open(path))["calculators"][0]["state"]
        assert "scalar_field_idx" not in state
        assert state["scalar_field_idx_query"] == "0"
        assert state["scalar_field_idx_ref"] == "1"

    def test_diagram_export_key_symmetry(self, tmp_path):
        vd, _ = make_volume()
        scene = Scene(vd)
        scene.add_renderer("diagram", measure="spearman", absolute=True,
                           num_samples=12)
        scene.add_renderer("distribution_similarity",
                           mode="member_cell_values",
                           sampling_pattern="plastic",
                           perplexity=12.5, tsne_seed=7)
        scene.add_renderer("time_series_correlation", measure="kendall",
                           absolute=True, window=16)
        path = str(tmp_path / "ref.json")
        scene.save_state(path, reference_format=True)
        doc = json.load(open(path))
        diag = next(r["state"] for r in doc["renderers"]
                    if r["type"] == "diagram")
        assert diag["correlation_measure_type"] == "spearman"
        assert diag["use_absolute_correlation_measure"] == "1"
        dist = next(r["state"] for r in doc["renderers"]
                    if r["type"] == "distribution_similarity")
        assert dist["distribution_analysis_mode"] == \
            "Member Grid Cell Value Vector"
        assert dist["sampling_pattern"] == "Quasirandom Plastic"
        assert dist["tsne_perplexity"] == "12.5"
        assert dist["tsne_random_seed"] == "7"
        ts = next(r["state"] for r in doc["renderers"]
                  if r["type"] == "time_series_correlation")
        assert ts["correlation_measure_type"] == "kendall"
        assert ts["calculate_absolute_value"] == "1"
        assert ts["sliding_window_length"] == "16"
        # And the file reloads with those settings intact.
        vd2, _ = make_volume()
        scene2 = Scene.load_state(path, volume_data=vd2)
        diag2 = next(r for r in scene2.renderers
                     if r["type"] == "diagram")
        assert diag2["measure"] == "spearman"
        assert diag2["absolute"] is True

    def test_window_size_round_trip(self, tmp_path):
        vd, _ = make_volume()
        doc = {"window_size": {"x": 800, "y": 600},
               "renderers": []}
        p = tmp_path / "s.json"
        p.write_text(json.dumps(doc))
        scene = Scene.load_state(str(p), volume_data=vd)
        out = str(tmp_path / "back.json")
        scene.save_state(out, reference_format=True)
        back = json.load(open(out))
        assert back["window_size"] == {"x": 800, "y": 600}


class TestDiagramMatrixMode:
    def test_matrix_display_mode(self, tmp_path):
        vd, _ = make_volume()
        doc = {"renderers": [{"type": "diagram", "state": {
            "diagram_type": "matrix",
            "correlation_measure_type": "pearson",
            "downscaling_factor_x": "8", "downscaling_factor_y": "8",
            "downscaling_factor_z": "4",
        }}]}
        p = tmp_path / "s.json"
        p.write_text(json.dumps(doc))
        scene = Scene.load_state(str(p), volume_data=vd)
        node = scene.renderers[0]
        assert node["diagram_type"] == "matrix"
        svg = scene.render_diagram(node, size=240)
        assert "<svg" in svg and "<rect" in svg

    def test_pair_matrix_symmetric(self):
        from correrender_tpu.diagrams.heb import HEBChart

        vd, _ = make_volume()
        stack = np.asarray(vd.get_member_stack("data"))
        chart = HEBChart(stack, downsample_factor=(8, 8, 4),
                         sampling_method="mean")
        chart.compute_correlations()
        m = chart.pair_matrix()
        assert m.shape == (chart.num_leaves, chart.num_leaves)
        finite = np.isfinite(m)
        assert finite.any()
        np.testing.assert_allclose(m[finite],
                                   m.T[finite.T], atol=1e-6)
        assert np.isnan(np.diag(m)).all()


class TestViewerHebDefaults:
    def test_diagram_node_overrides_heb_defaults(self, tmp_path):
        """A loaded state's DiagramRenderer node drives the viewer's
        HEB defaults (and /info exposes them)."""
        from correrender_tpu.app.viewer import ViewerApp

        vd, _ = make_volume()
        doc = {"renderers": [
            {"type": "dvr", "state": {"selected_field_idx": "0"}},
            {"type": "diagram", "state": {
                "correlation_measure_type": "pearson",
                "downscaling_factor_x": "8",
                "downscaling_factor_y": "8",
                "downscaling_factor_z": "4",
                "sampling_method_type": "Mean",
                "num_samples": "12",
                "line_count_factor_context": "99",
                "correlation_range_lower": "0.25",
                "correlation_range_upper": "1",
            }},
        ]}
        p = tmp_path / "s.json"
        p.write_text(json.dumps(doc))
        scene = Scene.load_state(str(p), volume_data=vd)
        viewer = ViewerApp(scene, image_size=(64, 48))
        d = viewer._heb_defaults()
        assert d["downsample"] == (8, 8, 4)
        assert d["sampling_method"] == "mean"
        assert d["num_samples"] == 12
        assert d["max_chords"] == 99
        assert d["correlation_range"] == (0.25, 1.0)
        key = viewer._heb_key({}, "data", "pearson", 0)
        assert key[3] == (8, 8, 4) and key[5] == "mean"
        info = viewer.info()
        assert info["heb_defaults"]["downsample"] == [8, 8, 4]
        # Explicit request params still win.
        key2 = viewer._heb_key({"downsample": "4"}, "data", "pearson", 0)
        assert key2[3] == 4


class TestMalformedInputs:
    """Corrupted/hostile reference state files fail cleanly (or load
    partially with warnings), never hang or fabricate data."""

    def test_bad_tf_xml_warns_and_loads(self, tmp_path):
        vd, _ = make_volume()
        doc = {
            "renderers": [{"type": "dvr",
                           "state": {"selected_field_idx": "0"}}],
            "volume_data": {
                "transfer_functions": [
                    {"data": "<TransferFunction><broken",
                     "selected_range": {"min": 0, "max": 1}},
                ],
            },
        }
        ours, warnings = convert_reference_state(doc, ["data"])
        assert ours["transfer_functions"] == {}
        assert any("XML parse failed" in w for w in warnings)

    def test_missing_state_nodes(self):
        doc = {"calculators": [{"type": "correlation"}],
               "renderers": [{"type": "dvr"}]}
        ours, _ = convert_reference_state(doc, ["data"])
        assert ours["calculators"][0]["type"] == "correlation"
        assert ours["renderers"][0]["type"] == "dvr"

    def test_degenerate_camera(self):
        # Zero-length forward (position == lookat, no orientation).
        cam = camera_from_reference({
            "position": {"x": 0.1, "y": 0.2, "z": 0.3},
            "lookat": {"x": 0.1, "y": 0.2, "z": 0.3},
        })
        d = np.subtract(cam.look_at_point, cam.position)
        assert np.isfinite(d).all() and np.linalg.norm(d) > 0

    def test_straight_down_camera_has_valid_up(self):
        cam = camera_from_reference({
            "position": {"x": 0, "y": 1, "z": 0},
            "lookat": {"x": 0, "y": 0, "z": 0},
            "yaw": 0.0, "pitch": -np.pi / 2,
        })
        f = np.subtract(cam.look_at_point, cam.position)
        f = f / np.linalg.norm(f)
        u = np.asarray(cam.up)
        assert abs(float(np.dot(f, u))) < 0.01

    def test_non_numeric_strings_stay_strings(self):
        doc = {"renderers": [{"type": "dvr", "state": {
            "nan_handling": "yellow",
            "selected_field_idx": "not_a_number",
        }}]}
        ours, warnings = convert_reference_state(doc, ["data"])
        node = ours["renderers"][0]
        assert node["nan_mode"] == "yellow"
        # Unresolvable index degrades to field 0 with a warning.
        assert node["field"] == "data"
        assert any("out of range" in w for w in warnings)

    def test_tf_more_entries_than_fields(self):
        doc = {"volume_data": {"transfer_functions": [
            {"data": TF_XML, "selected_range": {"min": 0, "max": 1}},
            {"data": TF_XML, "selected_range": {"min": 0, "max": 1}},
            {"data": TF_XML, "selected_range": {"min": 0, "max": 1}},
        ]}}
        ours, warnings = convert_reference_state(doc, ["data"])
        assert list(ours["transfer_functions"]) == ["data"]
        assert any("no matching" in w for w in warnings)


class TestStateConvertCli:
    def test_pure_conversion_without_render(self, tmp_path, capsys):
        from correrender_tpu.app import cli
        from correrender_tpu.io import writers

        data = fixtures.synth_box_ensemble(xs=8, ys=8, zs=4, members=6)
        nc = str(tmp_path / "ens.nc")
        writers.write_netcdf(nc, data[:, None])
        ref = {
            "renderers": [{"type": "dvr",
                           "state": {"selected_field_idx": "0"}}],
            "volume_data": {"filename": nc},
        }
        src = tmp_path / "ref.json"
        src.write_text(json.dumps(ref))
        native = str(tmp_path / "native.json")
        back = str(tmp_path / "back.json")
        cli.main(["state", "--load", str(src),
                  "--save", native, "--save-reference", back])
        doc = json.load(open(native))
        assert doc["renderers"][0]["type"] == "dvr"
        assert is_reference_state(json.load(open(back)))

    def test_no_output_no_save_errors(self, tmp_path):
        from correrender_tpu.app import cli
        from correrender_tpu.io import writers

        data = fixtures.synth_box_ensemble(xs=8, ys=8, zs=4, members=4)
        nc = str(tmp_path / "ens.nc")
        writers.write_netcdf(nc, data[:, None])
        p = tmp_path / "s.json"
        p.write_text(json.dumps({"renderers": [],
                                 "volume_data": {"filename": nc}}))
        with pytest.raises(SystemExit, match="--output"):
            cli.main(["state", "--load", str(p)])


class TestDiagramPlacement:
    """align_with_parent_window + context/focus diagram views map onto
    the overlay placement keys both ways
    (DiagramRenderer.cpp:1856-1857 persistence)."""

    def _doc(self, align="1"):
        return {
            "renderers": [{"type": "diagram", "state": {
                "view_visibility": "10",
                "align_with_parent_window": align,
                "context_diagram_view": "1",
                "focus_diagram_view": "0",
                "correlation_measure_type": "pearson",
            }}],
        }

    def test_import_aligned(self):
        ours, _ = convert_reference_state(self._doc(), ["data"])
        node = ours["renderers"][0]
        assert node["view"] == 1  # context view selects the dock view
        assert node["focus_view"] == 0
        assert node["overlay_anchor"] == "center"
        assert node["overlay_frac"] == 1.0

    def test_import_unaligned_keeps_default_corner(self):
        ours, _ = convert_reference_state(self._doc(align="0"), ["data"])
        node = ours["renderers"][0]
        assert "overlay_anchor" not in node
        assert "overlay_frac" not in node

    def test_roundtrip_through_scene(self, tmp_path):
        import json as _json

        vd, _ = make_volume()
        path = tmp_path / "ref.json"
        path.write_text(_json.dumps(self._doc()))
        scene = Scene.load_state(str(path), volume_data=vd)
        back = reference_state_from_scene(scene)
        state = next(r["state"] for r in back["renderers"]
                     if r["type"] == "diagram")
        assert state["align_with_parent_window"] == "1"
        assert state["context_diagram_view"] == "1"
        assert state["focus_diagram_view"] == "0"
        # Re-import of the exported doc lands on the same placement.
        ours2, _ = convert_reference_state(back, ["data"])
        node2 = next(r for r in ours2["renderers"]
                     if r["type"] == "diagram")
        assert node2["view"] == 1
        assert node2["focus_view"] == 0
        assert node2["overlay_anchor"] == "center"

    def test_center_anchor_composites_centered(self):
        from correrender_tpu.diagrams.raster import composite_overlay

        frame = np.zeros((40, 60, 4), np.float32)
        ov = np.ones((10, 10, 4), np.float32)
        out = composite_overlay(frame, ov, anchor="center")
        ys, xs = np.nonzero(out[..., 0])
        assert ys.min() == 15 and ys.max() == 24
        assert xs.min() == 25 and xs.max() == 34
