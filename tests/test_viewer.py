"""Interactive viewer (app/viewer.py): HTTP surface + command dispatch.

The viewer is the reference GUI analogue (MainApp frame loop +
PointPicker + property editor); these tests drive the real HTTP server
on an ephemeral port the way the browser client does.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from correrender_tpu.app.state import Scene
from correrender_tpu.app.viewer import ViewerApp, make_server
from correrender_tpu.calculators.correlation import CorrelationCalculator
from correrender_tpu.core import GridMetadata, VolumeData
from correrender_tpu.render.camera import Camera
from correrender_tpu.utils import fixtures


def make_scene(members=16):
    data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8,
                                       members=members)
    vd = VolumeData(GridMetadata(xs=16, ys=16, zs=8, es=members))
    vd.add_field("data", lambda t, e: data[e])
    scene = Scene(vd, views=[Camera(position=(0.0, 0.2, 0.8))])
    name = scene.add_calculator(
        CorrelationCalculator("data", reference_point=(4, 4, 4)))
    scene.add_renderer("dvr", field=name)
    return scene


@pytest.fixture()
def server_url():
    scene = make_scene()
    server, app = make_server(scene, port=0, image_size=(96, 72))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    try:
        yield f"http://{host}:{port}", app
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _api(base, cmd):
    req = urllib.request.Request(
        base + "/api", data=json.dumps(cmd).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


class TestHttpSurface:
    def test_index_and_info(self, server_url):
        base, _ = server_url
        status, ctype, body = _get(base + "/")
        assert status == 200 and ctype.startswith("text/html")
        assert b"correrender_tpu" in body

        info = _api(base, {"op": "info"})
        assert info["ok"]
        assert info["grid"] == {"xs": 16, "ys": 16, "zs": 8,
                                "ts": 1, "es": 16}
        assert "pearson" in info["measures"]
        assert info["reference_point"] == [4, 4, 4]
        assert info["measure"] == "pearson"

    def test_frame_is_png(self, server_url):
        base, _ = server_url
        status, ctype, body = _get(base + "/frame")
        assert status == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    def test_orbit_changes_frame(self, server_url):
        base, _ = server_url
        _, _, before = _get(base + "/frame")
        reply = _api(base, {"op": "orbit", "dtheta": 1.2, "dphi": 0.3})
        assert reply["ok"]
        _, _, after = _get(base + "/frame")
        assert before != after

    def test_pick_moves_reference_point(self, server_url):
        base, app = server_url
        # Pixel at image center: the ray hits the box head-on.
        reply = _api(base, {"op": "pick", "px": 48, "py": 36})
        assert reply["ok"], reply
        ref = reply["reference_point"]
        calc = next(iter(
            app.scene.volume_data.calculators.values()))
        assert tuple(ref) == calc.reference_point
        assert tuple(ref) != (4, 4, 4)

    def test_pick_miss_reports_error(self, server_url):
        base, app = server_url
        # Zoom far out so the corner pixel's ray is guaranteed to miss
        # the unit-scale volume box.
        _api(base, {"op": "zoom", "factor": 10.0})
        reply = _api(base, {"op": "pick", "px": 0, "py": 0})
        assert not reply["ok"]
        assert "miss" in reply["error"]

    def test_pick_clamps_edge_pixels(self, server_url):
        base, app = server_url
        # The client rounds, so a rightmost/bottom half-pixel click
        # sends px == width; the server clamps instead of IndexError.
        reply = _api(base, {"op": "pick", "px": 96, "py": 72})
        assert "error" not in reply or "miss" in reply.get("error", "")

    def test_pick_scroll_scrubs_depth(self, server_url):
        # PointPicker.cpp:128-135: the wheel moves the focus point
        # along the last pick ray, clamped between the volume entry
        # and exit hits.
        base, app = server_url
        reply = _api(base, {"op": "pick", "px": 48, "py": 36})
        assert reply["ok"], reply
        entry = reply["reference_point"]

        # Scrub deep into the volume: the reference point must move
        # along the ray (the center pixel's ray is roughly -z).
        reply = _api(base, {"op": "pick_scroll", "amount": 0.5})
        assert reply["ok"], reply
        mid = reply["reference_point"]
        assert mid != entry

        # A huge scrub clamps at the exit hit instead of leaving the
        # volume.
        reply = _api(base, {"op": "pick_scroll", "amount": 100.0})
        assert reply["ok"], reply
        far = reply["reference_point"]
        g = app.scene.volume_data.grid
        assert 0 <= far[0] < g.xs and 0 <= far[1] < g.ys \
            and 0 <= far[2] < g.zs

        # And scrubbing all the way back clamps at the entry hit.
        reply = _api(base, {"op": "pick_scroll", "amount": -100.0})
        assert reply["ok"], reply
        assert reply["reference_point"] == entry

    def test_pick_scroll_without_pick_errors(self, server_url):
        base, _ = server_url
        reply = _api(base, {"op": "pick_scroll", "amount": 0.5})
        assert not reply["ok"]
        assert "pick" in reply["error"]

    def test_get_api_is_read_only(self, server_url):
        base, _ = server_url
        status, _, body = _get(base + "/api?op=info")
        assert status == 200 and b'"grid"' in body
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(base + "/api?op=set_option&key=legend&value=false")
        assert exc.value.code == 403

    def test_post_requires_json_content_type(self, server_url):
        base, _ = server_url
        req = urllib.request.Request(
            base + "/api", data=b'{"op": "set_option", '
            b'"key": "legend", "value": false}',
            headers={"Content-Type": "text/plain"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 415

    def test_set_measure_and_field(self, server_url):
        base, app = server_url
        _, _, before = _get(base + "/frame")
        reply = _api(base, {"op": "set_measure", "measure": "kendall"})
        assert reply["ok"]
        calc = next(iter(app.scene.volume_data.calculators.values()))
        assert calc.measure.value == "kendall"
        # A default-named calculator's output field renames with the
        # measure (reference behavior) — the renderer reference and
        # the registry must follow, and the frame must actually show
        # the NEW measure (the original bug: mark_dirty hit the new
        # name while the renderer kept serving the stale old slab).
        assert app.scene.renderers[0]["field"] == calc.output_name
        assert calc.output_name in app.scene.volume_data.field_names
        status, _, after = _get(base + "/frame")
        assert status == 200
        assert before != after

        reply = _api(base, {"op": "set_field", "field": "nope"})
        assert not reply["ok"]
        # A calculator output is not a valid calculator input (it
        # would recurse at compute time).
        reply = _api(base, {"op": "set_field",
                            "field": calc.output_name})
        assert not reply["ok"] and "derived" in reply["error"]

    def test_set_field_preserves_separate_reference(self):
        from correrender_tpu.utils import fixtures as fx

        scene = make_scene()
        vd = scene.volume_data
        other = fx.synth_box_ensemble(xs=16, ys=16, zs=8, members=16,
                                      seed=7)
        vd.add_field("other", lambda t, e: other[e])
        third = fx.synth_box_ensemble(xs=16, ys=16, zs=8, members=16,
                                      seed=8)
        vd.add_field("third", lambda t, e: third[e])
        calc = next(iter(vd.calculators.values()))
        calc.field_name_ref = "other"   # SEPARATE-fields setup
        app = ViewerApp(scene, image_size=(64, 48))
        assert app.api({"op": "set_field", "field": "third"})["ok"]
        assert calc.field_name == "third"
        assert calc.field_name_ref == "other"  # NOT collapsed
        # SINGLE mode (ref == field) keeps following the query field.
        calc.field_name_ref = "third"
        assert app.api({"op": "set_field", "field": "data"})["ok"]
        assert calc.field_name_ref == "data"

    def test_unknown_op(self, server_url):
        base, _ = server_url
        reply = _api(base, {"op": "warp_core_breach"})
        assert not reply["ok"] and "unknown op" in reply["error"]

    def test_diagram_endpoint(self, server_url):
        base, app = server_url
        status, ctype, body = _get(base + "/diagram?kind=heb"
                                   "&downsample=4&num_samples=6"
                                   "&max_chords=20")
        assert status == 200 and ctype == "image/svg+xml"
        assert body.startswith(b"<svg") or b"<svg" in body[:200]
        # Cached per epoch: identical request returns the same text.
        _, _, body2 = _get(base + "/diagram?kind=heb&downsample=4"
                           "&num_samples=6&max_chords=20")
        assert body2 == body

        status, _, body = _get(base + "/diagram?kind=scatter")
        assert status == 200 and b"<svg" in body[:200]

        # Chord filters pass through to the chart (reference
        # correlation_range / cell_distance_range settings).
        status, _, fbody = _get(
            base + "/diagram?kind=heb&downsample=4&num_samples=6"
            "&max_chords=20&correlation_range=0.99999,1"
            "&cell_distance_range=50,60")
        assert status == 200 and b"<svg" in fbody[:200]
        # The impossible window drew no chords: chord paths carry
        # tooltips; ring arcs are also <path> elements, so count
        # tooltips instead.
        assert b"<title>" not in fbody

        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(base + "/diagram?kind=nope")
        assert exc.value.code == 400

        # Single-timestep scenes reject the timeseries kind cleanly.
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(base + "/diagram?kind=timeseries")
        assert exc.value.code == 400

    def test_timeseries_diagram_multistep(self):
        # Region-mean pairwise correlation heat map over the time
        # axis (reference TimeSeriesCorrelation renderer).
        rng = np.random.default_rng(3)
        ts = 12
        base_sig = rng.normal(size=ts).astype(np.float32)
        vols = []
        for t in range(ts):
            v = rng.normal(size=(4, 8, 8)).astype(np.float32) * 0.1
            v[:, :4] += base_sig[t]      # correlated half-domain
            vols.append(v)
        vd = VolumeData(GridMetadata(xs=8, ys=8, zs=4, es=1, ts=ts))
        vd.add_field("f", lambda t, e: vols[t])
        scene = Scene(vd, views=[Camera(position=(0.0, 0.2, 0.8))])
        scene.add_renderer("dvr", field="f")
        app = ViewerApp(scene, image_size=(64, 48), warm_measures=False)
        svg = app.diagram_svg("timeseries", {"downsample": 4})
        assert "<svg" in svg and "rect" in svg
        # Lag-window mode renders too.
        svg2 = app.diagram_svg("timeseries", {"downsample": 4,
                                              "window": 6})
        assert "<svg" in svg2
        app.close()

    def test_404(self, server_url):
        base, _ = server_url
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(base + "/nothing")
        assert exc.value.code == 404


class TestViewerApp:
    def test_zoom_and_clamps(self):
        app = ViewerApp(make_scene(), image_size=(64, 48))
        r0 = app._radius
        assert app.api({"op": "zoom", "factor": 0.5})["ok"]
        assert app._radius == pytest.approx(r0 * 0.5)
        app.api({"op": "zoom", "factor": 1e-9})
        assert app._radius == 0.05

        app.api({"op": "set_time", "time": 99})
        assert app.scene.current_time == 0  # ts=1, clamped
        app.api({"op": "set_member", "member": 99})
        assert app.scene.current_member == 15

    def test_camera_checkpoint_roundtrip(self):
        app = ViewerApp(make_scene(), image_size=(64, 48))
        app.api({"op": "checkpoint_save", "name": "home"})
        app.api({"op": "orbit", "dtheta": 1.0, "dphi": 0.2})
        moved = np.asarray(app.scene.views[0].position)
        reply = app.api({"op": "checkpoint_restore", "name": "home"})
        assert reply["ok"]
        home = np.asarray(app.scene.views[0].position)
        assert not np.allclose(moved, home)
        assert reply["frame_epoch"] > 0

        bad = app.api({"op": "checkpoint_restore", "name": "nope"})
        assert not bad["ok"]

    def test_set_colormap_and_options(self):
        app = ViewerApp(make_scene(), image_size=(64, 48))
        assert app.api({"op": "set_colormap",
                        "colormap": "viridis"})["ok"]
        assert app.api({"op": "set_option", "key": "legend",
                        "value": False})["ok"]
        assert not app.show_legend
        assert not app.api({"op": "set_option", "key": "nope",
                            "value": 1})["ok"]
        assert app.api({"op": "set_option", "key": "image_size",
                        "value": [32, 24]})["ok"]
        assert app.image_size == (64, 48)  # clamped up to minimum

    def test_set_renderer_and_options(self):
        app = ViewerApp(make_scene(), image_size=(64, 48))
        assert app.api({"op": "set_renderer",
                        "renderer": "iso_ray"})["ok"]
        assert app.scene.renderers[0]["type"] == "iso_ray"
        assert app.api({"op": "set_renderer_option", "key": "iso_value",
                        "value": 0.3})["ok"]
        assert app.scene.renderers[0]["iso_value"] == 0.3

        assert app.api({"op": "set_renderer",
                        "renderer": "slice"})["ok"]
        assert app.api({"op": "set_renderer_option", "key": "axis",
                        "value": "y"})["ok"]
        assert app.api({"op": "set_renderer_option", "key": "position",
                        "value": 1.7})["ok"]
        assert app.scene.renderers[0]["position"] == 1.0  # clamped

        assert not app.api({"op": "set_renderer",
                            "renderer": "nope"})["ok"]
        assert not app.api({"op": "set_renderer_option", "key": "nope",
                            "value": 1})["ok"]
        assert not app.api({"op": "set_renderer_option", "key": "axis",
                            "value": "w"})["ok"]

    def test_set_tf_and_absolute(self):
        app = ViewerApp(make_scene(), image_size=(64, 48))
        calc = next(iter(app.scene.volume_data.calculators.values()))
        name = calc.output_name
        # Custom opacity curve rebuilds the TF for the calc output.
        assert app.api({"op": "set_tf",
                        "opacity_points": [[0, 0.1], [0.5, 0.9],
                                           [1, 0.1]]})["ok"]
        tf1 = app.scene.transfer_functions[name]
        info = app.info()
        assert info["opacity_points"] == [[0, 0.1], [0.5, 0.9], [1, 0.1]]
        assert info["opacity_default"] is False
        # Bad curves are rejected.
        assert not app.api({"op": "set_tf",
                            "opacity_points": [[0, 2.0]]})["ok"]
        assert not app.api({"op": "set_tf",
                            "opacity_points": [[0.9, 0.1],
                                               [0.1, 0.2]]})["ok"]
        # Reset back to the measure-derived default.
        assert app.api({"op": "set_tf", "opacity_points": None})["ok"]
        assert app.info()["opacity_default"] is True
        assert app.scene.transfer_functions[name] is not tf1

        # Absolute mode flips the calculator and re-derives the TF.
        assert app.api({"op": "set_absolute", "value": True})["ok"]
        assert calc.absolute is True
        assert app.info()["absolute"] is True
        lo, _hi = app.scene.volume_data.get_min_max(name)
        assert lo >= 0.0

    def test_set_colormap_unknown_rejected(self):
        app = ViewerApp(make_scene(), image_size=(64, 48))
        assert not app.api({"op": "set_colormap",
                            "colormap": "nope"})["ok"]
        assert app.api({"op": "set_colormap",
                        "colormap": "viridis"})["ok"]
        assert app.info()["colormap"] == "viridis"

    def test_fused_path_matches_scene_render(self):
        # The single-DVR-over-correlation shape takes the fused
        # correlate+render program (render/pipeline.py); its frame
        # must match the Scene compositor's within fusion tolerance.
        scene = make_scene()
        app = ViewerApp(scene, image_size=(96, 72))
        job = app._fused_dvr_job()
        assert job is not None
        fused = np.asarray(app._render_fused(*job))
        composed = np.asarray(scene.render_view(
            0, image_size=(96, 72), fast_dvr=True))
        assert fused.shape == composed.shape
        assert np.abs(fused - composed).max() < 0.05

        # De-fusing conditions fall back to the Scene path.
        calc = next(iter(scene.volume_data.calculators.values()))
        calc.use_render_restriction = True
        assert app._fused_dvr_job() is None
        calc.use_render_restriction = False
        assert app._fused_dvr_job() is not None
        scene.add_renderer("domain_outline")
        assert app._fused_dvr_job() is None

    def test_frame_cache_serves_unchanged_frames(self):
        app = ViewerApp(make_scene(), image_size=(64, 48))
        p1 = app.frame_png()
        assert app.frame_png() is p1        # cached bytes, no re-render
        app.api({"op": "orbit", "dtheta": 0.5})
        p2 = app.frame_png()
        assert p2 != p1                     # epoch bump invalidates

    def test_save_state(self, tmp_path):
        app = ViewerApp(make_scene(), image_size=(64, 48))
        path = tmp_path / "scene.json"
        reply = app.api({"op": "save_state", "path": str(path)})
        assert reply["ok"] and path.exists()
        saved = json.loads(path.read_text())
        assert "calculators" in saved

    def test_measure_warming_thread(self):
        # The first frame starts the measure warmer (fused-DVR views
        # only); warm completion leaves every measure's programs in
        # the process cache so set_measure + frame needs no fresh
        # compile. warm_measures=False must not start it.
        app = ViewerApp(make_scene(), image_size=(64, 48))
        app.frame_png()
        assert app._warm_thread is not None
        app._warm_thread.join(timeout=300)
        assert not app._warm_thread.is_alive()
        app.api({"op": "set_measure", "measure": "mi_kraskov"})
        png = app.frame_png()
        assert png[:4] == b"\x89PNG"

        cold = ViewerApp(make_scene(), image_size=(64, 48),
                         warm_measures=False)
        cold.frame_png()
        assert cold._warm_thread is None

    def test_export_similarity_tfopt_ops(self, tmp_path):
        # The three reference dialogs exposed as viewer ops: field
        # export, field similarity, TF optimization.
        app = ViewerApp(make_scene(), image_size=(64, 48),
                        warm_measures=False)
        app.frame_png()  # materialize the derived field
        out = str(tmp_path / "f.nc")
        r = app.api({"op": "export_field", "path": out})
        assert r["ok"] and r["field"].startswith("Pearson")
        import os

        assert os.path.exists(out)
        s = app.api({"op": "similarity", "field_a": "data",
                     "field_b": "data"})
        assert s["ok"] and s["value"] == pytest.approx(1.0, abs=1e-5)
        o = app.api({"op": "tf_optimize", "field_src": "data",
                     "field_dst": "data", "tf_size": 16})
        assert o["ok"]
        png = app.frame_png()
        assert png[:4] == b"\x89PNG"
        bad = app.api({"op": "tf_optimize", "field_src": "data",
                       "field_dst": "data", "tf_size": 7})
        assert not bad["ok"]

    def test_set_view_multi_view(self):
        scene = make_scene()
        scene.views.append(Camera(position=(0.6, 0.1, 0.4)))
        app = ViewerApp(scene, image_size=(64, 48),
                        warm_measures=False)
        assert app.api({"op": "info"})["num_views"] == 2
        p0 = app.frame_png()
        r = app.api({"op": "set_view", "view": 1})
        assert r["ok"]
        assert app.frame_png() != p0          # other camera renders
        assert not app.api({"op": "set_view", "view": 5})["ok"]

    def test_heb_drilldown_ops(self):
        # The reference DiagramRenderer drill-down stack, driven the
        # way the panel does: list chords → drill → region outlines in
        # the 3D frame → drilled chart in the diagram dock → pop/reset.
        app = ViewerApp(make_scene(), image_size=(64, 48),
                        warm_measures=False)
        base_png = app.frame_png()
        r = app.api({"op": "heb_chords", "downsample": 4,
                     "num_samples": 6})
        assert r["ok"] and r["depth"] == 1 and r["chords"]
        assert {"index", "value", "a", "b"} <= set(r["chords"][0])
        d = app.api({"op": "heb_drill", "chord": 0, "downsample": 4,
                     "num_samples": 6})
        assert d["ok"] and d["depth"] == 2
        png = app.frame_png()        # outline overlay path
        assert png[:4] == b"\x89PNG" and png != base_png
        svg = app.diagram_svg("heb", {"downsample": 4,
                                      "num_samples": 6})
        assert "<svg" in svg         # served from the drill stack
        bad = app.api({"op": "heb_drill", "chord": 9999,
                       "downsample": 4, "num_samples": 6})
        assert not bad["ok"]
        p = app.api({"op": "heb_pop"})
        assert p["ok"] and p["depth"] == 1
        # A measure change invalidates the drill stack for the dock:
        # the HEB diagram must NOT serve the stale pearson chart.
        app.api({"op": "set_measure", "measure": "spearman"})
        svg2 = app.diagram_svg("heb", {"downsample": 4,
                                       "num_samples": 6,
                                       "measure": "spearman"})
        assert "<svg" in svg2
        rst = app.api({"op": "heb_reset"})
        assert rst["ok"] and rst["depth"] == 0
        assert app.api({"op": "heb_pop"})["ok"] is False

    def test_heavy_diagrams_serve_off_lock(self):
        # A slow diagram serve must not freeze the frame endpoint:
        # heb/distribution snapshot the stack under the lock and
        # compute off it.
        import time

        app = ViewerApp(make_scene(), image_size=(64, 48),
                        warm_measures=False)
        app.frame_png()
        done = {}

        def diag():
            done["svg"] = app.diagram_svg(
                "heb", {"downsample": 2, "num_samples": 8})

        t = threading.Thread(target=diag)
        t.start()
        app.api({"op": "orbit", "dtheta": 0.3})
        t0 = time.perf_counter()
        app.frame_png()
        frame_t = time.perf_counter() - t0
        t.join(timeout=120)
        assert "<svg" in done["svg"]
        assert frame_t < 60  # not serialized behind the whole serve
        # sampling_method param passes through to the HEB chart.
        svg = app.diagram_svg("heb", {"downsample": 2,
                                      "num_samples": 8,
                                      "sampling_method": "mean"})
        assert "<svg" in svg


class TestDrilldownConsistencyFixes:
    """Round-3 review regressions: stale-overlay gating, default
    alignment between the drill stack and the plain HEB diagram."""

    def test_plain_diagram_defaults_serve_the_drill_stack(self):
        # The chord list (drill stack) and the displayed chart (plain
        # diagram job) must be built with the SAME defaults, or chord
        # row k points into a chart the user is not looking at.
        app = ViewerApp(make_scene(), image_size=(64, 48),
                        warm_measures=False)
        r = app.api({"op": "heb_chords"})
        assert r["ok"] and r["chords"]
        with app._lock:
            field, measure, _ = app._diagram_field_measure({})
            expected = app._heb_key({}, field, measure,
                                    app.scene.current_time)
        assert app._drilldown_key == expected
        app.close()

    def test_stale_drill_outlines_leave_the_frame(self):
        # After a measure change the diagram endpoint stops serving
        # the drill stack (02af82f); the 3D outlines must go stale
        # with it instead of drawing the old selection.
        app = ViewerApp(make_scene(), image_size=(64, 48),
                        warm_measures=False)
        app.api({"op": "heb_chords", "num_samples": 4,
                 "sampling_method": "mean"})
        d = app.api({"op": "heb_drill", "chord": 0, "num_samples": 4,
                     "sampling_method": "mean"})
        assert d["ok"] and d["depth"] == 2
        with_overlay = app.frame_png()
        app.api({"op": "set_measure", "measure": "spearman"})
        stale = app.frame_png()       # drill stack still set, but stale
        app.api({"op": "heb_reset"})  # now actually cleared
        cleared = app.frame_png()
        assert stale == cleared       # overlay already gone when stale
        assert with_overlay != cleared
        app.close()


class TestTimeseriesDiagramRobustness:
    def _multistep_scene(self, nan=False):
        rng = np.random.default_rng(5)
        ts = 6
        vols = []
        for t in range(ts):
            v = rng.normal(size=(4, 8, 8)).astype(np.float32)
            if nan and t == 2:
                v[:] = np.nan  # every cell all-NaN at one timestep
            vols.append(v)
        vd = VolumeData(GridMetadata(xs=8, ys=8, zs=4, es=1, ts=ts))
        vd.add_field("f", lambda t, e: vols[t])
        scene = Scene(vd, views=[Camera(position=(0.0, 0.2, 0.8))])
        scene.add_renderer("dvr", field="f")
        return scene

    def test_all_nan_cells_report_cleanly(self):
        # Masked data where no downsampled cell is finite across all
        # timesteps must raise a descriptive error, not a zero-size
        # array crash (round-3 review).
        app = ViewerApp(self._multistep_scene(nan=True),
                        image_size=(64, 48), warm_measures=False)
        with pytest.raises(ValueError, match="finite"):
            app.diagram_svg("timeseries", {"downsample": 8})
        app.close()

    def test_runs_as_heavy_job_off_lock(self):
        # The multi-second timeseries compute must run off the app
        # lock like heb/distribution (round-3 review).
        app = ViewerApp(self._multistep_scene(),
                        image_size=(64, 48), warm_measures=False)
        job = app._heavy_diagram_job("timeseries", {"downsample": 4})
        assert job is not None
        svg = job()
        assert "<svg" in svg
        app.close()


class TestTfColorPoints:
    """TF-editor color control points + standalone sgl TF .xml IO
    (VERDICT r3 #9)."""

    def test_set_color_points_changes_tf(self, server_url):
        base, app = server_url
        target = app._tf_targets()[0]
        lut_before = np.asarray(app.scene.tf_for(target).lut).copy()
        reply = _api(base, {"op": "set_tf", "color_points": [
            [0.0, [0.0, 0.0, 1.0]], [1.0, [1.0, 1.0, 0.0]]]})
        assert reply.get("ok", True)
        lut_after = np.asarray(app.scene.tf_for(target).lut)
        assert np.abs(lut_after[:, :3] - lut_before[:, :3]).max() > 0.1
        info = _api(base, {"op": "info"})
        assert info["color_points"][0] == [0.0, [0.0, 0.0, 1.0]]
        # null → back to the named colormap.
        _api(base, {"op": "set_tf", "color_points": None})
        assert _api(base, {"op": "info"})["color_points"] is None

    def test_color_points_validation(self, server_url):
        base, _ = server_url
        bad = [
            [[0.0, [0.0, 0.0]]],                      # rgb too short
            [[0.5, [0, 0, 0]]],                       # fewer than 2
            [[0.9, [0, 0, 0]], [0.1, [1, 1, 1]]],     # unsorted
            [[0.0, [2, 0, 0]], [1.0, [0, 0, 0]]],     # out of range
        ]
        for cpts in bad:
            reply = _api(base, {"op": "set_tf", "color_points": cpts})
            assert reply["ok"] is False, cpts

    def test_tf_save_load_roundtrip(self, server_url, tmp_path):
        """edit → save → reference-format XML → load round-trip."""
        base, app = server_url
        cpts = [[0.0, [0.1, 0.2, 0.3]], [0.5, [0.9, 0.9, 0.1]],
                [1.0, [0.2, 0.8, 0.4]]]
        opts = [[0.0, 0.1], [1.0, 0.9]]
        _api(base, {"op": "set_tf", "color_points": cpts,
                    "opacity_points": opts})
        path = str(tmp_path / "tf.xml")
        reply = _api(base, {"op": "tf_save", "path": path})
        assert reply["ok"] and "<TransferFunction" in reply["xml"]
        xml_saved = open(path).read()
        # Perturb, then load the saved file back.
        _api(base, {"op": "set_tf", "color_points": None,
                    "opacity_points": None})
        reply = _api(base, {"op": "tf_load", "path": path})
        assert reply.get("ok", True)
        info = _api(base, {"op": "info"})
        got = info["color_points"]
        assert len(got) == 3
        for (p_want, c_want), (p_got, c_got) in zip(cpts, got):
            assert abs(p_want - p_got) < 1e-6
            assert max(abs(a - b) for a, b in zip(c_want, c_got)) \
                < 1.0 / 65535 + 1e-6   # ushort quantization
        # Saving again reproduces the same reference-format XML.
        path2 = str(tmp_path / "tf2.xml")
        _api(base, {"op": "tf_save", "path": path2})
        assert open(path2).read() == xml_saved

    def test_tf_load_rejects_garbage(self, server_url):
        base, _ = server_url
        reply = _api(base, {"op": "tf_load", "xml": "<NotATF/>"})
        assert reply["ok"] is False


def test_timing_op_reports_frame_split():
    scene = make_scene()
    from correrender_tpu.app.viewer import ViewerApp

    app = ViewerApp(scene, image_size=(96, 72))
    app.frame_png()
    t = app.api({"op": "timing"})
    assert t["ok"]
    for k in ("render_ms", "overlay_ms", "encode_ms", "total_ms"):
        assert t[k] >= 0.0
    assert t["total_ms"] >= t["render_ms"]
