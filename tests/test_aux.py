"""Aux-subsystem parity: PathWatch, AppSettings, Logfile,
continuousRecompute (SURVEY §5.1/5.5/5.6; reference MainApp.hpp:162,
Main.cpp:162-195, README.md:152-157, CorrelationCalculator.hpp:123)."""

import json
import os
import time

import numpy as np
import pytest

from correrender_tpu.utils.app_settings import AppSettings
from correrender_tpu.utils.logfile import Logfile
from correrender_tpu.utils.pathwatch import CatalogWatch, PathWatch


def _touch(path, content):
    with open(path, "w") as f:
        f.write(content)
    # mtime_ns granularity is fine, but size changes make the
    # signature change robust even on coarse-mtime filesystems.


def test_pathwatch_detects_change(tmp_path):
    p = tmp_path / "watched.json"
    _touch(p, "{}")
    watch = PathWatch(str(p))
    assert watch.update() is False  # unchanged

    fired = []
    _touch(p, '{"datasets": []}')
    assert watch.update(lambda: fired.append(1)) is True
    assert fired == [1]
    assert watch.update() is False  # settles

    os.unlink(p)
    assert watch.update() is True  # deletion counts as a change
    _touch(p, "{}")
    assert watch.update() is True  # re-creation too


def test_pathwatch_unbound_never_fires():
    assert PathWatch().update() is False


def test_catalog_watch_reloads(tmp_path):
    p = tmp_path / "datasets.json"
    _touch(p, json.dumps({"datasets": [{"name": "a", "filename": "a.nc"}]}))
    watch = CatalogWatch(str(p))
    assert watch.poll() is None  # unchanged since set_path

    doc = {"datasets": [{"name": "a", "filename": "a.nc"},
                        {"name": "b", "filename": "b.nc"}]}
    _touch(p, json.dumps(doc))
    entries = watch.poll()
    assert entries is not None and [e.name for e in entries] == ["a", "b"]
    assert watch.poll() is None

    os.unlink(p)
    assert watch.poll() is None  # deleted file: change, but no entries


def test_app_settings_roundtrip(tmp_path):
    path = str(tmp_path / "settings.json")
    s = AppSettings(path)
    assert s.get("window-vSync", True) is True  # default on empty
    s.set("window-width", 1920)
    s.set("window-vSync", False)
    s.save()

    s2 = AppSettings(path)
    assert s2.get("window-width") == 1920
    assert s2.get("window-vSync") is False
    assert "window-width" in s2
    assert s2.as_dict()["window-vSync"] is False


def test_app_settings_corrupt_file_recovers(tmp_path):
    path = tmp_path / "settings.json"
    _touch(path, "{not json")
    s = AppSettings(str(path))
    assert s.as_dict() == {}
    s.set("k", 1)
    s.save()
    assert json.load(open(path)) == {"k": 1}


def test_app_settings_config_dir_env(tmp_path, monkeypatch):
    monkeypatch.setenv("CORRERENDER_CONFIG_DIR", str(tmp_path / "cfg"))
    s = AppSettings()
    assert s.path.startswith(str(tmp_path / "cfg"))


def test_logfile_writes_html(tmp_path):
    path = str(tmp_path / "Logfile.html")
    log = Logfile(path, mirror_stderr=False)
    log.write_info("hello <world>")
    log.write_warning("careful")
    log.write_error("soft failure")
    with pytest.raises(ValueError, match="fatal"):
        log.throw_error("fatal", ValueError)

    text = open(path).read()
    assert "<html>" in text
    assert "hello &lt;world&gt;" in text  # escaped
    assert text.count("#ff0000") == 2  # soft + fatal errors
    assert "#ffa000" in text


def _make_scene(members=10):
    from correrender_tpu.app.state import Scene
    from correrender_tpu.core.fields import GridMetadata, VolumeData
    from correrender_tpu.utils import fixtures

    data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8, members=members)
    vd = VolumeData(GridMetadata(xs=16, ys=16, zs=8, es=members))
    vd.add_field("data", lambda t, e: data[e])
    return Scene(vd), vd


def test_continuous_recompute_settings_roundtrip(tmp_path):
    from correrender_tpu.app.state import Scene
    from correrender_tpu.calculators.correlation import (
        CorrelationCalculator,
    )

    scene, vd = _make_scene()
    calc = CorrelationCalculator("data", reference_point=(1, 1, 1))
    scene.add_calculator(calc)
    calc.continuous_recompute = True

    path = str(tmp_path / "state.json")
    scene.save_state(path)
    doc = json.load(open(path))
    assert doc["calculators"][0]["continuous_recompute"] is True

    scene2 = Scene.load_state(path, volume_data=vd)
    (calc2,) = [
        c for c in scene2.volume_data.calculators.values()
        if c.type_id == "correlation"
    ]
    assert calc2.continuous_recompute is True


def test_continuous_recompute_forces_frame_recompute():
    from correrender_tpu.app.viewer import ViewerApp
    from correrender_tpu.calculators.correlation import (
        CorrelationCalculator,
    )

    scene, vd = _make_scene()
    calc = CorrelationCalculator("data", reference_point=(1, 1, 1))
    name = scene.add_calculator(calc)
    scene.add_renderer("dvr", field=name)
    app = ViewerApp(scene, image_size=(64, 48), warm_measures=False)

    f1 = app.frame_png()
    assert app.frame_png() is f1  # cached while nothing is dirty

    epoch_before = vd.dirty_epoch(calc.output_name)
    r = app.api({"op": "set_option", "key": "continuous_recompute",
                 "value": True})
    assert r.get("ok", True)
    assert calc.continuous_recompute is True
    app.frame_png()
    app.frame_png()
    # Every frame marked the output dirty (recompute each frame).
    assert vd.dirty_epoch(calc.output_name) >= epoch_before + 2

    app.api({"op": "set_option", "key": "continuous_recompute",
             "value": False})
    g1 = app.frame_png()
    assert app.frame_png() is g1  # cache behavior restored
    app.close()


class TestScreenedSampling:
    """Population-level screened-bayesian harness (VERDICT r4 #5)."""

    def test_rows_and_metrics(self, tmp_path):
        from correrender_tpu.app.sampling_test import (
            run_screened_sampling_tests,
        )

        csvp = str(tmp_path / "screened.csv")
        rows = run_screened_sampling_tests(
            num_pairs=8, block=6, num_samples=24, num_init=8,
            csv_path=csvp, synthetic=True, seed=1)
        names = [r["method"] for r in rows]
        assert names == ["bayesian_full", "bayesian_screened",
                         "plastic_budget"]
        for r in rows:
            assert 0.0 <= r["error_quantile"] <= 1.0
            assert np.isfinite(r["error_linear"])
            assert r["time_us"] > 0
        # plastic_budget got at least the screened pipeline's samples
        assert rows[2]["budget_samples"] >= 24
        import csv as _csv

        with open(csvp) as f:
            assert len(list(_csv.DictReader(f))) == 3
