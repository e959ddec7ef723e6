"""Named diagram colormaps (DiagramColorMap.hpp parity) and their
wiring into transfer functions, HEB charts, and state interchange."""

import numpy as np
import pytest

from correrender_tpu.diagrams import colormaps as cm
from correrender_tpu.render.tf import TransferFunction


def test_full_name_set():
    # 38 display names, matching DIAGRAM_COLOR_MAP_NAMES
    # (DiagramColorMap.hpp:46-54).
    assert len(cm.COLOR_MAP_NAMES) == 38
    assert cm.COLOR_MAP_NAMES[0] == "Viridis"
    assert "Cool to Warm" in cm.COLOR_MAP_NAMES
    assert "Black-Neon Orange" in cm.COLOR_MAP_NAMES
    for name in cm.COLOR_MAP_NAMES:
        assert cm.is_known(name), name


@pytest.mark.parametrize("name", cm.COLOR_MAP_NAMES)
def test_every_map_builds_a_lut(name):
    pts = cm.get_color_points(name)
    assert len(pts) >= 2
    lut = cm.colormap_lut(name, 64)
    assert lut.shape == (64, 3)
    assert lut.dtype == np.float32
    assert float(lut.min()) >= 0.0 and float(lut.max()) <= 1.0 + 1e-6


def test_name_lookup_is_case_and_underscore_insensitive():
    a = cm.get_color_points("Cool to Warm")
    b = cm.get_color_points("cool_to_warm")
    c = cm.get_color_points("COOL TO WARM")
    assert a == b == c
    assert cm.display_name("rdylbu") == "RdYlBu"
    assert cm.display_name("black-neon green") == "Black-Neon Green"
    # Unknown names pass through display_name but fail get_color_points.
    assert cm.display_name("nope") == "nope"
    with pytest.raises(KeyError):
        cm.get_color_points("nope")


def test_family_semantics():
    # Solid neon maps are constant.
    pts = cm.get_color_points("Neon Blue")
    assert pts[0] == pts[-1]
    # Black ramps start dark and end at the base color.
    pts = cm.get_color_points("Black-Yellow")
    assert sum(pts[0]) < sum(pts[-1])
    np.testing.assert_allclose(pts[-1], (1.0, 1.0, 100 / 255), atol=1e-6)
    np.testing.assert_allclose(
        pts[0], (0.3, 0.3, 0.3 * 100 / 255), atol=1e-6)
    # Diverging maps are light in the middle.
    pts = cm.get_color_points("RdBu")
    assert sum(pts[2]) > sum(pts[0]) and sum(pts[2]) > sum(pts[-1])


def test_transfer_function_accepts_reference_names():
    tf = TransferFunction.from_colormap("Cividis", domain=(-1.0, 1.0))
    lut = np.asarray(tf.lut)
    assert lut.shape == (256, 4)
    # Cividis starts dark blue, ends yellow.
    assert lut[0, 2] > lut[0, 0]
    assert lut[-1, 0] > lut[-1, 2]
    # Legacy built-ins still resolve through the old table.
    tf2 = TransferFunction.from_colormap("coolwarm")
    assert np.asarray(tf2.lut).shape == (256, 4)


def test_heb_chart_colormap_knobs():
    from correrender_tpu.diagrams.heb import HEBChart

    rng = np.random.default_rng(0)
    stack = rng.normal(size=(8, 8, 8, 6)).astype(np.float32)
    chart = HEBChart(stack, downsample_factor=4, num_samples=4,
                     color_map="Black-Neon Green",
                     color_map_variance="Cividis")
    chart.compute_correlations()
    svg = chart.render_svg(size=240)
    assert svg.startswith("<?xml") or "<svg" in svg
    assert chart.color_map == "Black-Neon Green"


def test_state_ref_roundtrip_color_maps():
    from correrender_tpu.app.state_ref import (
        _convert_diagram,
        _renderer_node_to_reference,
    )

    s = {"color_map_0": "Spectral", "color_map_variance": "Cividis",
         "color_map_1": "Viridis"}
    out = {}
    _convert_diagram(s, out, [])
    assert out["color_map"] == "Spectral"
    assert out["color_map_variance"] == "Cividis"
    # Secondary field maps are preserved for round-trip.
    assert out["_ref_extra"]["color_map_1"] == "Viridis"

    node = {"type": "diagram", "color_map": "spectral",
            "color_map_variance": "cividis",
            "_ref_extra": out["_ref_extra"]}
    ref = _renderer_node_to_reference(node, {}, 1)
    assert ref["state"]["color_map_0"] == "Spectral"
    assert ref["state"]["color_map_variance"] == "Cividis"
    assert ref["state"]["color_map_1"] == "Viridis"


def test_timeseries_color_map_import_export():
    from correrender_tpu.app.state_ref import (
        _convert_renderer,
        _renderer_node_to_reference,
    )

    nodes = _convert_renderer(
        "time_series_correlation",
        {"color_map": "Heatmap", "sliding_window_length": "8"},
        [], [])
    assert nodes[0]["color_map"] == "Heatmap"
    assert nodes[0]["window"] == 8  # numeric coercion on import
    ref = _renderer_node_to_reference(
        {"type": "time_series_correlation", "color_map": "heatmap"},
        {}, 1)
    assert ref["state"]["color_map"] == "Heatmap"


def test_heb_matrix_mode_uses_chart_color_map():
    from correrender_tpu.diagrams.heb import HEBChart

    rng = np.random.default_rng(2)
    stack = rng.normal(size=(8, 8, 8, 5)).astype(np.float32)
    chart = HEBChart(stack, downsample_factor=4, num_samples=4,
                     color_map="Gray")
    svg = chart.render_matrix_svg(size=200)
    assert "<svg" in svg


def test_heb_curve_opacity_and_ring_size():
    """curve_opacity (constant mode) and outer_ring_size_pct are
    honored (DiagramRenderer.hpp:143-148)."""
    from correrender_tpu.diagrams.heb import HEBChart

    rng = np.random.default_rng(3)
    stack = rng.normal(size=(8, 8, 8, 5)).astype(np.float32)
    chart = HEBChart(stack, downsample_factor=4, num_samples=4)
    chart.compute_correlations()
    svg = chart.render_svg(size=240, opacity_by_value=False,
                           curve_opacity=0.123)
    assert 'stroke-opacity="0.123"' in svg
    thin = chart.render_svg(size=240, outer_ring_size_pct=0.01)
    thick = chart.render_svg(size=240, outer_ring_size_pct=0.2)
    assert thin != thick
