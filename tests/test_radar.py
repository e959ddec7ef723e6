"""RadarBarChart (reference RadarBarChart.cpp parity)."""

import math

import numpy as np
import pytest

from correrender_tpu.diagrams.radar import RadarBarChart


def test_time_independent_chart():
    chart = RadarBarChart()
    chart.set_data_time_independent(
        ["u", "v", "w", "T"], [0.2, 0.8, 0.5, 1.0])
    svg = chart.render_svg(size=300)
    assert "<svg" in svg
    # One slice per nonzero variable plus labels.
    assert svg.count("<title>") == 4
    for name in ("u", "v", "w", "T"):
        assert f">{name}</text>" in svg


def test_zero_and_nan_values_are_skipped():
    chart = RadarBarChart()
    chart.set_data_time_independent(
        ["a", "b", "c"], [0.0, float("nan"), 1.0])
    svg = chart.render_svg(size=300)
    assert svg.count("<title>") == 1


def test_time_dependent_bands_and_equal_area():
    values = np.linspace(0.0, 1.0, 12).reshape(4, 3)  # 4 timesteps
    chart = RadarBarChart(equal_area=True)
    chart.set_data_time_dependent(["a", "b", "c"], values)
    svg = chart.render_svg(size=300)
    # One band per (variable, timestep).
    assert svg.count("<title>") == 12

    # Equal-area radii: every band covers the same annular area.
    R, hole, T = 1.0, 0.25, 4
    r = hole
    areas = []
    for _ in range(T):
        r_out = math.sqrt((R * R - hole * hole) / T + r * r)
        areas.append(r_out * r_out - r * r)
        r = r_out
    assert max(areas) - min(areas) < 1e-9
    assert abs(r - R) < 1e-9  # last band reaches the chart radius


def test_equal_steps_mode():
    chart = RadarBarChart(equal_area=False)
    chart.set_data_time_dependent(["x"], [[0.1], [0.9]])
    svg = chart.render_svg(size=200)
    assert svg.count("<title>") == 2


def test_shape_validation():
    chart = RadarBarChart()
    with pytest.raises(ValueError):
        chart.set_data_time_independent(["a", "b"], [1.0])
    with pytest.raises(ValueError):
        chart.render_svg()


def test_single_variable_draws_full_ring():
    """One variable spans 2π — must render as an annulus (an SVG arc
    with identical endpoints draws nothing; reference special-cases
    numVariables == 1 as a circle, RadarBarChart.cpp:130-132)."""
    chart = RadarBarChart()
    chart.set_data_time_independent(["only"], [0.8])
    svg = chart.render_svg(size=200)
    assert 'fill-rule="evenodd"' in svg
    assert svg.count("<title>") == 1


def test_time_dependent_ring_gap():
    """Time-step color mode leaves a pi/32 gap at each ring end
    (RadarBarChart.cpp:300-307) — an open ring, not a closed one."""
    chart = RadarBarChart()
    chart.set_data_time_dependent(["x"], [[0.1], [0.9]])
    gap = math.pi / 32.0
    assert chart._angle(0.0) == pytest.approx(-0.5 * math.pi + gap)
    assert chart._angle(1.0) == pytest.approx(
        -0.5 * math.pi + 2.0 * math.pi - gap)
    # ...while time-independent mode still spans the full circle.
    chart2 = RadarBarChart()
    chart2.set_data_time_independent(["x"], [0.5])
    assert chart2._angle(1.0) - chart2._angle(0.0) == pytest.approx(
        2.0 * math.pi)


def test_cli_time_dependent_radar_normalizes_per_variable(tmp_path):
    """`cli diagram --kind radar` on a time-dependent dataset must
    normalize each variable by its own range (ADVICE r3): fields with
    heterogeneous units may not collapse to the colormap extremes."""
    import re

    from scipy.io import netcdf_file

    from correrender_tpu.app import cli

    ts, zs, ys, xs = 3, 4, 6, 6
    rng = np.random.default_rng(1)
    path = str(tmp_path / "td.nc")
    f = netcdf_file(path, "w")
    f.createDimension("time", ts); f.createDimension("lev", zs)
    f.createDimension("lat", ys); f.createDimension("lon", xs)
    for name, base, scale in (("pressure", 1e5, 500.0),
                              ("temperature", 300.0, 10.0)):
        v = f.createVariable(name, "f", ("time", "lev", "lat", "lon"))
        v[:] = (base + scale * rng.standard_normal(
            (ts, zs, ys, xs))).astype(np.float32)
    f.close()
    out = str(tmp_path / "radar.svg")
    cli.main(["diagram", "--dataset", path, "--kind", "radar",
              "--output", out])
    svg = open(out).read()
    vals = [float(m) for m in re.findall(
        r"<title>\w+ t=\d+: ([-\d.e]+)</title>", svg)]
    assert len(vals) == ts * 2
    # Normalized per variable: every band value is in [0, 1] and the
    # pressure bands are not pinned to one extreme.
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert max(vals[:ts]) - min(vals[:ts]) > 0.01
