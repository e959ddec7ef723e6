"""Replicability mode: scripted reproduction of the TVCG-2024 setup.

Reference: src/Replicability/ReplicabilityState.hpp + --replicability
flag — loads a hardcoded app state reproducing the paper figure on the
``linear_4x4.nc`` synthetic ensemble (correlation calculator + diagram
renderer + DVR views). This module generates the dataset (fixtures),
builds the same scene and renders all artifacts headlessly.
"""

from __future__ import annotations

import os

import numpy as np

from correrender_tpu.core import GridMetadata, VolumeData
from correrender_tpu.utils import fixtures
from correrender_tpu.calculators.correlation import CorrelationCalculator
from correrender_tpu.render.camera import Camera
from correrender_tpu.app.state import Scene


def build_replicability_scene(
    xs: int = 128, ys: int = 128, zs: int = 32, members: int = 100,
    seed: int = 0,
):
    """The linear_4x4 planted-box ensemble with the paper's analysis
    setup: Pearson correlation vs. a box-center reference point, DVR +
    outline views, HEB diagram over the downsampled grid."""
    data = fixtures.synth_box_ensemble(
        xs=xs, ys=ys, zs=zs, members=members, linear=True, seed=seed
    )
    grid = GridMetadata(xs=xs, ys=ys, zs=zs, es=members)
    vd = VolumeData(grid)
    vd.add_field("data", lambda t, e: data[e])
    scene = Scene(vd, views=[
        Camera(position=(0.0, 0.3, 0.8)),
        Camera(position=(0.6, 0.4, 0.4)),
    ])
    g = zs // 2
    calc = CorrelationCalculator(
        field_name="data", measure="pearson",
        reference_point=(g, g, zs // 2),
    )
    corr_name = scene.add_calculator(calc)
    scene.add_renderer("dvr", view=0, field=corr_name)
    scene.add_renderer("domain_outline", view=0)
    scene.add_renderer("dvr", view=1, field=corr_name)
    return scene, data


def run_replicability(output_dir: str, image_size=(800, 600),
                      small: bool = True):
    """Render the replicability artifacts; returns the file list."""
    os.makedirs(output_dir, exist_ok=True)
    kwargs = dict(xs=64, ys=64, zs=16, members=50) if small else {}
    scene, data = build_replicability_scene(**kwargs)
    files = []
    from PIL import Image

    for view in range(len(scene.views)):
        img = np.asarray(scene.render_view(view, image_size=image_size))
        path = os.path.join(output_dir, f"replicability_view{view}.png")
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(path)
        files.append(path)

    # HEB chord diagram over the ensemble.
    from correrender_tpu.diagrams.heb import HEBChart

    stack = np.moveaxis(data, 0, -1)
    chart = HEBChart(stack, downsample_factor=max(stack.shape[0] // 4, 4),
                     max_chords=60)
    chart.compute_correlations()
    svg_path = os.path.join(output_dir, "replicability_heb.svg")
    chart.render_svg(svg_path)
    files.append(svg_path)

    # Export the generated ensemble and reference it from the state
    # file, so `cli state --load` can actually reload it — a
    # {"synthetic": ...} marker satisfied neither of load_state's
    # dataset forms (catalog/filename) and made the advertised
    # schema-compatible artifact unloadable (round-3 review).
    nc_path = os.path.join(output_dir, "replicability_ensemble.nc")
    from correrender_tpu.io import writers

    writers.write_netcdf(nc_path, data[:, None], name="data")
    files.append(nc_path)

    # Scene state file (schema-compatible AND loadable).
    state_path = os.path.join(output_dir, "replicability_state.json")
    scene.save_state(state_path, dataset={"filename": nc_path,
                                          "name": "linear_4x4"})
    files.append(state_path)
    # The same scene in the reference app's own schema — loadable by
    # the reference directly (ReplicabilityState.hpp role, inverted).
    ref_path = os.path.join(output_dir, "replicability_state_ref.json")
    scene.save_state(ref_path, dataset={"filename": nc_path},
                     reference_format=True)
    files.append(ref_path)
    return files
