"""Diagram/analysis subsystem (reference L5: src/Renderers/Diagram/).

Octree region hierarchies, HEB chord diagrams with correlation
sampling (incl. Bayesian optimization), correlation matrices, scatter
plots, t-SNE + DBSCAN distribution-similarity embeddings, and
time-series correlation heatmaps. Vector output is SVG (the reference
uses NanoVG/Skia/VKVG canvases — host-side drawing is not a TPU
concern, so a dependency-free SVG writer replaces them).
"""

from correrender_tpu.diagrams.octree import Octree, GridRegion
from correrender_tpu.diagrams.heb import HEBChart
from correrender_tpu.diagrams.sampling import (
    SAMPLING_METHODS,
    sample_block_pair_max,
)
from correrender_tpu.diagrams.matrix import correlation_matrix
from correrender_tpu.diagrams.tsne import tsne
from correrender_tpu.diagrams.dbscan import dbscan
from correrender_tpu.diagrams.colormaps import (
    COLOR_MAP_NAMES,
    colormap_lut,
    get_color_points,
)
from correrender_tpu.diagrams.radar import RadarBarChart

__all__ = [
    "Octree",
    "GridRegion",
    "HEBChart",
    "SAMPLING_METHODS",
    "sample_block_pair_max",
    "correlation_matrix",
    "tsne",
    "dbscan",
    "COLOR_MAP_NAMES",
    "colormap_lut",
    "get_color_points",
    "RadarBarChart",
]
