"""Render restriction: spherical focus region set by calculators.

Correlation calculators can restrict rendering to a ball around their
reference point (reference: ``ICorrelationCalculator::
setRenderRestrictionData`` src/Calculators/CorrelationCalculator.cpp:
364-375, consumed per sample by Data/Shaders/Renderers/DVR/
RenderRestriction.glsl under Euclidean or Chebyshev distance,
src/Volume/DistanceMetrics.hpp:32-37).

TPU-native formulation: instead of a per-sample uniform-buffer test in
the marcher's inner loop, the restriction is a voxel mask multiplied
into the classified volume (premultiplied RGBA → masked voxels are
perfectly transparent) or into the raw field for isosurfaces. The
restriction center follows the reference's mapping of the reference
point index into the render AABB (index / (dims − 1) over the box).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

#: src/Volume/DistanceMetrics.hpp:35-37 (state-file `distance_metric`).
DISTANCE_METRIC_NAMES = ("Euclidean", "Chebyshev")


def restriction_center(reference_point, shape_zyx, box):
    """World position of a reference-point index in the render box.

    Mirrors CorrelationCalculator.cpp:366-370: normalized position =
    index / (dims − 1), mapped over the AABB. Note this CORNER
    convention sits up to half a voxel from the voxel CENTER that
    :func:`restriction_mask` tests — deliberately: the reference maps
    the restriction center the same way while its shaders sample at
    texel centers, so matching its fields means keeping both
    conventions as-is.
    """
    x, y, z = reference_point
    zs, ys, xs = shape_zyx
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)
    norm = np.array(
        [
            x / max(xs - 1, 1),
            y / max(ys - 1, 1),
            z / max(zs - 1, 1),
        ],
        np.float32,
    )
    return norm * (box_max - box_min) + box_min


def restriction_mask(
    shape_zyx,
    box,
    center,
    radius: float,
    metric: str = "Euclidean",
) -> jnp.ndarray:
    """``(Z, Y, X)`` float32 mask: 1 inside the ball, 0 outside.

    Voxel centers are tested (the shear-warp renderers sample at voxel
    centers; the reference tests ray-sample positions — agreement is at
    voxel granularity).
    """
    zs, ys, xs = shape_zyx
    box_min = np.asarray(box[0], np.float32)
    box_max = np.asarray(box[1], np.float32)
    ext = box_max - box_min

    def centers(n, lo, e):
        return lo + (np.arange(n, dtype=np.float32) + 0.5) / n * e

    cz = centers(zs, box_min[2], ext[2])
    cy = centers(ys, box_min[1], ext[1])
    cx = centers(xs, box_min[0], ext[0])
    dz = jnp.abs(jnp.asarray(cz) - float(center[2]))[:, None, None]
    dy = jnp.abs(jnp.asarray(cy) - float(center[1]))[None, :, None]
    dx = jnp.abs(jnp.asarray(cx) - float(center[0]))[None, None, :]
    if metric.lower() == "chebyshev":
        dist = jnp.maximum(jnp.maximum(dx, dy), dz)
    else:
        dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return (dist <= radius).astype(jnp.float32)


def apply_restriction_rgba(classified, mask):
    """Zero out classified (premultiplied) RGBA outside the mask."""
    return classified * mask[..., None]
