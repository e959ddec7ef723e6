"""Correlation-matrix heat map between field pairs.

Reference: src/Renderers/Diagram/CorrelationMatrix/* with
Full/Symmetric storage (src/Calculators/CorrelationMatrix.hpp:35-75).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.diagrams.svg import SvgCanvas
from correrender_tpu.render.tf import TransferFunction


def correlation_matrix(
    series: np.ndarray,
    measure: str = "pearson",
    symmetric: bool = True,
    **measure_kw,
) -> np.ndarray:
    """All-pairs correlation of (F, n) series → (F, F) matrix.

    One batched estimator call replaces the reference's per-cell loop.
    """
    s = jnp.asarray(series)
    mat = np.asarray(
        ops.correlate_jit(s[:, None, :], s[None, :, :], measure,
                          **measure_kw)
    )
    if symmetric:
        mat = 0.5 * (mat + mat.T)
    return mat


def field_correlation_matrix(volume_data, field_names=None, time=0,
                             measure="pearson", sample_voxels=1024,
                             seed=0, **kw):
    """Whole-field pairwise correlation matrix: flatten each field's
    (voxel, member) values over a common voxel subsample."""
    names = field_names or volume_data.field_names
    rng = np.random.default_rng(seed)
    g = volume_data.grid
    idx = rng.choice(g.num_voxels, min(sample_voxels, g.num_voxels),
                     replace=False)
    series = []
    for name in names:
        stack = np.asarray(volume_data.get_member_stack(name, time))
        flat = stack.reshape(-1, stack.shape[-1])[idx]  # (S, n)
        series.append(flat.reshape(-1))  # voxels×members as one series
    return correlation_matrix(np.stack(series), measure, **kw), names


def render_matrix_svg(matrix: np.ndarray, labels=None, path=None,
                      size: int = 600, colormap="coolwarm") -> str:
    """Heat-map SVG of a correlation matrix."""
    f = len(matrix)
    tf = TransferFunction.from_colormap(colormap, domain=(-1.0, 1.0))
    lut = np.asarray(tf.lut)
    margin = 80
    cell = (size - margin) / f
    canvas = SvgCanvas(size, size)
    for i in range(f):
        for j in range(f):
            v = matrix[i, j]
            if not np.isfinite(v):
                color = (0.5, 0.5, 0.5)
            else:
                t = np.clip((v + 1) / 2, 0, 1)
                color = tuple(lut[int(t * 255)][:3])
            canvas.rect(
                margin + j * cell, margin + i * cell, cell - 1, cell - 1,
                fill=color,
            )
    if labels:
        for i, label in enumerate(labels):
            canvas.text(margin + (i + 0.5) * cell, margin - 8, label,
                        size=10, rotate=-45)
            canvas.text(margin - 8, margin + (i + 0.5) * cell, label,
                        size=10, anchor="end")
    if path:
        canvas.save(path)
    return canvas.to_svg()
