"""Time-series correlation heatmap (works without volume data).

Reference: src/Renderers/Diagram/TimeSeriesCorrelation/* — loads a
(samples × time [× window]) series set and renders the pairwise (or
time-lag) correlation heatmap; its own NetCDF loader
(TimeSeriesLoader.cpp:112-197) and optional neural estimator (covered
by models/ here).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.render.tf import TransferFunction



def _pick_series_variable(candidates: dict, variable, path: str) -> str:
    """Resolve the series variable with actionable errors — a raw
    KeyError/StopIteration defeated this loader's documented purpose
    (round-3 review finding)."""
    if variable is not None:
        if variable not in candidates:
            raise ValueError(
                f"variable {variable!r} in {path} is not a >=2-D "
                f"series variable; available: {sorted(candidates)}"
            )
        return variable
    if not candidates:
        raise ValueError(
            f"{path} has no >=2-D variable — the time-series diagram "
            "needs a (samples, time) series variable"
        )
    return next(iter(candidates))

def load_time_series(path: str, variable: str | None = None) -> np.ndarray:
    """Load a (samples, time) series matrix from NetCDF3/4.

    Singleton axes are squeezed (a (S, 1, T) layout is common); a
    variable that is not 2-D after squeezing is a volume, not a time
    series, and raises with an explanation instead of crashing the
    heatmap downstream (reference analogue: the TimeSeriesCorrelation
    renderer loads dedicated (samples, time) NetCDF files,
    src/Renderers/Diagram/TimeSeriesCorrelationRenderer.cpp)."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic[:3] == b"CDF":
        import scipy.io

        nc = scipy.io.netcdf_file(path, "r", mmap=False)
        try:
            candidates = {
                k: v for k, v in nc.variables.items()
                if v.data.ndim >= 2
            }
            name = _pick_series_variable(candidates, variable, path)
            arr = np.asarray(candidates[name].data, np.float32)
        finally:
            nc.close()
    else:
        import h5py

        with h5py.File(path, "r") as f:
            candidates = {
                k: v for k, v in f.items()
                if getattr(v, "ndim", 0) >= 2
            }
            name = _pick_series_variable(candidates, variable, path)
            arr = np.asarray(f[name][...], np.float32)
    # Squeeze only when MORE than 2 axes remain: a legitimate (1, T)
    # single-sample series keeps its sample axis (a plain np.squeeze
    # turned it 1-D and rejected a valid file — round-3 self-review).
    if arr.ndim > 2:
        arr = np.squeeze(arr)
    if arr.ndim == 1:
        arr = arr[None, :]  # fully-singleton leading axes: one series
    if arr.ndim != 2:
        raise ValueError(
            f"variable {name!r} in {path} has shape {arr.shape} after "
            "squeezing — the time-series diagram needs a (samples, "
            "time) 2-D series variable, not a volume; use "
            "'diagram --kind matrix' for volume ensembles"
        )
    return arr


def time_series_correlation_neural(
    series: np.ndarray,
    steps: int = 300,
    hidden: int = 32,
    seed: int = 0,
) -> np.ndarray:
    """Pairwise MI heatmap from per-pair MINE statistic networks.

    The reference's neural estimator mode
    (TimeSeriesCorrelationRenderer.cu, SSDBM 2024): one tiny network
    per heatmap cell estimates the Donsker–Varadhan MI bound between
    the two series; all P = S(S+1)/2 nets train simultaneously via a
    vmapped Adam loop (models/mine.py::train_mine_batched).
    """
    from correrender_tpu.models.mine import (
        MineEstimator,
        train_mine_batched,
    )
    import jax.numpy as jnp

    s = np.asarray(series, np.float32)
    # Normalize each series (MINE statistic nets are scale-sensitive).
    s = (s - s.mean(axis=1, keepdims=True)) / (
        s.std(axis=1, keepdims=True) + 1e-8
    )
    n = s.shape[0]
    iu, ju = np.triu_indices(n, k=0)
    est = MineEstimator.create(hidden=hidden, num_layers=3)
    mi = np.asarray(train_mine_batched(
        est, jnp.asarray(s[iu]), jnp.asarray(s[ju]),
        steps=steps, seed=seed,
    ))
    out = np.zeros((n, n), np.float32)
    out[iu, ju] = mi
    out[ju, iu] = mi
    return out


def time_series_correlation(
    series: np.ndarray,
    measure: str = "pearson",
    window: int | None = None,
    estimator: str = "classical",
    **measure_kw,
) -> np.ndarray:
    """Pairwise correlation of (S, T) series → (S, S) heatmap.

    ``estimator="mine"`` switches to the neural MI estimator
    (:func:`time_series_correlation_neural`; pairwise mode only).

    With ``window``, computes the time-lag correlation map instead:
    out[i, lag] = corr(series[i, :T-window], shifted window at lag).
    """
    if estimator == "mine":
        if window is not None:
            raise ValueError(
                "the neural estimator supports the pairwise mode only"
            )
        return time_series_correlation_neural(series, **measure_kw)
    s = np.asarray(series, np.float32)
    if window is None:
        x = jnp.asarray(s)
        return np.asarray(
            ops.correlate_jit(
                x[:, None, :], x[None, :, :], measure, **measure_kw
            )
        )
    num_lags = s.shape[1] - window + 1
    base = jnp.asarray(s[:, :window])
    lags = jnp.stack(
        [jnp.asarray(s[:, k : k + window]) for k in range(num_lags)], axis=1
    )  # (S, L, window)
    return np.asarray(
        ops.correlate_jit(base[:, None, :], lags, measure, **measure_kw)
    )


def render_heatmap_svg(matrix: np.ndarray, path=None, size: int = 600,
                       colormap: str = "coolwarm", domain=(-1.0, 1.0)) -> str:
    from correrender_tpu.diagrams.svg import SvgCanvas

    tf = TransferFunction.from_colormap(colormap, domain=(0, 1))
    lut = np.asarray(tf.lut)
    rows, cols = matrix.shape
    cell_w = size / cols
    cell_h = size / rows
    canvas = SvgCanvas(size, size)
    lo, hi = domain
    for i in range(rows):
        for j in range(cols):
            v = matrix[i, j]
            if not np.isfinite(v):
                color = (0.5, 0.5, 0.5)
            else:
                t = float(np.clip((v - lo) / (hi - lo), 0, 1))
                color = tuple(lut[int(t * 255)][:3])
            canvas.rect(j * cell_w, i * cell_h, cell_w + 0.5, cell_h + 0.5,
                        fill=color)
    if path:
        canvas.save(path)
    return canvas.to_svg()
