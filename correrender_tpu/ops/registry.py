"""Correlation-measure registry and unified dispatch.

Mirrors the reference's measure enum and string ids
(src/Calculators/CorrelationDefines.hpp:41-75) so state files and the
scene catalog remain compatible:

  pearson, spearman, kendall, mi_binned, mi_kraskov,
  binned_mi_correlation_coefficient, kmi_correlation_coefficient
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp

from correrender_tpu.ops.pearson import pearson
from correrender_tpu.ops.spearman import spearman
from correrender_tpu.ops.kendall import kendall
from correrender_tpu.ops.mi_binned import (
    mutual_information_binned,
    binned_mi_correlation_coefficient,
)
from correrender_tpu.ops.mi_ksg import (
    mutual_information_kraskov,
    kmi_correlation_coefficient,
)


class CorrelationMeasure(enum.Enum):
    PEARSON = "pearson"
    SPEARMAN = "spearman"
    KENDALL = "kendall"
    MUTUAL_INFORMATION_BINNED = "mi_binned"
    MUTUAL_INFORMATION_KRASKOV = "mi_kraskov"
    BINNED_MI_CORRELATION_COEFFICIENT = "binned_mi_correlation_coefficient"
    KMI_CORRELATION_COEFFICIENT = "kmi_correlation_coefficient"


MEASURE_IDS = {m: m.value for m in CorrelationMeasure}
MEASURE_NAMES = {
    CorrelationMeasure.PEARSON: "Pearson",
    CorrelationMeasure.SPEARMAN: "Spearman",
    CorrelationMeasure.KENDALL: "Kendall",
    CorrelationMeasure.MUTUAL_INFORMATION_BINNED: "Mutual Information (Binned)",
    CorrelationMeasure.MUTUAL_INFORMATION_KRASKOV: "Mutual Information (Kraskov)",
    CorrelationMeasure.BINNED_MI_CORRELATION_COEFFICIENT: "Binned MI Correlation Coefficient",
    CorrelationMeasure.KMI_CORRELATION_COEFFICIENT: "KMI Correlation Coefficient",
}


def measure_from_id(measure_id) -> CorrelationMeasure:
    if isinstance(measure_id, CorrelationMeasure):
        return measure_id
    return CorrelationMeasure(str(measure_id))


def is_measure_binned_mi(m: CorrelationMeasure) -> bool:
    return m in (
        CorrelationMeasure.MUTUAL_INFORMATION_BINNED,
        CorrelationMeasure.BINNED_MI_CORRELATION_COEFFICIENT,
    )


def is_measure_kraskov_mi(m: CorrelationMeasure) -> bool:
    return m in (
        CorrelationMeasure.MUTUAL_INFORMATION_KRASKOV,
        CorrelationMeasure.KMI_CORRELATION_COEFFICIENT,
    )


def is_measure_mi(m: CorrelationMeasure) -> bool:
    return is_measure_binned_mi(m) or is_measure_kraskov_mi(m)


def is_measure_correlation_coefficient_mi(m: CorrelationMeasure) -> bool:
    return m in (
        CorrelationMeasure.BINNED_MI_CORRELATION_COEFFICIENT,
        CorrelationMeasure.KMI_CORRELATION_COEFFICIENT,
    )


def correlate(
    x: jnp.ndarray,
    y: jnp.ndarray,
    measure: CorrelationMeasure | str = CorrelationMeasure.PEARSON,
    *,
    num_bins: int = 80,
    k: int = 3,
    kraskov_estimator: int = 1,
    mi_bounds=None,
    dtype=None,
    absolute: bool = False,
) -> jnp.ndarray:
    """Unified correlation dispatch along the last axis.

    Args:
      x, y: ``(..., n)`` member series (leading axes broadcast).
      measure: a :class:`CorrelationMeasure` or its string id.
      num_bins: bins for the binned-MI measures.
      k: neighbour count for the Kraskov measures.
      kraskov_estimator: 1 or 2.
      mi_bounds: optional ``(min, max)`` global bounds used to normalize
        inputs to [0,1] for the binned-MI measures (the reference
        normalizes by the global field min/max,
        CorrelationCalculator.cpp:820-845). If None, per-series bounds
        are used.
      dtype: accumulator dtype.
      absolute: return |value| (the calculator's "absolute value" mode).
    """
    m = measure_from_id(measure)
    # Kendall receives dtype=None verbatim: its auto rule switches to
    # exact int32 pair counts past n ≈ 4000 (the similarity path's
    # 46340-sample cap relies on this); an explicit float32 default
    # here would silently round counts near n² and defeat it. The
    # moment-based measures default to float32 accumulation.
    acc = jnp.float32 if dtype is None else dtype
    if m == CorrelationMeasure.PEARSON:
        out = pearson(x, y, dtype=acc)
    elif m == CorrelationMeasure.SPEARMAN:
        out = spearman(x, y, dtype=acc)
    elif m == CorrelationMeasure.KENDALL:
        out = kendall(x, y, dtype=dtype)
    elif is_measure_binned_mi(m):
        if mi_bounds is not None:
            (xmin, xmax), (ymin, ymax) = _split_bounds(mi_bounds)
            xn = (x - xmin) / (xmax - xmin)
            yn = (y - ymin) / (ymax - ymin)
        else:
            xn = _normalize01(x)
            yn = _normalize01(y)
        out = mutual_information_binned(xn, yn, num_bins=num_bins, dtype=acc)
        if m == CorrelationMeasure.BINNED_MI_CORRELATION_COEFFICIENT:
            out = binned_mi_correlation_coefficient(out)
    elif is_measure_kraskov_mi(m):
        out = mutual_information_kraskov(x, y, k=k, estimator=kraskov_estimator)
        if m == CorrelationMeasure.KMI_CORRELATION_COEFFICIENT:
            out = kmi_correlation_coefficient(out)
    else:  # pragma: no cover
        raise ValueError(f"unknown measure {measure!r}")
    if absolute:
        out = jnp.abs(out)
    return out


def hashable_kwargs(kw: dict):
    """Normalize correlate kwargs into a hashable, sorted item tuple.

    The compiled-program caches (here, ``correlate_requests``, the
    diagram samplers) key on kwargs. 0-d device/numpy scalars — e.g.
    data-derived ``mi_bounds`` like the ones ``correlate_field``
    builds — are converted to Python floats so they can key a cache
    (and become baked constants of the program, which is what a bound
    IS). Returns ``None`` when a value cannot be made hashable
    (non-scalar arrays, tracers): callers then take an eager path or
    raise, uniformly.
    """

    def conv(v):
        if isinstance(v, (list, tuple)):
            return tuple(conv(x) for x in v)
        if isinstance(v, jnp.ndarray) or type(v).__module__.startswith(
            "numpy"
        ):
            if getattr(v, "ndim", 1) == 0:
                return v.item()
            raise TypeError("non-scalar array kwarg")
        return v

    try:
        items = tuple(sorted((k, conv(v)) for k, v in kw.items()))
        hash(items)
        return items
    except TypeError:  # incl. TracerArrayConversionError
        return None


@functools.lru_cache(maxsize=128)
def _correlate_program(measure: CorrelationMeasure, kw_items: tuple):
    kw = dict(kw_items)
    return jax.jit(lambda x, y: correlate(x, y, measure, **kw))


def correlate_jit(x, y, measure=CorrelationMeasure.PEARSON, **kw):
    """:func:`correlate` as ONE cached jitted program.

    Eager :func:`correlate` issues one device dispatch per jnp op —
    fine inside an outer jit, but a real cost on its own over the
    tunneled chip (the round-3 HEB profile measured ~0.3 s/chunk of
    pure dispatch overhead). Programs are cached per
    (measure, kwargs); kwargs that cannot key the cache (non-scalar
    array ``mi_bounds``) fall back to the eager path.
    """
    m = measure_from_id(measure)
    key = hashable_kwargs(kw)
    if key is None:
        return correlate(x, y, m, **kw)
    return _correlate_program(m, key)(x, y)


def _normalize01(v):
    vmin = jnp.min(v, axis=-1, keepdims=True)
    vmax = jnp.max(v, axis=-1, keepdims=True)
    return (v - vmin) / jnp.maximum(vmax - vmin, 1e-30)


def _split_bounds(mi_bounds):
    # (min, max) vs ((min,max), (min,max)) — structural check only
    # (jnp.ndim on a tuple of tracers would force materialization).
    if isinstance(mi_bounds[0], (tuple, list)):
        return mi_bounds
    return (mi_bounds, mi_bounds)
