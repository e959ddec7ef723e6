"""Statistical estimator kernels (the reference's L3k layer).

Every estimator operates on arrays whose *last* axis is the
member/sample axis (ensemble member or time step), broadcasting over
all leading axes. This maps per-voxel loops in the reference
(``src/Calculators/Correlation.cpp``, ``MutualInformation.cpp``) onto
TPU-vectorized batch math.
"""

from correrender_tpu.ops.registry import (
    CorrelationMeasure,
    MEASURE_IDS,
    MEASURE_NAMES,
    is_measure_mi,
    is_measure_binned_mi,
    is_measure_kraskov_mi,
    is_measure_correlation_coefficient_mi,
    measure_from_id,
    correlate,
    correlate_jit,
)
from correrender_tpu.ops.pearson import pearson
from correrender_tpu.ops.ranks import fractional_ranks
from correrender_tpu.ops.spearman import spearman
from correrender_tpu.ops.kendall import kendall
from correrender_tpu.ops.mi_binned import mutual_information_binned
from correrender_tpu.ops.mi_ksg import (
    mutual_information_kraskov,
    maximum_mutual_information_kraskov,
)
from correrender_tpu.ops.dkl import dkl_binned, dkl_knn

__all__ = [
    "CorrelationMeasure",
    "MEASURE_IDS",
    "MEASURE_NAMES",
    "is_measure_mi",
    "is_measure_binned_mi",
    "is_measure_kraskov_mi",
    "is_measure_correlation_coefficient_mi",
    "measure_from_id",
    "correlate",
    "correlate_jit",
    "pearson",
    "fractional_ranks",
    "spearman",
    "kendall",
    "mutual_information_binned",
    "mutual_information_kraskov",
    "maximum_mutual_information_kraskov",
    "dkl_binned",
    "dkl_knn",
]
