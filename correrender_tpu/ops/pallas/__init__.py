"""Pallas TPU kernels for the hot estimator paths.

Pure-JAX formulations of the estimators (ops/*.py) are the reference
semantics; these kernels are drop-in accelerated equivalents for the
cases where XLA's default lowering is memory-bound:

* ``pearson_pallas`` — fused five-moment member reduction (one HBM pass
  over the stack instead of XLA's potential multiple).
* ``mi_ksg_pallas`` — KSG mutual information with the O(n²) pairwise
  Chebyshev distance matrix kept in VMEM per voxel (the XLA path
  round-trips (V, n, n) intermediates through HBM).

Kernels fall back to interpret mode automatically off-TPU so the same
code paths are testable on CPU.
"""

from correrender_tpu.ops.pallas.pearson_kernel import pearson_pallas
from correrender_tpu.ops.pallas.ksg_kernel import mi_ksg_pallas
from correrender_tpu.ops.pallas.ksg_banded import mi_ksg_banded

__all__ = ["pearson_pallas", "mi_ksg_pallas", "mi_ksg_banded"]
