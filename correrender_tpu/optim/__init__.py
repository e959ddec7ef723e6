"""Inverse optimization (reference L7: src/Optimization/).

Transfer-function optimization: fit a TF for field B so that rendering
B reproduces the appearance of field A under its TF. Three method
families mirror the reference (OptDefines.hpp:32-40):

* OLS — linear least squares on voxel TF-bin weights, with direct and
  iterative (CGLS/LSQR) solvers and non-negativity (src/Optimization/OLS/);
* GD — Adam/SGD on the voxel loss (src/Optimization/GD/);
* DiffDVR — gradients *through the renderer* via jax.grad, replacing
  the reference's hand-written adjoint passes
  (src/Optimization/DiffDVR/, Data/Shaders/TF/DvrAdjoint.glsl).
"""

from correrender_tpu.optim.tf_opt import (
    TFOptimizationWorker,
    TFOptimizer,
    optimize_tf_ols,
    optimize_tf_gd,
    optimize_tf_diffdvr,
)
from correrender_tpu.optim.solvers import cgls, lsqr, solve_nonneg

__all__ = [
    "TFOptimizationWorker",
    "TFOptimizer",
    "optimize_tf_ols",
    "optimize_tf_gd",
    "optimize_tf_diffdvr",
    "cgls",
    "lsqr",
    "solve_nonneg",
]
