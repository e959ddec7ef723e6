"""Symmetrizers: order-invariant combination of two encoder outputs.

Reference: src/Calculators/SymmetrizerType.hpp:33-35 {Add, AddDiff,
Mul} + src/Calculators/VMLP/Symmetrizer.{hpp,cpp} — correlation is a
symmetric function of (reference, query), so the decoder input must be
invariant to swapping them.
"""

from __future__ import annotations

import jax.numpy as jnp


def _add(ea, eb):
    return ea + eb


def _add_diff(ea, eb):
    return jnp.concatenate([ea + eb, jnp.abs(ea - eb)], axis=-1)


def _mul(ea, eb):
    return ea * eb


SYMMETRIZERS = {"add": _add, "add_diff": _add_diff, "mul": _mul}


def symmetrize(ea: jnp.ndarray, eb: jnp.ndarray, kind: str = "add"):
    return SYMMETRIZERS[kind](ea, eb)


def symmetrizer_output_features(in_features: int, kind: str) -> int:
    return in_features * (2 if kind == "add_diff" else 1)
