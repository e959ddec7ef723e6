"""Noise reduction: separable 3D Gaussian blur.

Reference: src/Calculators/NoiseReductionCalculator.* +
Data/Shaders/Calculators/GaussianBlur3D.glsl — σ-configurable Gaussian
smoothing of a scalar field. Implemented as three 1D convolutions
(XLA lowers these to efficient TPU convolutions).
"""

from __future__ import annotations

import math

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from correrender_tpu.calculators.base import Calculator, register_calculator_type


def gaussian_kernel_1d(sigma: float) -> np.ndarray:
    if sigma <= 0.0:
        # σ → 0 limit is the identity; the naive formula produces
        # 0/0 = NaN at the center tap and an all-NaN blurred volume
        # (a state file may carry standard_deviation: 0).
        return np.ones(1, np.float32)
    radius = max(int(math.ceil(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _conv_last(padded: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid cross-correlation along the last axis (symmetric kernel)."""
    shape = padded.shape
    lhs = padded.reshape(-1, 1, shape[-1])  # (N, C=1, W)
    rhs = kernel.reshape(1, 1, -1)  # (O=1, I=1, W)
    res = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return res.reshape(shape[:-1] + (res.shape[-1],))


def gaussian_blur_3d(vol: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of a (Z, Y, X) volume, edge-clamped."""
    kernel = jnp.asarray(gaussian_kernel_1d(sigma))
    r = kernel.shape[0] // 2
    out = vol
    for axis in range(3):
        moved = jnp.moveaxis(out, axis, -1)
        padded = jnp.pad(
            moved, [(0, 0)] * (moved.ndim - 1) + [(r, r)], mode="edge"
        )
        blurred = _conv_last(padded, kernel)
        out = jnp.moveaxis(blurred, -1, axis)
    return out


@register_calculator_type("noise_reduction")
class NoiseReductionCalculator(Calculator):
    def __init__(self, field_name: str | None = None, sigma: float = 1.0,
                 output_name=None):
        super().__init__(output_name)
        self.field_name = field_name
        self.sigma = float(sigma)

    def default_output_name(self):
        return f"Noise Reduction ({self.field_name})"

    def compute(self, time: int, member: int):
        vol = self.volume_data.get_field(
            self.field_name or self.volume_data.field_names[0], time, member
        )
        return gaussian_blur_3d(vol, self.sigma)

    @classmethod
    def settings_to_kwargs(cls, s):
        kwargs = {}
        if "scalar_field_name" in s:
            kwargs["field_name"] = s["scalar_field_name"]
        if "standard_deviation" in s:
            kwargs["sigma"] = float(s["standard_deviation"])
        return kwargs

    def get_settings(self):
        return {
            "scalar_field_name": self.field_name,
            "standard_deviation": self.sigma,
        }
