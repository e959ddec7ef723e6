"""Ensemble mean / spread calculators.

Reference: src/Calculators/EnsembleMeanCalculator.* and
EnsembleSpreadCalculator.* (+ their GLSL compute twins) — per-voxel
mean and standard deviation over the ensemble axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from correrender_tpu.calculators.base import Calculator, register_calculator_type


@register_calculator_type("ensemble_mean")
class EnsembleMeanCalculator(Calculator):
    def __init__(self, field_name: str | None = None, output_name=None):
        super().__init__(output_name)
        self.field_name = field_name

    def default_output_name(self):
        return f"Ensemble Mean ({self.field_name})"

    def compute(self, time: int, member: int):
        stack = self.volume_data.get_member_stack(
            self.field_name or self.volume_data.field_names[0], time
        ).astype(jnp.float32)  # bf16-staged storage: reduce in f32
        return jnp.nanmean(stack, axis=-1)

    @classmethod
    def settings_to_kwargs(cls, s):
        # Reference state-file key -> __init__ kwarg.
        return {"field_name": s.get("scalar_field_name")}

    def get_settings(self):
        return {"scalar_field_name": self.field_name}


@register_calculator_type("ensemble_spread")
class EnsembleSpreadCalculator(Calculator):
    """Per-voxel ensemble standard deviation (population, like the
    reference's EnsembleSpreadCalculator.glsl)."""

    def __init__(self, field_name: str | None = None, output_name=None):
        super().__init__(output_name)
        self.field_name = field_name

    def default_output_name(self):
        return f"Ensemble Spread ({self.field_name})"

    def compute(self, time: int, member: int):
        stack = self.volume_data.get_member_stack(
            self.field_name or self.volume_data.field_names[0], time
        ).astype(jnp.float32)  # bf16-staged storage: reduce in f32
        mean = jnp.nanmean(stack, axis=-1, keepdims=True)
        return jnp.sqrt(jnp.nanmean((stack - mean) ** 2, axis=-1))

    @classmethod
    def settings_to_kwargs(cls, s):
        # Reference state-file key -> __init__ kwarg.
        return {"field_name": s.get("scalar_field_name")}

    def get_settings(self):
        return {"scalar_field_name": self.field_name}
