"""Set-predicate calculator: per-voxel member-set predicates.

Reference: src/Calculators/SetPredicateCalculator.* +
Data/Shaders/Calculators/SetPredicateCalculator.glsl — evaluates a
comparison predicate per member and aggregates {count, fraction, any,
all} over the ensemble axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from correrender_tpu.calculators.base import Calculator, register_calculator_type

COMPARISONS = {
    "greater": lambda v, a, b: v > a,
    "greater_equal": lambda v, a, b: v >= a,
    "less": lambda v, a, b: v < a,
    "less_equal": lambda v, a, b: v <= a,
    "between": lambda v, a, b: (v >= a) & (v <= b),
}

AGGREGATIONS = {
    "count": lambda m: jnp.sum(m, axis=-1).astype(jnp.float32),
    "fraction": lambda m: jnp.mean(m, axis=-1).astype(jnp.float32),
    "any": lambda m: jnp.any(m, axis=-1).astype(jnp.float32),
    "all": lambda m: jnp.all(m, axis=-1).astype(jnp.float32),
}


@register_calculator_type("set_predicate")
class SetPredicateCalculator(Calculator):
    def __init__(
        self,
        field_name: str | None = None,
        comparison: str = "greater",
        aggregation: str = "fraction",
        threshold: float = 0.0,
        threshold_upper: float = 1.0,
        output_name=None,
    ):
        super().__init__(output_name)
        if comparison not in COMPARISONS:
            raise ValueError(f"unknown comparison {comparison!r}")
        if aggregation not in AGGREGATIONS:
            raise ValueError(f"unknown aggregation {aggregation!r}")
        self.field_name = field_name
        self.comparison = comparison
        self.aggregation = aggregation
        self.threshold = float(threshold)
        self.threshold_upper = float(threshold_upper)

    def default_output_name(self):
        return f"Set Predicate ({self.field_name})"

    def compute(self, time, member):
        stack = self.volume_data.get_member_stack(
            self.field_name or self.volume_data.field_names[0], time
        ).astype(jnp.float32)  # bf16-staged storage: reduce in f32
        mask = COMPARISONS[self.comparison](
            stack, self.threshold, self.threshold_upper
        )
        return AGGREGATIONS[self.aggregation](mask)

    @classmethod
    def settings_to_kwargs(cls, s):
        # Reference state-file key -> __init__ kwarg.
        out = {"field_name": s.get("scalar_field_name")}
        for k in ("comparison", "aggregation", "threshold",
                  "threshold_upper"):
            if k in s:
                out[k] = s[k]
        return out

    def get_settings(self):
        return {
            "scalar_field_name": self.field_name,
            "comparison": self.comparison,
            "aggregation": self.aggregation,
            "threshold": self.threshold,
            "threshold_upper": self.threshold_upper,
        }
