"""Calculators: derived virtual scalar fields (reference L3 layer).

Each calculator registers an output field with a
:class:`~correrender_tpu.core.fields.VolumeData`; the field is computed
lazily on first access and cached, mirroring the reference's
cache-miss-driven calculator dispatch
(src/Volume/VolumeData.cpp:1202-1314).
"""

from correrender_tpu.calculators.base import (
    Calculator,
    CALCULATOR_TYPE_IDS,
    CALCULATOR_NAMES,
    calculator_from_settings,
    register_calculator_type,
)
from correrender_tpu.calculators.correlation import (
    CorrelationCalculator,
    correlate_field,
)
from correrender_tpu.calculators.ensemble import (
    EnsembleMeanCalculator,
    EnsembleSpreadCalculator,
)
from correrender_tpu.calculators.binop import BinaryOperatorCalculator
from correrender_tpu.calculators.noise import NoiseReductionCalculator
from correrender_tpu.calculators.velocity import (
    VelocityMagnitudeCalculator,
    VorticityCalculator,
    HelicityCalculator,
)
from correrender_tpu.calculators.set_predicate import SetPredicateCalculator
from correrender_tpu.calculators.residual_color import ResidualColorCalculator
from correrender_tpu.calculators.dkl_calculator import DKLCalculator

__all__ = [
    "Calculator",
    "CALCULATOR_TYPE_IDS",
    "CALCULATOR_NAMES",
    "calculator_from_settings",
    "register_calculator_type",
    "CorrelationCalculator",
    "correlate_field",
    "EnsembleMeanCalculator",
    "EnsembleSpreadCalculator",
    "BinaryOperatorCalculator",
    "NoiseReductionCalculator",
    "VelocityMagnitudeCalculator",
    "VorticityCalculator",
    "HelicityCalculator",
    "SetPredicateCalculator",
    "ResidualColorCalculator",
    "DKLCalculator",
]
