"""Calculator base class and type registry.

Type ids mirror the reference's ``CALCULATOR_TYPE_IDS``
(src/Calculators/Calculator.hpp:58-77) so JSON state files stay
compatible. The neural paths (torch / tiny-cuda-nn / quick-mlp / vmlp)
all collapse onto the single JAX "correlation_vmlp"-equivalent neural
calculator (models/), with the legacy ids aliased to it.
"""

from __future__ import annotations

from typing import Callable, Dict

from correrender_tpu.core.fields import FieldType

#: Reference Calculator.hpp:66-71 (state-file compatibility).
CALCULATOR_TYPE_IDS = [
    "velocity",
    "vector_magnitude",
    "vorticity",
    "helicity",
    "binary_operator",
    "noise_reduction",
    "ensemble_mean",
    "ensemble_spread",
    "set_predicate",
    "residual_color",
    "correlation",
    "correlation_torch",
    "correlation_tiny_cuda_nn",
    "correlation_quick_mlp",
    "correlation_vmlp",
    "dkl_calculator",
]

CALCULATOR_NAMES = {
    "velocity": "Velocity Calculator",
    "vector_magnitude": "Vector Magnitude Calculator",
    "vorticity": "Vorticity Calculator",
    "helicity": "Helicity Calculator",
    "binary_operator": "Binary Operator",
    "noise_reduction": "Noise Reduction",
    "ensemble_mean": "Ensemble Mean",
    "ensemble_spread": "Ensemble Spread",
    "set_predicate": "Set Predicate",
    "residual_color": "Residual Color Calculator",
    "correlation": "Correlation Calculator",
    "correlation_torch": "PyTorch Similarity Calculator",
    "correlation_tiny_cuda_nn": "tiny-cuda-nn Similarity Calculator",
    "correlation_quick_mlp": "QuickMLP Similarity Calculator",
    "correlation_vmlp": "VMLP Similarity Calculator",
    "dkl_calculator": "KL-Divergence Calculator",
}

_TYPE_REGISTRY: Dict[str, Callable] = {}


def register_calculator_type(type_id: str):
    """Class decorator registering a calculator under a type id."""

    def wrap(cls):
        _TYPE_REGISTRY[type_id] = cls
        cls.type_id = type_id
        return cls

    return wrap


#: Legacy neural type ids that alias onto the unified JAX calculator
#: (see calculator_from_settings).
_NEURAL_ALIASES = ("correlation_torch", "correlation_tiny_cuda_nn",
                   "correlation_quick_mlp", "correlation_vmlp")


def known_calculator_types() -> frozenset:
    """Every type id :func:`calculator_from_settings` accepts."""
    return frozenset(_TYPE_REGISTRY) | frozenset(_NEURAL_ALIASES)


def calculator_from_settings(type_id: str, settings: dict):
    """Instantiate a calculator from a state-file settings map.

    Mirrors the factory dispatch in ``MainAppState.cpp:163-197``.
    """
    # Neural legacy ids all map to the unified JAX neural calculator.
    if type_id in (
        "correlation_torch",
        "correlation_tiny_cuda_nn",
        "correlation_quick_mlp",
        "correlation_vmlp",
    ):
        type_id = "correlation_vmlp"
    cls = _TYPE_REGISTRY.get(type_id)
    if cls is None:
        raise KeyError(
            f"unknown calculator type {type_id!r}; known: "
            f"{sorted(_TYPE_REGISTRY)}"
        )
    settings = dict(settings)
    continuous = bool(settings.pop("continuous_recompute", False))
    calc = cls.from_settings(settings)
    calc.continuous_recompute = continuous
    return calc


class Calculator:
    """Base for derived-field calculators.

    Subclasses set :attr:`output_name` / :attr:`output_type` and
    implement :meth:`compute(time, member) -> (Z, Y, X)` using fields
    pulled from the bound :class:`VolumeData`. There is no
    CPU/VULKAN/CUDA device split (reference ``FilterDevice``) — every
    calculator is one jittable function and XLA targets the device.
    """

    type_id = "invalid"
    output_type = FieldType.SCALAR

    def __init__(self, output_name: str | None = None):
        self._output_name = output_name
        self.volume_data = None
        # Debug option: recompute the output every frame even when
        # nothing is dirty (reference CorrelationCalculator.hpp:123,
        # "Continuous Recompute" checkbox at .cpp:700, consumed in the
        # frame update at .cpp:185). The viewer's frame path honors it
        # by marking the output dirty before each frame.
        self.continuous_recompute = False

    @property
    def output_name(self) -> str:
        return self._output_name or self.default_output_name()

    def default_output_name(self) -> str:
        return CALCULATOR_NAMES.get(self.type_id, self.type_id)

    def bind(self, volume_data):
        self.volume_data = volume_data

    def compute(self, time: int, member: int):
        raise NotImplementedError

    def input_fields(self):
        """Field names this calculator reads — VolumeData.mark_dirty
        propagates input-field dirtiness to the outputs (the reference
        covers this via Calculator::onFieldRemoved/setDirty hooks).

        The default introspects the conventional attribute names; a
        ``None`` entry means "the dataset's first field" (resolved by
        the caller). Returning ``None`` (no conventional attributes)
        is CONSERVATIVE: the output is invalidated on every field
        change.
        """
        names = []
        found = False
        for attr in ("field_name", "field_name_ref", "field_name_a",
                     "field_name_b", "u", "v", "w"):
            if hasattr(self, attr):
                found = True
                names.append(getattr(self, attr))
        return names if found else None

    # -- settings (SettingsMap analogue, InternalState.hpp:44-126) -------

    @classmethod
    def from_settings(cls, settings: dict):
        obj = cls(**cls.settings_to_kwargs(settings))
        return obj

    @classmethod
    def settings_to_kwargs(cls, settings: dict) -> dict:
        return dict(settings)

    def get_settings(self) -> dict:
        return {}
