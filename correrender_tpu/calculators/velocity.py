"""Velocity-derived scalar fields: magnitude, vorticity, helicity.

Reference: src/Calculators/VelocityCalculator.{hpp,cpp} — derives from
u/v/w wind components. Auto-registered by loaders when u/v/w exist
(VolumeData.cpp:715-747). Spatial derivatives use central differences
over the grid spacing.
"""

from __future__ import annotations

import jax.numpy as jnp

from correrender_tpu.calculators.base import Calculator, register_calculator_type


def _central_diff(f: jnp.ndarray, axis: int, spacing: float) -> jnp.ndarray:
    """Central difference with one-sided stencils at the boundaries."""
    upper = jnp.roll(f, -1, axis)
    lower = jnp.roll(f, 1, axis)
    interior = (upper - lower) / (2.0 * spacing)
    # One-sided at the two boundary slices.
    n = f.shape[axis]
    idx = jnp.arange(n)
    shape = [1, 1, 1]
    shape[axis] = n
    idx = idx.reshape(shape)
    fwd = (upper - f) / spacing
    bwd = (f - lower) / spacing
    out = jnp.where(idx == 0, fwd, interior)
    out = jnp.where(idx == n - 1, bwd, out)
    return out


def curl(u, v, w, dx=1.0, dy=1.0, dz=1.0):
    """Vorticity vector of a (Z, Y, X) staggered-free velocity field."""
    # Axes: 0=z, 1=y, 2=x.
    dw_dy = _central_diff(w, 1, dy)
    dv_dz = _central_diff(v, 0, dz)
    du_dz = _central_diff(u, 0, dz)
    dw_dx = _central_diff(w, 2, dx)
    dv_dx = _central_diff(v, 2, dx)
    du_dy = _central_diff(u, 1, dy)
    return (dw_dy - dv_dz, du_dz - dw_dx, dv_dx - du_dy)


class _VelocityBase(Calculator):
    def __init__(self, u="u", v="v", w="w", output_name=None):
        super().__init__(output_name)
        self.u, self.v, self.w = u, v, w

    def get_settings(self) -> dict:
        return {"u_field": self.u, "v_field": self.v, "w_field": self.w}

    @classmethod
    def settings_to_kwargs(cls, s: dict) -> dict:
        return {
            "u": s.get("u_field", "u"),
            "v": s.get("v_field", "v"),
            "w": s.get("w_field", "w"),
        }

    def _uvw(self, time, member):
        vd = self.volume_data
        return (
            vd.get_field(self.u, time, member),
            vd.get_field(self.v, time, member),
            vd.get_field(self.w, time, member),
        )

    def _spacing(self):
        g = self.volume_data.grid
        return g.dx, g.dy, g.dz


@register_calculator_type("velocity")
class VelocityCalculator(_VelocityBase):
    """Stacks u/v/w into a (Z, Y, X, 3) vector field."""

    from correrender_tpu.core.fields import FieldType as _FT

    output_type = _FT.VECTOR

    def default_output_name(self):
        return "Velocity"

    def compute(self, time, member):
        u, v, w = self._uvw(time, member)
        return jnp.stack([u, v, w], axis=-1)


@register_calculator_type("vector_magnitude")
class VelocityMagnitudeCalculator(_VelocityBase):
    def default_output_name(self):
        return "Vector Magnitude"

    def compute(self, time, member):
        u, v, w = self._uvw(time, member)
        return jnp.sqrt(u * u + v * v + w * w)


@register_calculator_type("vorticity")
class VorticityCalculator(_VelocityBase):
    def default_output_name(self):
        return "Vorticity"

    def compute(self, time, member):
        u, v, w = self._uvw(time, member)
        dx, dy, dz = self._spacing()
        cx, cy, cz = curl(u, v, w, dx, dy, dz)
        return jnp.sqrt(cx * cx + cy * cy + cz * cz)


@register_calculator_type("helicity")
class HelicityCalculator(_VelocityBase):
    def default_output_name(self):
        return "Helicity"

    def compute(self, time, member):
        u, v, w = self._uvw(time, member)
        dx, dy, dz = self._spacing()
        cx, cy, cz = curl(u, v, w, dx, dy, dz)
        return u * cx + v * cy + w * cz
