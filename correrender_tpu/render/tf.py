"""Transfer functions: scalar → premultipliable RGBA.

The reference uses sgl's transfer-function widget (piecewise-linear
color/opacity control points sampled into a lookup texture). Here a
transfer function is a ``(resolution, 4)`` float32 LUT plus a value
domain; lookup is linear interpolation — identical semantics to a GL
1D texture with linear filtering and clamp-to-edge.
"""

from __future__ import annotations

import dataclasses
import itertools

import jax.numpy as jnp
import numpy as np

_TF_UID = itertools.count()

# Small built-in colormaps as control points (positions in [0,1], rgb).
_COLORMAPS = {
    "gray": [(0.0, (0.0, 0.0, 0.0)), (1.0, (1.0, 1.0, 1.0))],
    # Default of the reference's TF widget: blue→white→red diverging.
    "coolwarm": [
        (0.0, (0.231, 0.299, 0.754)),
        (0.5, (0.865, 0.865, 0.865)),
        (1.0, (0.706, 0.016, 0.150)),
    ],
    "viridis": [
        (0.0, (0.267, 0.005, 0.329)),
        (0.25, (0.229, 0.322, 0.546)),
        (0.5, (0.127, 0.566, 0.551)),
        (0.75, (0.369, 0.789, 0.383)),
        (1.0, (0.993, 0.906, 0.144)),
    ],
    "heatmap": [
        (0.0, (0.0, 0.0, 0.0)),
        (0.35, (0.85, 0.0, 0.0)),
        (0.85, (1.0, 1.0, 0.0)),
        (1.0, (1.0, 1.0, 1.0)),
    ],
}


def _sample_control_points(points, resolution):
    xs = np.array([p[0] for p in points], np.float32)
    vals = np.array([p[1] for p in points], np.float32)
    t = np.linspace(0.0, 1.0, resolution, dtype=np.float32)
    out = np.stack(
        [np.interp(t, xs, vals[:, c]) for c in range(vals.shape[1])], axis=-1
    )
    return out


def default_opacity_points(lo: float, hi: float):
    """Measure-derived default opacity curve: sign-spanning domains
    (correlation coefficients) get a zero-opacity notch at the domain
    center so ±extremes pop; one-signed domains get a plain ramp.
    Single source of truth for Scene.tf_for and the viewer panel."""
    return (((0.0, 0.7), (0.5, 0.0), (1.0, 0.7))
            if lo < 0 < hi else ((0.0, 0.0), (1.0, 0.8)))


@dataclasses.dataclass
class TransferFunction:
    """LUT-based transfer function over a scalar domain.

    Attributes:
      lut: ``(resolution, 4)`` RGBA, straight (non-premultiplied) alpha.
      domain: ``(vmin, vmax)`` scalar range mapped onto the LUT.
    """

    lut: jnp.ndarray
    domain: tuple = (0.0, 1.0)
    #: Monotonic instance id — a sound cache-invalidation token (unlike
    #: id(), which CPython may reuse after an object is freed).
    uid: int = dataclasses.field(
        default_factory=lambda: next(_TF_UID), compare=False
    )

    @classmethod
    def from_colormap(
        cls,
        name: str = "coolwarm",
        domain=(0.0, 1.0),
        opacity_points=((0.0, 0.0), (1.0, 1.0)),
        resolution: int = 256,
    ) -> "TransferFunction":
        """Build from a named colormap and piecewise-linear opacity ramp."""
        rgb = _sample_control_points(_COLORMAPS[name], resolution)
        alpha = _sample_control_points(
            [(x, (a,)) for x, a in opacity_points], resolution
        )
        lut = np.concatenate([rgb, alpha], axis=-1).astype(np.float32)
        return cls(lut=jnp.asarray(lut), domain=tuple(domain))

    @classmethod
    def constant_opacity(cls, name="coolwarm", domain=(0.0, 1.0), alpha=0.5,
                         resolution=256):
        return cls.from_colormap(
            name, domain, ((0.0, alpha), (1.0, alpha)), resolution
        )

    @classmethod
    def from_control_points(
        cls,
        color_points,
        opacity_points,
        domain=(0.0, 1.0),
        resolution: int = 256,
    ) -> "TransferFunction":
        """Build from explicit piecewise-linear control points — the
        serialized form of the reference's TF-widget state (sgl stores
        position+color and position+opacity point lists).

        Args:
          color_points: sequence of ``(pos, (r, g, b))`` with pos∈[0,1].
          opacity_points: sequence of ``(pos, alpha)``.
        """
        rgb = _sample_control_points(list(color_points), resolution)
        alpha = _sample_control_points(
            [(x, (a,)) for x, a in opacity_points], resolution
        )
        lut = np.concatenate([rgb, alpha], axis=-1).astype(np.float32)
        return cls(lut=jnp.asarray(lut), domain=tuple(domain))

    def to_dict(self) -> dict:
        """JSON-serializable state (full LUT — lossless round-trip)."""
        return {
            "domain": list(self.domain),
            "lut": np.asarray(self.lut).tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TransferFunction":
        if "lut" in d:
            return cls(
                lut=jnp.asarray(np.asarray(d["lut"], np.float32)),
                domain=tuple(d.get("domain", (0.0, 1.0))),
            )
        return cls.from_control_points(
            [(p[0], tuple(p[1:4])) for p in d["color_points"]],
            [(p[0], p[1]) for p in d["opacity_points"]],
            domain=tuple(d.get("domain", (0.0, 1.0))),
        )

    def __call__(self, scalar: jnp.ndarray) -> jnp.ndarray:
        """Map scalars to RGBA, shape ``scalar.shape + (4,)``.

        NaN scalars map to alpha 0 (the reference's NaN handling mode
        "ignore", DvrRenderer.hpp:69-71).
        """
        vmin, vmax = self.domain
        res = self.lut.shape[0]
        t = (scalar - vmin) / (vmax - vmin)
        t = jnp.clip(t, 0.0, 1.0) * (res - 1)
        i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, res - 2)
        frac = (t - i0.astype(jnp.float32))[..., None]
        rgba = self.lut[i0] * (1.0 - frac) + self.lut[i0 + 1] * frac
        nan_mask = jnp.isnan(scalar)[..., None]
        return jnp.where(nan_mask, jnp.zeros_like(rgba), rgba)
