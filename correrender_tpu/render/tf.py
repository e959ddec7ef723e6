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
    #: Source control points when built from them (kept so state files
    #: can be exported in the reference's XML control-point form
    #: losslessly; ``None`` for LUT-only transfer functions).
    color_points: list | None = dataclasses.field(
        default=None, compare=False
    )
    opacity_points: list | None = dataclasses.field(
        default=None, compare=False
    )

    @classmethod
    def from_colormap(
        cls,
        name: str = "coolwarm",
        domain=(0.0, 1.0),
        opacity_points=((0.0, 0.0), (1.0, 1.0)),
        resolution: int = 256,
    ) -> "TransferFunction":
        """Build from a named colormap and piecewise-linear opacity ramp.

        ``name`` is one of the four built-ins above or any of the
        reference's 38 named diagram colormaps
        (``diagrams.colormaps.COLOR_MAP_NAMES``,
        DiagramColorMap.hpp:46-54) — e.g. ``"Cividis"``,
        ``"Cool to Warm"``, ``"Black-Neon Green"`` (case-insensitive).
        """
        if name in _COLORMAPS:
            points = _COLORMAPS[name]
        else:
            from correrender_tpu.diagrams import colormaps as _dcm
            pts = _dcm.get_color_points(name)  # KeyError if unknown
            xs = np.linspace(0.0, 1.0, len(pts))
            points = [(float(x), tuple(p)) for x, p in zip(xs, pts)]
        rgb = _sample_control_points(points, resolution)
        alpha = _sample_control_points(
            [(x, (a,)) for x, a in opacity_points], resolution
        )
        lut = np.concatenate([rgb, alpha], axis=-1).astype(np.float32)
        tf = cls(lut=jnp.asarray(lut), domain=tuple(domain))
        tf.color_points = [(float(x), tuple(float(v) for v in c))
                           for x, c in points]
        tf.opacity_points = [(float(x), float(a))
                             for x, a in opacity_points]
        return tf

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
        interpolate_linear_rgb: bool = False,
    ) -> "TransferFunction":
        """Build from explicit piecewise-linear control points — the
        serialized form of the reference's TF-widget state (sgl stores
        position+color and position+opacity point lists).

        Args:
          color_points: sequence of ``(pos, (r, g, b))`` with pos∈[0,1],
            sRGB-encoded components.
          opacity_points: sequence of ``(pos, alpha)``.
          interpolate_linear_rgb: interpolate colors in linear RGB
            (the reference TF widget's default
            ``interpolation_colorspace="Linear RGB"``) instead of
            directly in sRGB. The LUT stays sRGB-encoded either way.
        """
        color_points = list(color_points)
        opacity_points = list(opacity_points)
        if interpolate_linear_rgb:
            lin_pts = [(x, tuple(_srgb_to_linear(np.asarray(c, np.float32))))
                       for x, c in color_points]
            rgb = _linear_to_srgb(_sample_control_points(
                lin_pts, resolution))
        else:
            rgb = _sample_control_points(color_points, resolution)
        alpha = _sample_control_points(
            [(x, (a,)) for x, a in opacity_points], resolution
        )
        lut = np.concatenate([rgb, alpha], axis=-1).astype(np.float32)
        tf = cls(lut=jnp.asarray(lut), domain=tuple(domain))
        tf.color_points = [(float(x), tuple(float(v) for v in c))
                           for x, c in color_points]
        tf.opacity_points = [(float(x), float(a))
                             for x, a in opacity_points]
        return tf

    def to_dict(self) -> dict:
        """JSON-serializable state (full LUT — lossless round-trip;
        control points ride along when known so reference-format
        export can write the original widget points)."""
        out = {
            "domain": list(self.domain),
            "lut": np.asarray(self.lut).tolist(),
        }
        if self.color_points is not None:
            out["color_points"] = [[p, *rgb]
                                   for p, rgb in self.color_points]
        if self.opacity_points is not None:
            out["opacity_points"] = [[p, a]
                                     for p, a in self.opacity_points]
        return out

    @classmethod
    def from_dict(cls, d: dict) -> "TransferFunction":
        if "lut" in d:
            tf = cls(
                lut=jnp.asarray(np.asarray(d["lut"], np.float32)),
                domain=tuple(d.get("domain", (0.0, 1.0))),
            )
            # Keep control points riding alongside a LUT (imported
            # reference TFs store both) so reference-format re-export
            # stays lossless instead of resampling the LUT.
            if "color_points" in d and "opacity_points" in d:
                tf.color_points = [
                    (float(p[0]), tuple(float(v) for v in p[1:4]))
                    for p in d["color_points"]
                ]
                tf.opacity_points = [(float(p[0]), float(p[1]))
                                     for p in d["opacity_points"]]
            return tf
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


# -- sgl TF-widget XML interchange ---------------------------------------
#
# The reference persists per-field transfer functions as sgl's XML
# control-point serialization inside app-state JSON files
# (MainAppState.cpp:171 serializeXmlString / :379 deserializeXmlString;
# the format is visible verbatim in ReplicabilityState.hpp:187):
#
#   <TransferFunction colorspace="sRGB"
#                     interpolation_colorspace="Linear RGB">
#       <OpacityPoints><OpacityPoint position="0" opacity="1"/>...
#       <ColorPoints color_data="ushort">
#           <ColorPoint position="0" r="15163" g="19532" b="49344"/>...
#   </TransferFunction>
#
# Color components are sRGB-encoded, scaled by the color_data type
# (ushort 0..65535, ubyte 0..255, float 0..1); interpolation between
# points happens in the declared interpolation colorspace.


def _srgb_to_linear(c):
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.04045, c / 12.92,
                    ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


def _linear_to_srgb(c):
    c = np.asarray(c, np.float32)
    return np.where(c <= 0.0031308, c * 12.92,
                    1.055 * np.maximum(c, 0.0) ** (1.0 / 2.4)
                    - 0.055).astype(np.float32)


_COLOR_DATA_SCALE = {"ushort": 65535.0, "ubyte": 255.0, "float": 1.0}


def tf_from_xml_string(
    xml_str: str, domain=(0.0, 1.0), resolution: int = 256
) -> TransferFunction:
    """Parse an sgl TF-widget XML string into a :class:`TransferFunction`.

    Honors the ``color_data`` scaling attribute and the
    ``interpolation_colorspace`` attribute ("Linear RGB" interpolates
    the decoded sRGB control colors in linear space, exactly like the
    reference widget; "sRGB" interpolates the stored values directly).
    """
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_str.replace("\x00", "").strip())
    if root.tag != "TransferFunction":
        raise ValueError(f"not a TransferFunction XML (root {root.tag!r})")
    interp = root.get("interpolation_colorspace", "Linear RGB")

    opacity_points = []
    for node in root.iter("OpacityPoint"):
        opacity_points.append(
            (float(node.get("position")), float(node.get("opacity")))
        )
    color_points = []
    scale = 65535.0
    colors_node = root.find("ColorPoints")
    if colors_node is not None:
        data_kind = colors_node.get("color_data", "ushort")
        if data_kind not in _COLOR_DATA_SCALE:
            raise ValueError(f"unsupported color_data {data_kind!r}")
        scale = _COLOR_DATA_SCALE[data_kind]
    for node in root.iter("ColorPoint"):
        color_points.append((
            float(node.get("position")),
            (float(node.get("r")) / scale,
             float(node.get("g")) / scale,
             float(node.get("b")) / scale),
        ))
    if not opacity_points:
        opacity_points = [(0.0, 0.0), (1.0, 1.0)]
    if not color_points:
        color_points = _COLORMAPS["coolwarm"]
    return TransferFunction.from_control_points(
        sorted(color_points),
        sorted(opacity_points),
        domain=tuple(domain),
        resolution=resolution,
        interpolate_linear_rgb=(interp == "Linear RGB"),
    )


def _fmt(x: float) -> str:
    """Float → shortest exact decimal (jsoncpp-style round-trip)."""
    return repr(float(x))


def tf_to_xml_string(tf: TransferFunction, num_points: int = 17) -> str:
    """Serialize a :class:`TransferFunction` as sgl TF-widget XML.

    Uses the TF's stored control points when present (lossless); a
    LUT-only TF is sampled at ``num_points`` uniform positions.
    Colors are written ushort-scaled like the reference widget, with
    ``interpolation_colorspace`` matching how the points should be
    re-interpolated on load.
    """
    lut = np.asarray(tf.lut, np.float32)
    if tf.color_points is not None and tf.opacity_points is not None:
        color_points = tf.color_points
        opacity_points = tf.opacity_points
    else:
        pos = np.linspace(0.0, 1.0, num_points)
        idx = np.clip((pos * (lut.shape[0] - 1)).round().astype(int),
                      0, lut.shape[0] - 1)
        color_points = [(float(p), tuple(float(v) for v in lut[i, :3]))
                        for p, i in zip(pos, idx)]
        opacity_points = [(float(p), float(lut[i, 3]))
                          for p, i in zip(pos, idx)]

    lines = ['<TransferFunction colorspace="sRGB" '
             'interpolation_colorspace="Linear RGB">']
    lines.append("    <OpacityPoints>")
    for p, a in opacity_points:
        lines.append(
            f'        <OpacityPoint position="{_fmt(p)}" '
            f'opacity="{_fmt(a)}"/>'
        )
    lines.append("    </OpacityPoints>")
    lines.append('    <ColorPoints color_data="ushort">')
    for p, rgb in color_points:
        r, g, b = (int(round(min(max(float(v), 0.0), 1.0) * 65535))
                   for v in rgb)
        lines.append(
            f'        <ColorPoint position="{_fmt(p)}" '
            f'r="{r}" g="{g}" b="{b}"/>'
        )
    lines.append("    </ColorPoints>")
    lines.append("</TransferFunction>")
    return "\n".join(lines) + "\n"
