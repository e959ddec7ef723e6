"""Color-legend overlay for rendered views.

Reference parity: the reference shows a color legend per scalar field
in each view (sgl's color-legend widget, enabled from the renderer
GUIs; SURVEY.md §5.5 "color legends"). Headlessly the legend is
rasterized straight into the view image: a vertical transfer-function
gradient bar with min/mid/max tick labels in a small built-in bitmap
font (no text backend needed).
"""

from __future__ import annotations

import numpy as np

# 5x7 bitmap glyphs for numeric labels (rows top→bottom, 5-bit masks).
_GLYPHS = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    "+": (0x00, 0x04, 0x04, 0x1F, 0x04, 0x04, 0x00),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    "e": (0x00, 0x00, 0x0E, 0x11, 0x1F, 0x10, 0x0E),
    " ": (0x00,) * 7,
}


def _draw_text(img: np.ndarray, x: int, y: int, text: str,
               color=(1.0, 1.0, 1.0)):
    """Blit 5x7 glyphs at (x, y) top-left; clips at image bounds."""
    h, w = img.shape[:2]
    for ch in text:
        glyph = _GLYPHS.get(ch)
        if glyph is None:
            glyph = _GLYPHS[" "]
        for r, rowmask in enumerate(glyph):
            yy = y + r
            if not 0 <= yy < h:
                continue
            for c in range(5):
                if rowmask & (1 << (4 - c)):
                    xx = x + c
                    if 0 <= xx < w:
                        img[yy, xx, :3] = color
                        img[yy, xx, 3] = 1.0
        x += 6
    return img


def _fmt(v: float) -> str:
    """Compact numeric label using only the built-in glyphs."""
    if v == 0:
        return "0"
    a = abs(v)
    if a >= 1e4 or a < 1e-2:
        s = f"{v:.1e}"
        # normalize '1.0e-03' → '1.0e-3'
        mant, exp = s.split("e")
        return f"{mant}e{int(exp)}"
    if a >= 100:
        return f"{v:.0f}"
    return f"{v:.2f}".rstrip("0").rstrip(".")


def color_legend_overlay(
    image: np.ndarray,
    transfer_function,
    position: str = "right",
    bar_width: int = 12,
    margin: int = 8,
) -> np.ndarray:
    """Rasterize ``transfer_function``'s color legend into ``image``.

    A vertical gradient bar (domain max at the top) over a
    semi-transparent backdrop with min/mid/max tick labels. Returns a
    new (H, W, 4) float32 array; the input is not modified.
    """
    img = np.array(image, np.float32, copy=True)
    h, w = img.shape[:2]
    lut = np.asarray(transfer_function.lut)
    lo, hi = (float(v) for v in transfer_function.domain)

    bar_h = max(int(h * 0.5), 24)
    y0 = (h - bar_h) // 2
    labels = [(_fmt(hi), y0), (_fmt((lo + hi) / 2), y0 + bar_h // 2),
              (_fmt(lo), y0 + bar_h - 7)]
    label_w = 6 * max(len(t) for t, _ in labels) + 2
    total_w = bar_width + 4 + label_w
    if position == "right":
        x0 = w - margin - total_w
    else:
        x0 = margin

    # Backdrop (semi-transparent dark panel) for readability.
    bx0 = max(x0 - 3, 0)
    bx1 = min(x0 + total_w + 3, w)
    by0 = max(y0 - 5, 0)
    by1 = min(y0 + bar_h + 5, h)
    panel = img[by0:by1, bx0:bx1]
    panel[..., :3] *= 0.35
    panel[..., 3] = np.maximum(panel[..., 3], 0.65)

    # Gradient bar: row 0 = domain max (reference legends grow upward).
    t = 1.0 - (np.arange(bar_h) + 0.5) / bar_h
    idx = np.clip((t * (len(lut) - 1)).astype(int), 0, len(lut) - 1)
    img[y0:y0 + bar_h, x0:x0 + bar_width, :3] = lut[idx, :3][:, None, :]
    img[y0:y0 + bar_h, x0:x0 + bar_width, 3] = 1.0
    # 1px frame
    img[y0, x0:x0 + bar_width, :3] = 1.0
    img[y0 + bar_h - 1, x0:x0 + bar_width, :3] = 1.0
    img[y0:y0 + bar_h, x0, :3] = 1.0
    img[y0:y0 + bar_h, x0 + bar_width - 1, :3] = 1.0

    for text, yy in labels:
        _draw_text(img, x0 + bar_width + 4, yy, text)
    return img
