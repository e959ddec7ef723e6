"""Image-quality metrics: MSE / PSNR / SSIM / LPIPS.

Reference: scripts/similarity.py:47-66 — used to compare ground-truth
and approximation renders for the papers. LPIPS uses the published
pretrained metric when the 'lpips' package is present, and otherwise a
deterministic random-feature variant (LPIPS-R) — see :func:`lpips`.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def mse(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2))


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / m))


def _gaussian_window(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-0.5 * (x / sigma) ** 2)
    return g / g.sum()


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Structural similarity (Wang et al. 2004), Gaussian-windowed,
    channel-averaged for RGB(A) input."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.ndim == 3:
        return float(
            np.mean([ssim(a[..., c], b[..., c], data_range)
                     for c in range(a.shape[-1])])
        )
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = _gaussian_window()

    def filt(img):
        from scipy.ndimage import convolve1d

        out = convolve1d(img, win, axis=0, mode="reflect")
        return convolve1d(out, win, axis=1, mode="reflect")

    mu_a = filt(a)
    mu_b = filt(b)
    var_a = filt(a * a) - mu_a**2
    var_b = filt(b * b) - mu_b**2
    cov = filt(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return float(np.mean(num / den))


def lpips(a, b, net: str = "alex"):
    """LPIPS perceptual distance (scripts/similarity.py:47-62 role).

    Resolution order:

    1. The in-tree JAX AlexNet-LPIPS forward (utils/lpips_alex.py —
       architecture-exact, validated against a torch reference) with
       the official weights, when a converted weight file is found
       (``CORRERENDER_LPIPS_WEIGHTS`` / ``~/.cache/correrender_tpu/``).
    2. The 'lpips' package, if installed.
    3. :func:`lpips_random` — EXPLICIT fallback: a fixed-seed
       random-feature variant whose *absolute scale is not comparable*
       to published LPIPS values (ordering-only). Callers needing
       paper-comparable numbers must provide weights.
    """
    if net == "alex":
        from correrender_tpu.utils.lpips_alex import (
            load_lpips_weights,
            lpips_alex,
        )

        weights = load_lpips_weights()
        if weights is not None:
            return lpips_alex(a, b, weights)
    try:  # pragma: no cover - package absent in this image
        import lpips as lpips_pkg
        import torch

        model = lpips_pkg.LPIPS(net=net)
        ta = torch.from_numpy(
            np.moveaxis(np.asarray(a, np.float32), -1, 0)[None] * 2 - 1
        )
        tb = torch.from_numpy(
            np.moveaxis(np.asarray(b, np.float32), -1, 0)[None] * 2 - 1
        )
        return float(model(ta, tb).item())
    except ImportError:
        return lpips_random(a, b)


_LPIPS_CHANNELS = (16, 32, 64, 128, 128)


def _lpips_random_params():
    import jax

    keys = jax.random.split(jax.random.key(0), len(_LPIPS_CHANNELS))
    params = []
    cin = 3
    for key, cout in zip(keys, _LPIPS_CHANNELS):
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.float32)
        w = w * (2.0 / np.sqrt(9 * cin))
        params.append(w)
        cin = cout
    return params


def lpips_random(a, b) -> float:
    """Deterministic random-feature perceptual distance (LPIPS-R).

    A fixed-seed 5-stage stride-2 conv stack extracts multi-scale
    features; per-stage unit-normalized feature differences are
    averaged — the LPIPS formula with random (untrained) filters.
    """
    import jax
    import jax.lax as lax

    def prep(img):
        arr = jnp.asarray(np.asarray(img, np.float32))
        if arr.ndim == 2:
            arr = arr[..., None]
        arr = arr[..., :3]
        if arr.shape[-1] == 1:
            arr = jnp.repeat(arr, 3, axis=-1)
        return arr[None] * 2.0 - 1.0  # NHWC in [-1, 1]

    xa, xb = prep(a), prep(b)
    params = _lpips_random_params()
    dn = lax.conv_dimension_numbers(
        xa.shape, params[0].shape, ("NHWC", "HWIO", "NHWC")
    )
    total = 0.0
    for w in params:
        xa = jax.nn.relu(lax.conv_general_dilated(
            xa, w, (2, 2), "SAME", dimension_numbers=dn))
        xb = jax.nn.relu(lax.conv_general_dilated(
            xb, w, (2, 2), "SAME", dimension_numbers=dn))
        dn = lax.conv_dimension_numbers(
            xa.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        na = xa / jnp.maximum(
            jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-8)
        nb = xb / jnp.maximum(
            jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-8)
        total += float(jnp.mean(jnp.sum((na - nb) ** 2, axis=-1)))
    return total / len(_LPIPS_CHANNELS)


def compare_images(a, b, data_range: float = 1.0) -> dict:
    """All available metrics at once (similarity.py output analogue)."""
    return {
        "mse": mse(a, b),
        "psnr": psnr(a, b, data_range),
        "ssim": ssim(a, b, data_range),
        "lpips": lpips(a, b),
    }
