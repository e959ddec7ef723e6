"""LPIPS (AlexNet variant) — exact architecture in JAX.

The perceptual metric used by the reference's evaluation scripts
(reference scripts/similarity.py:47-62: ``lpips.LPIPS(net='alex')``).
This module implements the full forward pass natively — AlexNet
feature stack, input normalization, per-layer unit-normalization,
linear calibration heads, spatial averaging — so the *published*
weights produce the *published* numbers.

Weights: this box has zero egress and no cached torchvision/lpips
checkpoints, so none can be shipped in-tree. The loader accepts the
official files wherever they exist (torchvision ``alexnet*.pth`` +
lpips ``alex.pth`` heads, read torch-free via io/torchscript.py, or a
converted ``.npz``), found via ``CORRERENDER_LPIPS_WEIGHTS`` or
``~/.cache/correrender_tpu/lpips_alex.npz``. The forward itself is
validated against a torch reference implementation on random weights
to 1e-4 (tests/test_lpips.py) — the published checkpoints are a
drop-in.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
from jax import lax

# torchvision AlexNet feature stack: (out, kernel, stride, padding),
# with 3x3/2 max-pools after stages 0 and 1. Taps after each ReLU.
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# LPIPS input scaling layer constants (lpips/lpips.py ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b.reshape(1, -1, 1, 1)


def _maxpool(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def alexnet_features(x, params):
    """Five ReLU-tap feature maps of the AlexNet ``features`` stack.

    Args:
      x: (N, 3, H, W) in [-1, 1] LPIPS convention.
      params: dict with ``conv{i}.weight/bias`` (OIHW / (O,)).
    """
    x = (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / jnp.asarray(
        _SCALE
    ).reshape(1, 3, 1, 1)
    taps = []
    for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
        x = _conv(x, params[f"conv{i}.weight"], params[f"conv{i}.bias"],
                  stride, pad)
        x = jnp.maximum(x, 0.0)
        taps.append(x)
        if i < 2:
            x = _maxpool(x)
    return taps


def lpips_alex(a, b, params) -> float:
    """LPIPS distance between two images with AlexNet features.

    Args:
      a, b: (H, W, 3) float arrays in [0, 1] (RGBA alpha is dropped).
      params: weight dict from :func:`load_lpips_weights`.
    """
    def prep(img):
        arr = jnp.asarray(np.asarray(img, np.float32))
        if arr.ndim == 2:
            arr = jnp.stack([arr] * 3, axis=-1)
        arr = arr[..., :3]
        return jnp.moveaxis(arr, -1, 0)[None] * 2.0 - 1.0

    fa = alexnet_features(prep(a), params)
    fb = alexnet_features(prep(b), params)
    total = jnp.float32(0.0)
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / jnp.sqrt(
            jnp.sum(xa * xa, axis=1, keepdims=True) + 1e-10
        )
        nb = xb / jnp.sqrt(
            jnp.sum(xb * xb, axis=1, keepdims=True) + 1e-10
        )
        d = (na - nb) ** 2
        lin = params[f"lin{i}.weight"]  # (1, C, 1, 1)
        total = total + jnp.mean(
            jnp.sum(d * lin.reshape(1, -1, 1, 1), axis=1)
        )
    return float(total)


def _from_torch_dicts(alex_weights: dict, lin_weights: dict) -> dict:
    """Map torchvision-alexnet + lpips-linear state dicts onto ours."""
    # torchvision features indices of the conv layers
    conv_idx = (0, 3, 6, 8, 10)
    params = {}
    for i, idx in enumerate(conv_idx):
        for kind in ("weight", "bias"):
            for key in (f"features.{idx}.{kind}", f"{idx}.{kind}",
                        f"net.slice{i + 1}.{idx}.{kind}"):
                if key in alex_weights:
                    params[f"conv{i}.{kind}"] = np.asarray(
                        alex_weights[key], np.float32
                    )
                    break
        if f"conv{i}.weight" not in params:
            raise ValueError(f"alexnet weights: conv layer {idx} missing")
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                    f"lin{i}.weight"):
            if key in lin_weights:
                params[f"lin{i}.weight"] = np.asarray(
                    lin_weights[key], np.float32
                )
                break
        if f"lin{i}.weight" not in params:
            raise ValueError(f"lpips linear head {i} missing")
    return params


def convert_lpips_weights(alexnet_path: str, lpips_path: str,
                          out_npz: str) -> dict:
    """One-time conversion: official .pth files → combined .npz."""
    from correrender_tpu.io.torchscript import read_torch_weights

    params = _from_torch_dicts(
        read_torch_weights(alexnet_path), read_torch_weights(lpips_path)
    )
    np.savez(out_npz, **params)
    return params


def synthetic_lpips_params(seed: int = 0) -> dict:
    """Deterministic random weights in the exact published layout.

    Used by the torch-free exactness tests (tests/test_lpips.py) and
    the golden generator (tools/gen_lpips_golden.py): both sides build
    the SAME weights from this one function (numpy ``default_rng`` is
    stream-stable), so checked-in golden distances pin the JAX forward
    wherever torch is absent. He-scaled so activations stay O(1)
    through the five-stage stack.
    """
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX_CONVS):
        fan_in = in_ch * k * k
        params[f"conv{i}.weight"] = (
            rng.standard_normal((out_ch, in_ch, k, k))
            * np.sqrt(2.0 / fan_in)).astype(np.float32)
        params[f"conv{i}.bias"] = (
            0.1 * rng.standard_normal(out_ch)).astype(np.float32)
        in_ch = out_ch
    for i, ch in enumerate(c for c, *_ in _ALEX_CONVS):
        # lpips heads are non-negative in the published checkpoint;
        # mirror that so distances are non-negative here too.
        params[f"lin{i}.weight"] = np.abs(
            rng.standard_normal((1, ch, 1, 1)) / ch).astype(np.float32)
    return params


_WEIGHTS_CACHE: dict = {}


def load_lpips_weights(path: str | None = None) -> dict | None:
    """Locate and load LPIPS weights; None when unavailable.

    Search order: explicit ``path`` → ``$CORRERENDER_LPIPS_WEIGHTS``
    → ``~/.cache/correrender_tpu/lpips_alex.npz``. Loaded weights are
    memoized per resolved path — metric loops (perf sweeps, per-frame
    compare_images) must not re-read and re-upload the full AlexNet
    stack on every distance call.
    """
    candidates = [
        path,
        os.environ.get("CORRERENDER_LPIPS_WEIGHTS"),
        os.path.expanduser("~/.cache/correrender_tpu/lpips_alex.npz"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            key = os.path.abspath(cand)
            if key not in _WEIGHTS_CACHE:
                with np.load(cand) as data:
                    _WEIGHTS_CACHE[key] = {
                        k: jnp.asarray(data[k]) for k in data.files
                    }
            return _WEIGHTS_CACHE[key]
    return None
