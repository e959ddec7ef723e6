"""LPIPS JAX forward exactness — torch-free by default.

Published AlexNet/LPIPS checkpoints cannot be fetched on a zero-egress
box, so exactness is pinned two ways:

1. **Golden test (always runs).** Deterministic synthetic weights in
   the exact published architecture
   (``utils.lpips_alex.synthetic_lpips_params``, numpy ``default_rng``
   — stream-stable) were run once through a torch reference forward
   written from the published equations (lpips/lpips.py + torchvision
   AlexNet; ``tools/gen_lpips_golden.py``), and the resulting
   distances checked in (``tests/goldens/lpips_golden.json``). The JAX
   forward must reproduce them to 1e-4 on every host, torch present or
   not. With real weights the same path yields the published numbers.
2. **Live torch cross-check (runs where torch exists).** The same
   comparison against a freshly built torch model — catches the golden
   file itself going stale.

The conversion path (official ``.pth`` → ``.npz``) is exercised
torch-free against checked-in miniature torch-format archives with the
official files' key layouts (reference scripts/similarity.py:47-62
uses ``lpips.LPIPS(net='alex')``).
"""

import json
import os

import numpy as np
import pytest

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _golden():
    with open(os.path.join(GOLDENS, "lpips_golden.json")) as f:
        return json.load(f)


def _golden_inputs(golden):
    rng = np.random.default_rng(golden["seed_inputs"])
    shape = tuple(golden["shape"])
    a = rng.random(shape).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(shape), 0, 1).astype(
        np.float32)
    c = (1.0 - a).astype(np.float32)
    gray = np.full(shape, 0.5, np.float32)
    return {"near": (a, b), "invert": (a, c), "gray_vs_a": (gray, a)}


def test_forward_matches_torch_golden():
    """JAX forward reproduces the checked-in torch-derived distances
    (torch-free — this is the always-on exactness gate)."""
    from correrender_tpu.utils.lpips_alex import (
        alexnet_features,
        lpips_alex,
        synthetic_lpips_params,
    )

    golden = _golden()
    params = {k: np.asarray(v) for k, v in
              synthetic_lpips_params(golden["seed_weights"]).items()}
    pairs = _golden_inputs(golden)
    for name, case in golden["cases"].items():
        x, y = pairs[name]
        got = lpips_alex(x, y, params)
        assert got == pytest.approx(case["distance"], abs=1e-4), name
        # Per-tap activation means localize any divergence to a layer.
        xt = np.moveaxis(x, -1, 0)[None] * 2.0 - 1.0
        taps = alexnet_features(xt, params)
        for i, want in enumerate(case["tap_means_a"]):
            assert float(np.mean(taps[i])) == pytest.approx(
                want, abs=1e-4), (name, i)
    # Identical inputs → zero distance regardless of weights.
    a = pairs["near"][0]
    assert abs(lpips_alex(a, a, params)) < 1e-7


def test_forward_matches_live_torch():
    """Cross-check against a freshly built torch reference (skips
    where torch is absent — the golden test above still runs there)."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from correrender_tpu.utils.lpips_alex import (
        lpips_alex,
        synthetic_lpips_params,
    )

    params = synthetic_lpips_params(0)
    feats = nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
    )
    convs = [m for m in feats if isinstance(m, nn.Conv2d)]
    with torch.no_grad():
        for i, conv in enumerate(convs):
            conv.weight.copy_(torch.from_numpy(params[f"conv{i}.weight"]))
            conv.bias.copy_(torch.from_numpy(params[f"conv{i}.bias"]))
    lins = []
    for i, ch in enumerate((64, 192, 384, 256, 256)):
        lin = nn.Conv2d(ch, 1, 1, bias=False)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(params[f"lin{i}.weight"]))
        lins.append(lin)
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    tap_idx = {1, 4, 7, 9, 11}

    def forward(a, b):
        def taps(x):
            x = (x - shift) / scale
            out = []
            for i, layer in enumerate(feats):
                x = layer(x)
                if i in tap_idx:
                    out.append(x)
            return out

        total = 0.0
        for i, (xa, xb) in enumerate(zip(taps(a), taps(b))):
            na = xa / (xa.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            nb = xb / (xb.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            total = total + lins[i]((na - nb) ** 2).mean()
        return float(total)

    rng = np.random.default_rng(1)
    a = rng.random((96, 128, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(
        np.float32)
    with torch.no_grad():
        want = forward(
            torch.from_numpy(np.moveaxis(a, -1, 0)[None] * 2 - 1),
            torch.from_numpy(np.moveaxis(b, -1, 0)[None] * 2 - 1),
        )
    got = lpips_alex(a, b, params)
    assert abs(got - want) < 1e-4


def test_weights_convert_fixture_roundtrip(tmp_path, capsys):
    """`cli weights lpips` converts checked-in torch-format archives
    (official key layouts, miniature tensors) torch-free, and the
    loader returns exactly the stored arrays."""
    from correrender_tpu.app import cli
    from correrender_tpu.utils.lpips_alex import load_lpips_weights

    out = str(tmp_path / "lpips_alex.npz")
    cli.main([
        "weights", "lpips",
        "--alexnet", os.path.join(GOLDENS, "lpips_fixture_alexnet.pth"),
        "--lpips", os.path.join(GOLDENS, "lpips_fixture_heads.pth"),
        "--output", out,
    ])
    params = load_lpips_weights(out)
    assert params is not None
    tv_idx = (0, 3, 6, 8, 10)
    with np.load(os.path.join(
            GOLDENS, "lpips_fixture_expected.npz")) as want:
        for i in range(5):
            np.testing.assert_array_equal(
                np.asarray(params[f"conv{i}.weight"]),
                want[f"features.{tv_idx[i]}.weight"])
            np.testing.assert_array_equal(
                np.asarray(params[f"conv{i}.bias"]),
                want[f"features.{tv_idx[i]}.bias"])
            np.testing.assert_array_equal(
                np.asarray(params[f"lin{i}.weight"]),
                want[f"lin{i}.model.1.weight"])


def test_metrics_lpips_uses_weights_when_present(tmp_path, monkeypatch):
    """metrics.lpips picks up weights from the env var (torch-free)."""
    from correrender_tpu.utils import metrics
    from correrender_tpu.utils.lpips_alex import synthetic_lpips_params

    npz = str(tmp_path / "w.npz")
    np.savez(npz, **synthetic_lpips_params(0))
    monkeypatch.setenv("CORRERENDER_LPIPS_WEIGHTS", npz)

    rng = np.random.default_rng(2)
    a = rng.random((64, 64, 3)).astype(np.float32)
    d_same = metrics.lpips(a, a)
    d_diff = metrics.lpips(a, 1.0 - a)
    assert abs(d_same) < 1e-6
    assert d_diff > 1e-4   # synthetic heads are non-negative
