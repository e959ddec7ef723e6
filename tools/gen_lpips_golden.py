"""Generate the torch-derived LPIPS golden file (one-time).

Builds the deterministic synthetic weights from
``utils.lpips_alex.synthetic_lpips_params`` (numpy ``default_rng`` —
stream-stable, so tests regenerate bit-identical weights without this
file), runs a torch reference forward written from the published
equations (lpips/lpips.py + torchvision AlexNet, the same model the
reference's scripts/similarity.py:47-62 calls), and records the
expected distances. tests/test_lpips.py then asserts the JAX forward
against these numbers on any host — torch-free.

Run: ``python tools/gen_lpips_golden.py`` (requires torch; writes
``tests/goldens/lpips_golden.json``).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

from correrender_tpu.utils.lpips_alex import (  # noqa: E402
    synthetic_lpips_params,
)

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tests", "goldens",
    "lpips_golden.json")


def torch_lpips_forward(params: dict):
    """Torch AlexNet-LPIPS forward with explicit weights."""
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
    tap_idx = {1, 4, 7, 9, 11}  # post-ReLU (lpips/pretrained_networks.py)

    def forward(a, b):
        def taps(x):
            x = (x - shift) / scale
            out = []
            for i, layer in enumerate(feats):
                x = layer(x)
                if i in tap_idx:
                    out.append(x)
            return out

        ta, tb = taps(a), taps(b)
        total = 0.0
        tap_means = []
        for i, (xa, xb) in enumerate(zip(ta, tb)):
            na = xa / (xa.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            nb = xb / (xb.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
            term = lins[i]((na - nb) ** 2).mean()
            tap_means.append(float(xa.mean()))
            total = total + term
        return float(total), tap_means

    return forward


def main():
    params = synthetic_lpips_params(seed=0)
    forward = torch_lpips_forward(params)

    rng = np.random.default_rng(1)
    a = rng.random((96, 128, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(
        np.float32)
    c = (1.0 - a).astype(np.float32)
    gray = np.full((96, 128, 3), 0.5, np.float32)

    def to_t(img):
        return torch.from_numpy(np.moveaxis(img, -1, 0)[None] * 2 - 1)

    cases = {}
    with torch.no_grad():
        for name, (x, y) in {
            "near": (a, b), "invert": (a, c), "gray_vs_a": (gray, a),
        }.items():
            dist, tap_means = forward(to_t(x), to_t(y))
            cases[name] = {"distance": dist, "tap_means_a": tap_means}

    golden = {
        "seed_weights": 0,
        "seed_inputs": 1,
        "shape": [96, 128, 3],
        "torch_version": torch.__version__,
        "cases": cases,
    }
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {os.path.normpath(GOLDEN_PATH)}")
    for name, case in cases.items():
        print(f"  {name}: {case['distance']:.6f}")


if __name__ == "__main__":
    main()
