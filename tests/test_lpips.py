"""LPIPS JAX forward vs a torch reference implementation.

Published AlexNet/LPIPS checkpoints cannot be fetched on this
zero-egress box, so exactness is established the strongest available
way: random weights in the exact published architecture, reference
forward in torch (built here from the same equations as lpips/lpips.py
+ torchvision AlexNet), converted through the torch-free reader, and
compared to 1e-4. With real weights the same path yields the published
numbers.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torch_alex_lpips():
    """Reference AlexNet-LPIPS in torch (lpips.LPIPS(net='alex'))."""
    import torch.nn as nn

    feats = nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(),
        nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
    )
    lins = [nn.Conv2d(c, 1, 1, bias=False)
            for c in (64, 192, 384, 256, 256)]
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    tap_idx = {1, 4, 7, 9, 11}  # post-ReLU, as lpips/pretrained_networks.py

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
        return total

    return feats, lins, forward


def test_forward_matches_torch(tmp_path):
    from correrender_tpu.utils.lpips_alex import (
        convert_lpips_weights,
        load_lpips_weights,
        lpips_alex,
    )

    torch.manual_seed(0)
    feats, lins, forward = _torch_alex_lpips()

    # Persist as the official files' layouts: torchvision alexnet
    # state dict ('features.N.*') + lpips linear heads
    # ('linN.model.1.weight').
    conv_idx = (0, 3, 6, 8, 10)
    tv_idx = {0: 0, 1: 3, 2: 6, 3: 8, 4: 10}
    alex_sd = {}
    seq_convs = [m for m in feats if isinstance(m, torch.nn.Conv2d)]
    for i, conv in enumerate(seq_convs):
        alex_sd[f"features.{tv_idx[i]}.weight"] = conv.weight
        alex_sd[f"features.{tv_idx[i]}.bias"] = conv.bias
    lin_sd = {
        f"lin{i}.model.1.weight": lin.weight
        for i, lin in enumerate(lins)
    }
    del conv_idx
    alex_path = str(tmp_path / "alexnet.pth")
    lin_path = str(tmp_path / "alex_lpips.pth")
    torch.save(alex_sd, alex_path)
    torch.save(lin_sd, lin_path)

    npz = str(tmp_path / "lpips_alex.npz")
    convert_lpips_weights(alex_path, lin_path, npz)
    params = load_lpips_weights(npz)
    assert params is not None

    rng = np.random.default_rng(1)
    a = rng.random((96, 128, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(
        np.float32
    )
    with torch.no_grad():
        want = float(forward(
            torch.from_numpy(np.moveaxis(a, -1, 0)[None] * 2 - 1),
            torch.from_numpy(np.moveaxis(b, -1, 0)[None] * 2 - 1),
        ))
    got = lpips_alex(a, b, params)
    assert abs(got - want) < 1e-4
    # identical inputs → zero distance regardless of weights
    assert abs(lpips_alex(a, a, params)) < 1e-7


def test_metrics_lpips_uses_weights_when_present(tmp_path, monkeypatch):
    from correrender_tpu.utils import metrics
    from correrender_tpu.utils.lpips_alex import convert_lpips_weights

    torch.manual_seed(0)
    feats, lins, _ = _torch_alex_lpips()
    tv_idx = (0, 3, 6, 8, 10)
    seq_convs = [m for m in feats if isinstance(m, torch.nn.Conv2d)]
    alex_sd = {}
    for i, conv in enumerate(seq_convs):
        alex_sd[f"features.{tv_idx[i]}.weight"] = conv.weight
        alex_sd[f"features.{tv_idx[i]}.bias"] = conv.bias
    lin_sd = {
        f"lin{i}.model.1.weight": lin.weight
        for i, lin in enumerate(lins)
    }
    ap, lp = str(tmp_path / "a.pth"), str(tmp_path / "l.pth")
    torch.save(alex_sd, ap)
    torch.save(lin_sd, lp)
    npz = str(tmp_path / "w.npz")
    convert_lpips_weights(ap, lp, npz)
    monkeypatch.setenv("CORRERENDER_LPIPS_WEIGHTS", npz)

    rng = np.random.default_rng(2)
    a = rng.random((64, 64, 3)).astype(np.float32)
    d_same = metrics.lpips(a, a)
    d_diff = metrics.lpips(a, 1.0 - a)
    assert abs(d_same) < 1e-6
    # random (untrained) heads may be negative; only magnitude is
    # meaningful here — real weights are non-negative by construction
    assert abs(d_diff) > 1e-4
