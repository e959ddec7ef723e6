"""Import published PyTorch correlation networks onto the JAX models.

The reference ships its VMV'23 / SSDBM'24 networks as TorchScript
modules (reference src/Calculators/PyTorchCorrelationCalculator.cpp:
261-277: ``torch::jit::load`` of an encoder/decoder pair with a
symmetrizer between them). This module maps the weights of such an
archive — read torch-free by :mod:`correrender_tpu.io.torchscript` —
onto :class:`correrender_tpu.models.mine.CorrelationSRN`, so the
published checkpoints drive the JAX calculator directly.

Structure is inferred from the weights themselves: linear layers are
grouped by name prefix (``encoder*`` / ``decoder*``, else the first
and second module groups found), ordered by their layer index, and
the symmetrizer arity follows from decoder-input vs encoder-output
width (2x ⇒ AddDiff, 1x ⇒ Add/Mul — reference SymmetrizerType.hpp:
33-35).
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from correrender_tpu.models.encodings import FrequencyEncoding
from correrender_tpu.models.mine import CorrelationSRN
from correrender_tpu.models.vmlp import MLP


def _layer_groups(weights: dict) -> dict:
    """Group ``...<idx>.weight/.bias`` keys into ordered layer lists."""
    groups: dict = {}
    for key, arr in weights.items():
        if key == "__meta__" or not isinstance(arr, np.ndarray):
            continue
        m = re.match(r"^(.*?)\.?(\d+)?\.(weight|bias)$", key)
        if not m:
            continue
        prefix, idx, kind = m.groups()
        prefix = re.sub(r"\.(net|layers|linears|model)$", "", prefix)
        entry = groups.setdefault(prefix, {})
        entry.setdefault(int(idx or 0), {})[kind] = arr
    return {
        p: [layers[i] for i in sorted(layers)]
        for p, layers in groups.items()
        if any("weight" in l for l in layers.values())
    }


def _to_mlp_params(layers) -> list:
    """Torch ``(out, in)`` Linear stacks → our ``{"w": (in, out)}``."""
    params = []
    for layer in layers:
        w = np.asarray(layer["weight"], np.float32)
        b = layer.get("bias")
        if b is None:
            b = np.zeros(w.shape[0], np.float32)
        params.append({
            "w": jnp.asarray(w.T),
            "b": jnp.asarray(np.asarray(b, np.float32)),
        })
    return params


def _pick(groups: dict, want: str, fallback_index: int):
    for name in groups:
        if want in name.lower():
            return groups[name]
    names = sorted(groups)
    if len(names) > fallback_index:
        return groups[names[fallback_index]]
    raise ValueError(
        f"torch archive has no '{want}' module group "
        f"(found: {sorted(groups)})"
    )


def srn_from_torch_archive(
    path: str,
    symmetrizer: str | None = None,
    activation: str = "relu",
):
    """Load a published encoder/decoder archive → (model, params).

    Args:
      path: ``.pt``/``.pth`` archive (TorchScript or state-dict zip).
      symmetrizer: override the inferred symmetrizer ("add" |
        "add_diff" | "mul"); widths only disambiguate AddDiff, so Mul
        models need this set explicitly.
      activation: hidden activation of the published MLPs (weights
        cannot encode it; the reference nets use ReLU).

    Returns:
      ``(CorrelationSRN, params)`` ready for
      :class:`~correrender_tpu.calculators.neural.NeuralCorrelationCalculator`.
    """
    from correrender_tpu.io.torchscript import read_torch_weights

    weights = read_torch_weights(path)
    groups = _layer_groups(weights)
    enc_layers = _pick(groups, "encoder", 0)
    dec_layers = _pick(groups, "decoder", 1)
    enc_params = _to_mlp_params(enc_layers)
    dec_params = _to_mlp_params(dec_layers)

    enc_in = enc_params[0]["w"].shape[0]
    latent = enc_params[-1]["w"].shape[1]
    dec_in = dec_params[0]["w"].shape[0]
    if symmetrizer is None:
        symmetrizer = "add_diff" if dec_in == 2 * latent else "add"
    elif symmetrizer == "add_diff" and dec_in != 2 * latent:
        raise ValueError(
            f"add_diff needs decoder input {2 * latent}, got {dec_in}"
        )

    if enc_in % 6 == 0:
        enc = FrequencyEncoding(dims=3, num_frequencies=enc_in // 6)
    else:
        raise ValueError(
            f"encoder input width {enc_in} does not match a 3-D "
            "frequency encoding (6 features per frequency)"
        )

    def mlp_like(params, activation):
        # The MLP config assumes one uniform hidden width (the
        # published models are uniform); reject archives that are not,
        # so a config-rebuilt model can never silently mismatch the
        # imported parameter shapes.
        hidden_widths = {p["w"].shape[1] for p in params[:-1]}
        if len(hidden_widths) > 1:
            raise ValueError(
                "imported MLP has non-uniform hidden widths "
                f"{sorted(hidden_widths)}; MLP config supports one"
            )
        return MLP(
            in_features=params[0]["w"].shape[0],
            hidden=params[0]["w"].shape[1],
            out_features=params[-1]["w"].shape[1],
            num_layers=len(params) - 1,
            activation=activation,
        )

    model = CorrelationSRN(
        encoding=enc,
        encoder=mlp_like(enc_params, activation),
        decoder=mlp_like(dec_params, activation),
        symmetrizer=symmetrizer,
    )
    params = {
        "encoding": {},
        "encoder": enc_params,
        "decoder": dec_params,
    }
    return model, params
