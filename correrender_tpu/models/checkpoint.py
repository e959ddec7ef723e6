"""Model-parameter checkpointing.

Reference analogue (SURVEY.md §5.4): the reference persists TorchScript
/ tiny-cuda-nn model files for its neural calculators; here trained
JAX pytrees save as ``.npz`` (flat key paths) — dependency-free and
loadable anywhere. Orbax remains available for sharded/async
checkpoints of large states.
"""

from __future__ import annotations

import numpy as np

import jax


def _flatten(params, prefix=""):
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(params)
    return out


def save_params(path: str, params) -> None:
    """Save a JAX pytree of arrays as an .npz checkpoint."""
    flat = _flatten(params)
    np.savez_compressed(path, **flat)


def load_params(path: str, like):
    """Load an .npz checkpoint back into the structure of ``like``."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}

    def rebuild(template, prefix=""):
        if isinstance(template, dict):
            return {
                k: rebuild(v, f"{prefix}{k}/") for k, v in template.items()
            }
        if isinstance(template, (list, tuple)):
            seq = [
                rebuild(v, f"{prefix}{i}/") for i, v in enumerate(template)
            ]
            return type(template)(seq)
        key = prefix.rstrip("/")
        if key not in flat:
            raise KeyError(f"checkpoint missing parameter {key!r}")
        return jax.numpy.asarray(flat[key])

    return rebuild(like)
