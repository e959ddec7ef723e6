"""Plain-JAX MLP with the reference's activation set.

Reference: src/Calculators/VMLP/Network.hpp — Matrix/Module MLP with
optional cooperative-matrix fused layers (NetworkFused.glsl:53-110) and
activations {None, ReLU, Snake, SnakeAlt} (Network.hpp:49-53), fp16 or
fp32 (Format.hpp). On TPU the "fused" path is simply batched matmuls
on the MXU with optional bfloat16 compute.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _snake(x, a=1.0):
    return x + jnp.sin(a * x) ** 2 / a


def _snake_alt(x, a=1.0):
    # SnakeAlt: (x + 1 − cos(2ax)/1)/... use the common alternative form
    # 0.5·(x + (1 − cos(2ax)) / (2a)) scaled — equivalent periodic bias.
    return (x + (1.0 - jnp.cos(2.0 * a * x)) / (2.0 * a)) * 0.5


ACTIVATIONS = {
    "none": lambda x: x,
    "relu": jax.nn.relu,
    "snake": _snake,
    "snake_alt": _snake_alt,
}


@dataclasses.dataclass(frozen=True)
class MLP:
    """MLP spec: ``init(key) -> params``, ``apply(params, x) -> y``."""

    in_features: int
    hidden: int = 64
    out_features: int = 1
    num_layers: int = 3  # hidden layers
    activation: str = "relu"
    output_activation: str = "none"
    compute_dtype: str = "float32"  # "float32" | "bfloat16"

    def init(self, key):
        sizes = (
            [self.in_features]
            + [self.hidden] * self.num_layers
            + [self.out_features]
        )
        params = []
        for i in range(len(sizes) - 1):
            key, sub = jax.random.split(key)
            scale = jnp.sqrt(2.0 / sizes[i])
            params.append(
                {
                    "w": jax.random.normal(sub, (sizes[i], sizes[i + 1]))
                    * scale,
                    "b": jnp.zeros(sizes[i + 1]),
                }
            )
        return params

    def apply(self, params, x):
        act = ACTIVATIONS[self.activation]
        out_act = ACTIVATIONS[self.output_activation]
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else (
            jnp.float32
        )
        h = x.astype(dtype)
        for i, layer in enumerate(params):
            h = (
                jnp.dot(
                    h, layer["w"].astype(dtype),
                    preferred_element_type=jnp.float32,
                )
                + layer["b"]
            )
            h = act(h) if i < len(params) - 1 else out_act(h)
            h = h.astype(dtype) if i < len(params) - 1 else h
        return h.astype(jnp.float32)
