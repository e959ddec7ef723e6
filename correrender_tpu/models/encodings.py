"""Input encodings for the neural correlation networks.

Reference: src/Calculators/VMLP/Encoding.hpp:46-232 +
Data/Shaders/VMLP/Encodings.glsl — Identity, Frequency, instant-NGP
grid (GridType {HASH, DENSE}, HashType {PRIME, COHERENT_PRIME,
REVERSED_PRIME}, nearest/linear interpolation, numLevels /
numFeaturesPerLevel / log2HashMapSize / baseResolution / perLevelScale)
and Dictionary.

Encodings are (params, apply) pairs: ``init(key) -> params``,
``apply(params, x) -> features``; x positions are normalized [0,1]^D.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

# Reference prime tables (Encodings.glsl:283-288): PRIME hashes every
# axis; COHERENT_PRIME leaves axis 0 unhashed (cache locality);
# REVERSED_PRIME walks the table backwards.
_PRIMES = (1958374283, 2654435761, 805459861, 3674653429,
           2097192037, 1434869437, 2165219737)


@dataclasses.dataclass(frozen=True)
class IdentityEncoding:
    dims: int = 3

    @property
    def num_features(self):
        return self.dims

    def init(self, key):
        return {}

    def apply(self, params, x):
        return x


@dataclasses.dataclass(frozen=True)
class FrequencyEncoding:
    """NeRF-style sin/cos frequency features."""

    dims: int = 3
    num_frequencies: int = 6

    @property
    def num_features(self):
        return self.dims * self.num_frequencies * 2

    def init(self, key):
        return {}

    def apply(self, params, x):
        freqs = (2.0 ** jnp.arange(self.num_frequencies)) * math.pi
        ang = x[..., None] * freqs  # (..., D, F)
        feats = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        return feats.reshape(x.shape[:-1] + (self.num_features,))


@dataclasses.dataclass(frozen=True)
class HashGridEncoding:
    """Multiresolution hash/dense grid (instant-NGP-style)."""

    dims: int = 3
    num_levels: int = 8
    features_per_level: int = 2
    log2_hashmap_size: int = 15
    base_resolution: int = 4
    per_level_scale: float = 1.6
    grid_type: str = "hash"  # "hash" | "dense"
    hash_type: str = "prime"  # "prime" | "coherent_prime" | "reversed_prime"
    interpolation: str = "linear"  # "linear" | "nearest"

    @property
    def num_features(self):
        return self.num_levels * self.features_per_level

    def _level_resolution(self, level: int) -> int:
        return int(
            math.floor(self.base_resolution * self.per_level_scale**level)
        )

    def _table_size(self, level: int) -> int:
        dense = self._level_resolution(level) ** self.dims
        if self.grid_type == "dense":
            return dense
        return min(dense, 2**self.log2_hashmap_size)

    def init(self, key):
        tables = []
        for lvl in range(self.num_levels):
            key, sub = jax.random.split(key)
            tables.append(
                jax.random.uniform(
                    sub, (self._table_size(lvl), self.features_per_level),
                    jnp.float32, -1e-4, 1e-4,
                )
            )
        return {"tables": tables}

    def _index(self, corner: jnp.ndarray, res: int, table_size: int):
        """corner: (..., D) int32 grid coords → table index."""
        dense = res**self.dims
        if self.grid_type == "dense" or dense <= table_size:
            idx = corner[..., 0]
            for d in range(1, self.dims):
                idx = idx * res + corner[..., d]
            return idx
        primes = _PRIMES[: self.dims]
        if self.hash_type == "reversed_prime":
            primes = _PRIMES[::-1][: self.dims]
        elif self.hash_type == "coherent_prime":
            # Coherent variant: first axis unhashed for cache locality.
            primes = (1,) + _PRIMES[1 : self.dims]
        h = jnp.zeros(corner.shape[:-1], jnp.uint32)
        for d in range(self.dims):
            h = h ^ (corner[..., d].astype(jnp.uint32) * jnp.uint32(primes[d]))
        return (h % jnp.uint32(table_size)).astype(jnp.int32)

    def apply(self, params, x):
        outs = []
        for lvl, table in enumerate(params["tables"]):
            res = self._level_resolution(lvl)
            size = table.shape[0]
            p = x * (res - 1)
            if self.interpolation == "nearest":
                corner = jnp.round(p).astype(jnp.int32)
                idx = self._index(jnp.clip(corner, 0, res - 1), res, size)
                outs.append(table[idx])
                continue
            p0 = jnp.floor(p).astype(jnp.int32)
            frac = p - p0
            acc = 0.0
            for mask in range(2**self.dims):
                offs = jnp.asarray(
                    [(mask >> d) & 1 for d in range(self.dims)], jnp.int32
                )
                corner = jnp.clip(p0 + offs, 0, res - 1)
                w = jnp.ones(x.shape[:-1], jnp.float32)
                for d in range(self.dims):
                    wd = jnp.where(offs[d] == 1, frac[..., d],
                                   1.0 - frac[..., d])
                    w = w * wd
                idx = self._index(corner, res, size)
                acc = acc + w[..., None] * table[idx]
            outs.append(acc)
        return jnp.concatenate(outs, axis=-1)


@dataclasses.dataclass(frozen=True)
class DictionaryEncoding:
    """Learned per-index embedding (e.g. ensemble-member id)."""

    num_embeddings: int = 1000
    features: int = 8

    @property
    def num_features(self):
        return self.features

    def init(self, key):
        return {
            "table": jax.random.normal(
                key, (self.num_embeddings, self.features)
            )
            * 0.1
        }

    def apply(self, params, idx):
        return params["table"][idx.astype(jnp.int32)]


@dataclasses.dataclass(frozen=True)
class CompositeEncoding:
    """Concatenation of encodings over slices of the input vector."""

    encodings: tuple
    slices: tuple  # tuple of (start, stop) per encoding

    @property
    def num_features(self):
        return sum(e.num_features for e in self.encodings)

    def init(self, key):
        keys = jax.random.split(key, len(self.encodings))
        return {
            f"enc{i}": e.init(k)
            for i, (e, k) in enumerate(zip(self.encodings, keys))
        }

    def apply(self, params, x):
        outs = []
        for i, (enc, (a, b)) in enumerate(zip(self.encodings, self.slices)):
            outs.append(enc.apply(params[f"enc{i}"], x[..., a:b]))
        return jnp.concatenate(outs, axis=-1)
