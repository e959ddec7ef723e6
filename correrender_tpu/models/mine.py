"""Neural correlation estimators: SRN and MINE network families.

Reference: NetworkType {MINE, SRN_MINE, SRN}
(src/Calculators/CorrelationDefines.hpp:81-99) behind the
DeepLearningCorrelationCalculator GUI; backends TorchScript /
tiny-cuda-nn / QuickMLP / VMLP all collapse here onto one JAX model.

* **SRN** (scene representation network): encoder(position_ref),
  encoder(position_query) → symmetrizer → decoder → correlation value.
  Trained supervised against computed correlation fields; at inference
  it replaces the estimator for instant reference-point queries.
* **MINE** (Belghazi et al. 2018, arXiv:1801.04062): the statistic
  network T(x, y) trained on the Donsker–Varadhan bound
  ``MI ≥ E_joint[T] − log E_marginal[exp T]`` to estimate MI between
  two series directly from samples.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from correrender_tpu.models.encodings import (
    FrequencyEncoding,
    HashGridEncoding,
)
from correrender_tpu.models.vmlp import MLP
from correrender_tpu.models.symmetrizer import (
    symmetrize,
    symmetrizer_output_features,
)


def _adam_update(params, grads, state, lr, t):
    m, v = state
    m = jax.tree.map(lambda a, g: 0.9 * a + 0.1 * g, m, grads)
    v = jax.tree.map(lambda a, g: 0.999 * a + 0.001 * g * g, v, grads)
    mhat = jax.tree.map(lambda a: a / (1 - 0.9**t), m)
    vhat = jax.tree.map(lambda a: a / (1 - 0.999**t), v)
    params = jax.tree.map(
        lambda p, mh, vh: p - lr * mh / (jnp.sqrt(vh) + 1e-8),
        params, mhat, vhat,
    )
    return params, (m, v)


@dataclasses.dataclass(frozen=True)
class CorrelationSRN:
    """Encoder–symmetrizer–decoder correlation surrogate."""

    encoding: object = None
    encoder: MLP = None
    decoder: MLP = None
    symmetrizer: str = "add_diff"

    @classmethod
    def create(cls, hidden=64, latent=32, num_frequencies=6,
               symmetrizer="add_diff", encoding="frequency",
               hash_levels=8, hash_features=2, hash_log2_size=15,
               hash_base_res=4, hash_per_level_scale=1.6):
        """``encoding="hash_grid"`` uses the instant-NGP
        multiresolution grid (the tiny-cuda-nn encoder the SSDBM'24
        networks train with) instead of the frequency encoding —
        markedly better surrogate PSNR on fields with local
        correlation structure."""
        if encoding == "hash_grid":
            enc = HashGridEncoding(
                dims=3, num_levels=hash_levels,
                features_per_level=hash_features,
                log2_hashmap_size=hash_log2_size,
                base_resolution=hash_base_res,
                per_level_scale=hash_per_level_scale,
            )
        else:
            enc = FrequencyEncoding(
                dims=3, num_frequencies=num_frequencies
            )
        encoder = MLP(enc.num_features, hidden, latent, num_layers=2)
        decoder = MLP(
            symmetrizer_output_features(latent, symmetrizer),
            hidden, 1, num_layers=2,
        )
        return cls(encoding=enc, encoder=encoder, decoder=decoder,
                   symmetrizer=symmetrizer)

    _SYMMETRIZERS = ("add", "add_diff", "mul")
    _ACTIVATIONS = ("relu", "snake", "snake_alt", "none")
    _ENCODING_TYPES = ("frequency", "hash_grid")

    def config_array(self):
        """Hyperparameters as a small int array (rides inside .npz
        weight presets so loading needs no side-channel config).

        Records the MLP DEPTHS and activation too: presets saved from
        imported torch archives are not always the 2-hidden-layer
        default, and rebuilding against the wrong depth mis-chains the
        loaded parameter shapes (round-3 review finding).
        """
        import numpy as np

        if isinstance(self.encoding, HashGridEncoding):
            enc_kind = 1
            freq = 0
            hash_cfg = [
                self.encoding.num_levels,
                self.encoding.features_per_level,
                self.encoding.log2_hashmap_size,
                self.encoding.base_resolution,
                # float64 bit pattern, not a ×1000 quantization: the
                # per-level table SHAPES depend on
                # floor(base·scale^level), so a lossy scale can
                # rebuild an encoding whose table sizes mismatch the
                # saved params (round-3 review). Bit patterns of real
                # scales (≥1.0) exceed 2^62, so the loader can still
                # tell them from legacy ×1000 values.
                int(np.float64(self.encoding.per_level_scale)
                    .view(np.int64)),
            ]
        else:
            enc_kind = 0
            freq = self.encoding.num_frequencies
            hash_cfg = [0, 0, 0, 0, 0]
        return np.asarray([
            self.encoder.hidden,
            self.encoder.out_features,
            freq,
            self._SYMMETRIZERS.index(self.symmetrizer),
            self.encoder.num_layers,
            self.decoder.num_layers,
            self._ACTIVATIONS.index(self.encoder.activation),
            enc_kind,
            *hash_cfg,
        ], np.int64)

    @classmethod
    def from_config_array(cls, cfg):
        hidden, latent = int(cfg[0]), int(cfg[1])
        num_frequencies = int(cfg[2])
        symmetrizer = cls._SYMMETRIZERS[int(cfg[3])]
        # Older 4-element presets predate the depth/activation fields;
        # 7-element ones predate the encoding-kind fields.
        enc_layers = int(cfg[4]) if len(cfg) > 4 else 2
        dec_layers = int(cfg[5]) if len(cfg) > 5 else 2
        activation = (cls._ACTIVATIONS[int(cfg[6])]
                      if len(cfg) > 6 else "relu")
        if len(cfg) > 7 and int(cfg[7]) == 1:
            import numpy as np

            raw = int(cfg[12])
            if 0 < raw < 100_000:
                # Legacy ×1000-quantized presets (pre bit-pattern).
                scale = raw / 1000.0
            else:
                scale = float(np.int64(raw).view(np.float64))
            enc = HashGridEncoding(
                dims=3,
                num_levels=int(cfg[8]),
                features_per_level=int(cfg[9]),
                log2_hashmap_size=int(cfg[10]),
                base_resolution=int(cfg[11]),
                per_level_scale=scale,
            )
        else:
            enc = FrequencyEncoding(
                dims=3, num_frequencies=num_frequencies
            )
        return cls(
            encoding=enc,
            encoder=MLP(enc.num_features, hidden, latent,
                        num_layers=enc_layers, activation=activation),
            decoder=MLP(
                symmetrizer_output_features(latent, symmetrizer),
                hidden, 1, num_layers=dec_layers, activation=activation,
            ),
            symmetrizer=symmetrizer,
        )

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "encoding": self.encoding.init(k1),
            "encoder": self.encoder.init(k2),
            "decoder": self.decoder.init(k3),
        }

    def apply(self, params, pos_ref, pos_query):
        """pos_*: (..., 3) normalized positions → (...,) correlation."""
        ea = self.encoder.apply(
            params["encoder"],
            self.encoding.apply(params["encoding"], pos_ref),
        )
        eb = self.encoder.apply(
            params["encoder"],
            self.encoding.apply(params["encoding"], pos_query),
        )
        z = symmetrize(ea, eb, self.symmetrizer)
        return self.decoder.apply(params["decoder"], z)[..., 0]


def train_srn(
    model: CorrelationSRN,
    pos_ref: jnp.ndarray,
    pos_query: jnp.ndarray,
    targets: jnp.ndarray,
    steps: int = 500,
    batch: int = 4096,
    lr: float = 3e-3,
    seed: int = 0,
):
    """Supervised fit of the SRN to (ref, query) → correlation samples."""
    key = jax.random.key(seed)
    params = model.init(key)
    n = targets.shape[0]

    def loss_fn(p, pr, pq, t):
        pred = model.apply(p, pr, pq)
        return jnp.mean((pred - t) ** 2)

    def step_fn(p, opt_state, key, t_step):
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (min(batch, n),), 0, n)
        loss, grads = jax.value_and_grad(loss_fn)(
            p, pos_ref[idx], pos_query[idx], targets[idx]
        )
        p, opt_state = _adam_update(p, grads, opt_state, lr, t_step)
        return p, opt_state, key, loss

    # Whole loop in one dispatch: a Python step loop costs a device
    # round-trip per step (~25 ms over a tunneled link).
    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def run(params, key, n_steps):
        zeros = jax.tree.map(jnp.zeros_like, params)
        opt_state = (zeros, jax.tree.map(jnp.zeros_like, params))

        def body(i, carry):
            p, opt_state, key, _ = carry
            return step_fn(p, opt_state, key, (i + 1).astype(jnp.float32))

        return jax.lax.fori_loop(
            0, n_steps, body, (params, opt_state, key, jnp.inf)
        )

    params, _, _, loss = run(params, key, steps)
    return params, float(loss)


@dataclasses.dataclass(frozen=True)
class MineEstimator:
    """MINE statistic network over scalar sample pairs."""

    network: MLP = None

    @classmethod
    def create(cls, hidden=64, num_layers=3):
        return cls(network=MLP(2, hidden, 1, num_layers=num_layers))

    def init(self, key):
        return self.network.init(key)

    def statistic(self, params, x, y):
        inp = jnp.stack([x, y], axis=-1)
        return self.network.apply(params, inp)[..., 0]

    def mi_lower_bound(self, params, x, y, key):
        """Donsker–Varadhan bound on samples (..., n)."""
        t_joint = self.statistic(params, x, y)
        y_shuffled = jax.random.permutation(key, y, axis=-1)
        t_marg = self.statistic(params, x, y_shuffled)
        return jnp.mean(t_joint) - jnp.log(
            jnp.mean(jnp.exp(jnp.clip(t_marg, -20.0, 20.0))) + 1e-12
        )


def train_mine(
    estimator: MineEstimator,
    x: jnp.ndarray,
    y: jnp.ndarray,
    steps: int = 400,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Train the statistic net on one (x, y) sample set; returns
    (params, MI estimate in nats)."""
    key = jax.random.key(seed)
    params = estimator.init(key)

    def loss_fn(p, k):
        return -estimator.mi_lower_bound(p, x, y, k)

    def step_fn(p, opt_state, key, t):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub)
        p, opt_state = _adam_update(p, grads, opt_state, lr, t)
        return p, opt_state, key, loss

    # One dispatch for the full schedule (see train_srn).
    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def run(params, key, n_steps):
        zeros = jax.tree.map(jnp.zeros_like, params)
        opt_state = (zeros, jax.tree.map(jnp.zeros_like, params))

        def body(i, carry):
            p, opt_state, key, _ = carry
            return step_fn(p, opt_state, key, (i + 1).astype(jnp.float32))

        return jax.lax.fori_loop(
            0, n_steps, body, (params, opt_state, key, jnp.inf)
        )

    params, _, _, loss = run(params, key, steps)
    return params, -float(loss)


def train_mine_batched(
    estimator: MineEstimator,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    steps: int = 300,
    lr: float = 1e-3,
    seed: int = 0,
) -> jnp.ndarray:
    """Train P independent MINE statistic nets at once.

    The reference's neural time-series mode evaluates an estimator per
    heatmap cell on the GPU (TimeSeriesCorrelationRenderer.cu); here
    the per-pair networks are vmapped — parameters carry a leading
    pair axis and every Adam step updates all P nets in one XLA
    program.

    Args:
      xs, ys: ``(P, n)`` sample series per pair.

    Returns:
      ``(P,)`` MI lower-bound estimates (nats) from the trained nets.
    """
    p_count = xs.shape[0]
    keys = jax.random.split(jax.random.key(seed), p_count)
    params = jax.vmap(estimator.init)(keys)

    def loss_one(p, x, y, k):
        return -estimator.mi_lower_bound(p, x, y, k)

    grad_all = jax.vmap(jax.value_and_grad(loss_one))

    @jax.jit
    def run(params, keys):
        zeros = jax.tree.map(jnp.zeros_like, params)
        opt_state = (zeros, jax.tree.map(jnp.zeros_like, params))

        def body(t, carry):
            params, opt_state, keys = carry
            split = jax.vmap(jax.random.split)(keys)
            keys, subs = split[:, 0], split[:, 1]
            _, grads = grad_all(params, xs, ys, subs)
            params, opt_state = _adam_update(
                params, grads, opt_state, lr, t.astype(jnp.float32)
            )
            return params, opt_state, keys

        params, opt_state, keys = jax.lax.fori_loop(
            1, steps + 1, body, (params, opt_state, keys)
        )
        mi = jax.vmap(estimator.mi_lower_bound)(params, xs, ys, keys)
        return jnp.maximum(mi, 0.0)

    return run(params, keys)
