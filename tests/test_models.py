"""Neural model family tests: encodings, MLP, symmetrizers, SRN, MINE."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from correrender_tpu.models import (
    IdentityEncoding,
    FrequencyEncoding,
    HashGridEncoding,
    DictionaryEncoding,
    MLP,
    symmetrize,
    CorrelationSRN,
    train_srn,
    MineEstimator,
    train_mine,
)


class TestEncodings:
    def test_identity(self):
        enc = IdentityEncoding(3)
        x = jnp.ones((5, 3))
        np.testing.assert_allclose(enc.apply(enc.init(None), x), x)

    def test_frequency_shape_and_range(self):
        enc = FrequencyEncoding(dims=3, num_frequencies=4)
        x = jax.random.uniform(jax.random.key(0), (7, 3))
        out = enc.apply({}, x)
        assert out.shape == (7, enc.num_features) == (7, 24)
        assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-6

    @pytest.mark.parametrize("grid_type", ["hash", "dense"])
    @pytest.mark.parametrize("interp", ["linear", "nearest"])
    def test_hashgrid(self, grid_type, interp):
        enc = HashGridEncoding(
            num_levels=4, base_resolution=4, log2_hashmap_size=8,
            grid_type=grid_type, interpolation=interp,
        )
        params = enc.init(jax.random.key(0))
        x = jax.random.uniform(jax.random.key(1), (11, 3))
        out = enc.apply(params, x)
        assert out.shape == (11, enc.num_features)
        assert np.isfinite(np.asarray(out)).all()

    def test_hashgrid_linear_is_continuous(self):
        enc = HashGridEncoding(num_levels=2, base_resolution=4,
                               interpolation="linear")
        params = enc.init(jax.random.key(0))
        x = jnp.asarray([[0.5, 0.5, 0.5]])
        eps = 1e-4
        a = enc.apply(params, x)
        b = enc.apply(params, x + eps)
        assert float(jnp.abs(a - b).max()) < 1e-2

    def test_dictionary(self):
        enc = DictionaryEncoding(num_embeddings=10, features=4)
        params = enc.init(jax.random.key(0))
        out = enc.apply(params, jnp.asarray([0, 3, 9]))
        assert out.shape == (3, 4)


class TestMLP:
    @pytest.mark.parametrize("act", ["none", "relu", "snake", "snake_alt"])
    def test_forward_shapes(self, act):
        mlp = MLP(8, hidden=16, out_features=2, num_layers=2,
                  activation=act)
        params = mlp.init(jax.random.key(0))
        out = mlp.apply(params, jnp.ones((5, 8)))
        assert out.shape == (5, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_bfloat16_compute(self):
        mlp = MLP(4, hidden=8, out_features=1, compute_dtype="bfloat16")
        params = mlp.init(jax.random.key(0))
        out = mlp.apply(params, jnp.ones((3, 4)))
        assert out.dtype == jnp.float32

    def test_can_fit_xor(self):
        mlp = MLP(2, hidden=16, out_features=1, num_layers=2)
        params = mlp.init(jax.random.key(0))
        x = jnp.asarray([[0, 0], [0, 1], [1, 0], [1, 1]], jnp.float32)
        y = jnp.asarray([[0.0], [1.0], [1.0], [0.0]])

        def loss(p):
            return jnp.mean((mlp.apply(p, x) - y) ** 2)

        import jax as _jax

        g = _jax.jit(_jax.grad(loss))
        for _ in range(800):
            grads = g(params)
            params = _jax.tree.map(lambda p, d: p - 0.3 * d, params, grads)
        assert float(loss(params)) < 0.02


class TestSymmetrizer:
    @pytest.mark.parametrize("kind", ["add", "add_diff", "mul"])
    def test_swap_invariance(self, kind):
        a = jax.random.normal(jax.random.key(0), (4, 8))
        b = jax.random.normal(jax.random.key(1), (4, 8))
        ab = symmetrize(a, b, kind)
        ba = symmetrize(b, a, kind)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(ba),
                                   atol=1e-6)


class TestSRN:
    def test_learns_synthetic_correlation(self):
        # Target: corr(p, q) = exp(-8·|p−q|²) — smooth symmetric field.
        rng = np.random.default_rng(0)
        pr = jnp.asarray(rng.uniform(size=(4000, 3)).astype(np.float32))
        pq = jnp.asarray(rng.uniform(size=(4000, 3)).astype(np.float32))
        target = jnp.exp(-8.0 * jnp.sum((pr - pq) ** 2, axis=-1))
        model = CorrelationSRN.create(hidden=32, latent=16,
                                      num_frequencies=4)
        params, loss = train_srn(model, pr, pq, target, steps=800,
                                 batch=1024, lr=1e-2)
        assert loss < 0.02
        # Symmetry by construction.
        a = model.apply(params, pr[:10], pq[:10])
        b = model.apply(params, pq[:10], pr[:10])
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestMINE:
    def test_orders_dependence(self):
        rng = np.random.default_rng(1)
        n = 2000
        x = rng.normal(size=n).astype(np.float32)
        y_dep = (0.95 * x + 0.05 * rng.normal(size=n)).astype(np.float32)
        y_ind = rng.normal(size=n).astype(np.float32)
        est = MineEstimator.create(hidden=32, num_layers=2)
        _, mi_dep = train_mine(est, jnp.asarray(x), jnp.asarray(y_dep),
                               steps=300)
        _, mi_ind = train_mine(est, jnp.asarray(x), jnp.asarray(y_ind),
                               steps=300)
        assert mi_dep > mi_ind + 0.3
        assert mi_dep > 0.5


class TestNeuralCalculator:
    def test_virtual_field_and_point_move(self):
        from correrender_tpu.core import GridMetadata, VolumeData
        from correrender_tpu.calculators.neural import (
            NeuralCorrelationCalculator,
        )
        from correrender_tpu.utils import fixtures

        data = fixtures.synth_box_ensemble(xs=8, ys=8, zs=4, members=30)
        grid = GridMetadata(xs=8, ys=8, zs=4, es=30)
        vd = VolumeData(grid)
        vd.add_field("data", lambda t, e: data[e])
        c = NeuralCorrelationCalculator(
            "data", reference_point=(2, 2, 2), train_steps=120,
        )
        c.model = CorrelationSRN.create(hidden=16, latent=8,
                                        num_frequencies=3)
        vd.add_calculator(c)
        f1 = np.asarray(vd.get_field(c.output_name))
        assert f1.shape == (4, 8, 8)
        assert np.isfinite(f1).all()
        c.set_reference_point(6, 6, 2)
        f2 = np.asarray(vd.get_field(c.output_name))
        assert not np.allclose(f1, f2)


class TestCheckpoint:
    def test_roundtrip_preserves_model(self, tmp_path):
        from correrender_tpu.models.checkpoint import (
            load_params,
            save_params,
        )

        model = CorrelationSRN.create(hidden=8, latent=4,
                                      num_frequencies=2)
        params = model.init(jax.random.key(0))
        path = str(tmp_path / "srn.npz")
        save_params(path, params)
        fresh = model.init(jax.random.key(1))  # different values
        restored = load_params(path, fresh)
        pr = jnp.ones((3, 3)) * 0.5
        a = model.apply(params, pr, pr * 0.2)
        b = model.apply(restored, pr, pr * 0.2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)

    def test_hash_grid_srn_config_roundtrip(self):
        # The hash-grid encoder option must survive the embedded
        # config array (presets carry it; no side-channel config).
        model = CorrelationSRN.create(
            hidden=16, latent=8, encoding="hash_grid",
            hash_levels=4, hash_log2_size=10, hash_base_res=3,
            hash_per_level_scale=1.4,
        )
        params = model.init(jax.random.key(0))
        rebuilt = CorrelationSRN.from_config_array(model.config_array())
        pr = jnp.full((5, 3), 0.4)
        a = model.apply(params, pr, pr * 0.5)
        b = rebuilt.apply(params, pr, pr * 0.5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
        enc = rebuilt.encoding
        assert type(enc).__name__ == "HashGridEncoding"
        assert (enc.num_levels, enc.log2_hashmap_size,
                enc.base_resolution) == (4, 10, 3)
        assert abs(enc.per_level_scale - 1.4) < 1e-9
        # Legacy 7-field (frequency-era) configs still load.
        legacy = CorrelationSRN.from_config_array(
            CorrelationSRN.create(hidden=16, latent=8).config_array()[:7]
        )
        assert type(legacy.encoding).__name__ == "FrequencyEncoding"

    def test_neural_calculator_field_program_invalidated(self, tmp_path):
        # compute() caches a jitted whole-field program; loading new
        # weights (possibly a different architecture) must rebuild it.
        from correrender_tpu.core import GridMetadata, VolumeData
        from correrender_tpu.calculators.neural import (
            NeuralCorrelationCalculator,
        )
        from correrender_tpu.utils import fixtures

        data = fixtures.synth_box_ensemble(xs=8, ys=8, zs=4, members=20)
        vd = VolumeData(GridMetadata(xs=8, ys=8, zs=4, es=20))
        vd.add_field("data", lambda t, e: data[e])
        c = NeuralCorrelationCalculator("data", train_steps=30)
        c.model = CorrelationSRN.create(hidden=8, latent=4,
                                        num_frequencies=2)
        vd.add_calculator(c)
        _ = np.asarray(vd.get_field(c.output_name))
        assert c._field_program is not None
        # Save under a DIFFERENT architecture and reload.
        c2 = NeuralCorrelationCalculator("data", train_steps=30)
        c2.model = CorrelationSRN.create(
            hidden=8, latent=4, encoding="hash_grid",
            hash_levels=2, hash_log2_size=8,
        )
        c2.params = c2.model.init(jax.random.key(0))
        path = str(tmp_path / "preset.npz")
        c2.save_weights(path)
        c.load_weights(path)
        assert c._field_program is None
        out = np.asarray(c.compute(0, 0))
        assert out.shape == (4, 8, 8) and np.isfinite(out).all()

    def test_missing_key_raises(self, tmp_path):
        from correrender_tpu.models.checkpoint import (
            load_params,
            save_params,
        )

        save_params(str(tmp_path / "p.npz"), {"a": jnp.ones(3)})
        with pytest.raises(KeyError):
            load_params(str(tmp_path / "p.npz"),
                        {"a": jnp.ones(3), "b": jnp.ones(2)})


class TestNeuralDepth:
    def test_weight_presets_roundtrip(self, tmp_path):
        import jax

        from correrender_tpu.calculators.neural import (
            NeuralCorrelationCalculator,
        )
        from correrender_tpu.models.mine import CorrelationSRN

        model = CorrelationSRN.create(hidden=16, latent=8,
                                      num_frequencies=2)
        c = NeuralCorrelationCalculator(field_name="q", model=model)
        c.params = model.init(jax.random.key(0))
        path = str(tmp_path / "w.npz")
        c.save_weights(path)
        c2 = NeuralCorrelationCalculator(field_name="q",
                                         weights_path=path)
        # Model rebuilt from the embedded config, params identical.
        assert c2.model.encoder.hidden == 16
        pr = np.ones((4, 3), np.float32) * 0.5
        a = np.asarray(c.model.apply(c.params, pr, pr))
        b = np.asarray(c2.model.apply(c2.params, pr, pr))
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_nan_stencil_masks_output(self):
        from correrender_tpu.calculators.neural import (
            NeuralCorrelationCalculator,
        )
        from correrender_tpu.core import GridMetadata, VolumeData
        from correrender_tpu.models.mine import CorrelationSRN

        rng = np.random.default_rng(0)
        data = rng.normal(size=(20, 4, 6, 6)).astype(np.float32)
        data[:, 1, 2, 3] = np.nan  # one invalid voxel series
        vd = VolumeData(GridMetadata(xs=6, ys=6, zs=4, ts=1, es=20))
        vd.add_field("q", lambda t, e: data[e])
        c = NeuralCorrelationCalculator(
            field_name="q", model=CorrelationSRN.create(
                hidden=8, latent=4, num_frequencies=2),
            train_steps=5, reference_point=(0, 0, 0),
        )
        vd.add_calculator(c)
        out = np.asarray(vd.get_field(c.output_name))
        assert np.isnan(out[1, 2, 3])
        assert np.isfinite(out[0, 0, 0])

    def test_mine_timeseries_heatmap(self):
        from correrender_tpu.diagrams.timeseries import (
            time_series_correlation,
        )

        rng = np.random.default_rng(0)
        t = 200
        a = rng.normal(size=t).astype(np.float32)
        series = np.stack([
            a,
            a * 0.95 + 0.1 * rng.normal(size=t),  # dependent on a
            rng.normal(size=t),  # independent
        ]).astype(np.float32)
        mi = time_series_correlation(series, estimator="mine",
                                     steps=150, hidden=16)
        assert mi.shape == (3, 3)
        # Dependent pair must score clearly above the independent one.
        assert mi[0, 1] > mi[0, 2] + 0.1
        assert np.allclose(mi, mi.T)


def test_hash_grid_scale_bit_exact_roundtrip():
    """per_level_scale rides the config array as a float64 bit pattern
    — a x1000 quantization could rebuild an encoding whose per-level
    table shapes (floor(base*scale^level)) mismatch the saved params
    (round-3 review). Legacy x1000 presets must still decode."""
    from correrender_tpu.models.mine import CorrelationSRN

    awkward = 1.60049  # straddles a floor boundary when quantized
    model = CorrelationSRN.create(
        hidden=16, latent=8, encoding="hash_grid",
        hash_levels=4, hash_log2_size=10, hash_base_res=3,
        hash_per_level_scale=awkward,
    )
    cfg = model.config_array()
    rebuilt = CorrelationSRN.from_config_array(cfg)
    assert rebuilt.encoding.per_level_scale == awkward  # bit-exact
    # Legacy encoding: small positive ints decode as value/1000.
    legacy_cfg = np.array(cfg, copy=True)
    legacy_cfg[12] = 1600
    legacy = CorrelationSRN.from_config_array(legacy_cfg)
    assert legacy.encoding.per_level_scale == pytest.approx(1.6)
