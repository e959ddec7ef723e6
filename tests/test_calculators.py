"""VolumeData / cache / calculator tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.core import GridMetadata, VolumeData
from correrender_tpu.core.cache import LRUFieldCache
from correrender_tpu import calculators as calc
from correrender_tpu.utils import fixtures


def make_volume(members=20, xs=8, ys=8, zs=4, seed=0):
    data = fixtures.synth_box_ensemble(
        xs=xs, ys=ys, zs=zs, members=members, seed=seed
    )
    grid = GridMetadata(xs=xs, ys=ys, zs=zs, ts=1, es=members)
    vd = VolumeData(grid)
    vd.add_field("data", lambda t, e: data[e])
    return vd, data


class TestCache:
    def test_lru_eviction(self):
        cache = LRUFieldCache(max_bytes=3 * 4 * 10)  # three 10-float slabs
        for i in range(4):
            cache.put(("f", 0, i), jnp.ones(10))
        assert ("f", 0, 0) not in cache
        assert ("f", 0, 3) in cache

    def test_lru_order_updates_on_get(self):
        cache = LRUFieldCache(max_bytes=2 * 4 * 10)
        cache.put(("f", 0, 0), jnp.ones(10))
        cache.put(("f", 0, 1), jnp.ones(10))
        cache.get(("f", 0, 0))  # refresh
        cache.put(("f", 0, 2), jnp.ones(10))
        assert ("f", 0, 0) in cache
        assert ("f", 0, 1) not in cache

    def test_invalidate_field(self):
        cache = LRUFieldCache()
        cache.put(("a", 0, 0), jnp.ones(4))
        cache.put(("b", 0, 0), jnp.ones(4))
        cache.invalidate_field("a")
        assert ("a", 0, 0) not in cache
        assert ("b", 0, 0) in cache

    def test_aux_token(self):
        cache = LRUFieldCache(max_bytes=100 * 4)
        with cache.reserve_auxiliary(200):
            cache.put(("f", 0, 0), jnp.ones(60))
            cache.put(("f", 0, 1), jnp.ones(60))
            # Budget shrunk to 200 bytes → only one 240-byte slab kept...
            assert len(cache) <= 1
        assert cache._aux_reserved == 0


class TestVolumeData:
    def test_lazy_access_and_cache(self):
        vd, data = make_volume()
        calls = []
        vd.add_field("counted", lambda t, e: (calls.append(e), data[e])[1])
        vd.get_field("counted", 0, 3)
        vd.get_field("counted", 0, 3)
        assert calls == [3]

    def test_member_stack_layout(self):
        vd, data = make_volume(members=5)
        stack = np.asarray(vd.get_member_stack("data"))
        assert stack.shape == (4, 8, 8, 5)
        np.testing.assert_allclose(stack[..., 2], data[2], rtol=1e-6)

    def test_unknown_field_raises(self):
        vd, _ = make_volume()
        with pytest.raises(KeyError):
            vd.get_field("nope")

    def test_min_max(self):
        vd, data = make_volume()
        mn, mx = vd.get_min_max("data", 0, 0)
        assert mn == pytest.approx(float(data[0].min()), rel=1e-6)
        assert mx == pytest.approx(float(data[0].max()), rel=1e-6)

    def test_render_box_normalized(self):
        grid = GridMetadata(xs=100, ys=50, zs=25)
        bmin, bmax = grid.render_box()
        np.testing.assert_allclose(bmax[0], 0.25, atol=1e-6)
        assert bmax[1] == pytest.approx(0.25 * 49 / 99, abs=1e-6)


class TestCalculators:
    def test_correlation_calculator_virtual_field(self):
        vd, data = make_volume(members=40)
        c = calc.CorrelationCalculator(
            field_name="data", measure="pearson", reference_point=(2, 2, 2)
        )
        vd.add_calculator(c)
        field = np.asarray(vd.get_field(c.output_name))
        assert field.shape == (4, 8, 8)
        assert field[2, 2, 2] == pytest.approx(1.0, abs=1e-5)

    def test_reference_point_move_invalidates(self):
        vd, _ = make_volume(members=30)
        c = calc.CorrelationCalculator(field_name="data",
                                       reference_point=(1, 1, 1))
        vd.add_calculator(c)
        f1 = np.asarray(vd.get_field(c.output_name))
        c.set_reference_point(5, 5, 2)
        f2 = np.asarray(vd.get_field(c.output_name))
        assert not np.allclose(f1, f2)
        assert f2[2, 5, 5] == pytest.approx(1.0, abs=1e-5)

    def test_symmetric_mode(self):
        vd, data = make_volume(members=30)
        vd.add_field("data2", lambda t, e: -np.asarray(
            fixtures.synth_box_ensemble(8, 8, 4, 30, seed=0)[e]))
        c = calc.CorrelationCalculator(
            field_name="data", field_name_ref="data2",
            symmetric_fields=True, measure="pearson",
        )
        vd.add_calculator(c)
        field = np.asarray(vd.get_field(c.output_name))
        # data2 = -data → per-voxel correlation −1 everywhere.
        np.testing.assert_allclose(field, -1.0, atol=1e-4)

    def test_ensemble_mean_spread(self):
        vd, data = make_volume(members=25)
        mean_c = calc.EnsembleMeanCalculator("data")
        spread_c = calc.EnsembleSpreadCalculator("data")
        vd.add_calculator(mean_c)
        vd.add_calculator(spread_c)
        mean = np.asarray(vd.get_field(mean_c.output_name))
        spread = np.asarray(vd.get_field(spread_c.output_name))
        np.testing.assert_allclose(mean, data.mean(axis=0), atol=1e-5)
        np.testing.assert_allclose(spread, data.std(axis=0), atol=1e-5)

    def test_binary_operator(self):
        vd, data = make_volume()
        c = calc.BinaryOperatorCalculator("data", "data", "sum")
        vd.add_calculator(c)
        out = np.asarray(vd.get_field(c.output_name))
        np.testing.assert_allclose(out, 2 * data[0], rtol=1e-6)

    def test_noise_reduction_smooths(self):
        rng = np.random.default_rng(0)
        noisy = rng.normal(size=(8, 16, 16)).astype(np.float32)
        grid = GridMetadata(xs=16, ys=16, zs=8)
        vd = VolumeData(grid)
        vd.add_field("f", lambda t, e: noisy)
        c = calc.NoiseReductionCalculator("f", sigma=2.0)
        vd.add_calculator(c)
        out = np.asarray(vd.get_field(c.output_name))
        assert out.std() < 0.5 * noisy.std()
        assert out.shape == noisy.shape

    def test_velocity_derived(self):
        # u = y → du/dy = 1; vorticity z-component = dv/dx − du/dy = −1.
        zs, ys, xs = 6, 6, 6
        z, y, x = np.meshgrid(
            np.arange(zs, dtype=np.float32),
            np.arange(ys, dtype=np.float32),
            np.arange(xs, dtype=np.float32),
            indexing="ij",
        )
        grid = GridMetadata(xs=xs, ys=ys, zs=zs)
        vd = VolumeData(grid)
        vd.add_field("u", lambda t, e: y)
        vd.add_field("v", lambda t, e: np.zeros_like(y))
        vd.add_field("w", lambda t, e: np.zeros_like(y))
        mag = calc.VelocityMagnitudeCalculator()
        vort = calc.VorticityCalculator()
        vd.add_calculator(mag)
        vd.add_calculator(vort)
        m = np.asarray(vd.get_field(mag.output_name))
        np.testing.assert_allclose(m, y, atol=1e-5)
        vt = np.asarray(vd.get_field(vort.output_name))
        np.testing.assert_allclose(vt[1:-1, 1:-1, 1:-1], 1.0, atol=1e-5)

    def test_set_predicate_fraction(self):
        vd, data = make_volume(members=10)
        c = calc.SetPredicateCalculator(
            "data", comparison="greater", aggregation="fraction",
            threshold=0.0,
        )
        vd.add_calculator(c)
        out = np.asarray(vd.get_field(c.output_name))
        want = (data > 0).mean(axis=0)
        np.testing.assert_allclose(out, want, atol=1e-6)

    def test_dkl_calculator(self):
        vd, _ = make_volume(members=60)
        c = calc.DKLCalculator("data", estimator="knn", k=3)
        vd.add_calculator(c)
        out = np.asarray(vd.get_field(c.output_name))
        assert out.shape == (4, 8, 8)
        assert np.isfinite(out).all()
        assert (out >= 0).all()

    def test_time_lag_absolute_reference_timestep(self):
        # Reference semantics (CorrelationCalculator.cpp:805-811):
        # use_time_lag_correlations pulls the reference series at the
        # ABSOLUTE timestep time_lag_time_step_idx, not time + lag.
        rng = np.random.default_rng(3)
        ts, es, zs, ys, xs = 4, 16, 2, 4, 4
        data = rng.normal(size=(ts, es, zs, ys, xs)).astype(np.float32)
        grid = GridMetadata(xs=xs, ys=ys, zs=zs, ts=ts, es=es)
        vd = VolumeData(grid)
        vd.add_field("data", lambda t, e: data[t, e])
        c = calc.CorrelationCalculator(
            field_name="data", measure="pearson",
            reference_point=(1, 2, 1), ensemble_mode=True,
            use_time_lag_correlations=True, time_lag_time_step_idx=3,
        )
        c.bind(vd)
        out = np.asarray(c.compute(time=1, member=0))
        # Expected: members at t=1 vs reference series at ABSOLUTE t=3.
        ref_series = data[3, :, 1, 2, 1]
        voxel = data[1, :, 0, 0, 0]
        expected = np.corrcoef(voxel, ref_series)[0, 1]
        np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-5)
        # Gate off → same-timestep correlation.
        c.use_time_lag_correlations = False
        vd.mark_dirty(c.output_name)
        out2 = np.asarray(c.compute(time=1, member=0))
        expected2 = np.corrcoef(voxel, data[1, :, 1, 2, 1])[0, 1]
        np.testing.assert_allclose(out2[0, 0, 0], expected2, atol=1e-5)

    def test_time_mode_lag_truncates_not_wraps(self):
        rng = np.random.default_rng(4)
        ts, zs, ys, xs = 12, 2, 3, 3
        data = rng.normal(size=(ts, zs, ys, xs)).astype(np.float32)
        grid = GridMetadata(xs=xs, ys=ys, zs=zs, ts=ts, es=1)
        vd = VolumeData(grid)
        vd.add_field("data", lambda t, e: data[t])
        lag = 3
        c = calc.CorrelationCalculator(
            field_name="data", measure="pearson",
            reference_point=(1, 1, 1), ensemble_mode=False, time_lag=lag,
        )
        c.bind(vd)
        out = np.asarray(c.compute(time=0, member=0))
        ref = data[:, 1, 1, 1]
        voxel = data[:, 0, 0, 0]
        # Truncated overlap: x_t vs ref_{t+lag}, NO circular wrap.
        expected = np.corrcoef(voxel[: ts - lag], ref[lag:])[0, 1]
        np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-5)
        wrapped = np.corrcoef(voxel, np.roll(ref, lag))[0, 1]
        assert abs(expected - wrapped) > 1e-4  # the old bug would match

    def test_settings_roundtrip(self):
        c = calc.CorrelationCalculator(
            field_name="data", measure="kendall",
            reference_point=(3, 2, 1), num_bins=40, k=5, absolute=True,
        )
        s = c.get_settings()
        c2 = calc.calculator_from_settings("correlation", s)
        assert c2.measure == c.measure
        assert c2.reference_point == (3, 2, 1)
        assert c2.num_bins == 40
        assert c2.k == 5
        assert c2.absolute is True

    def test_request_mode(self):
        from correrender_tpu.calculators.correlation import (
            correlate_requests,
        )

        vd, data = make_volume(members=30)
        stack = vd.get_member_stack("data")
        req_a = jnp.asarray([[0, 0, 0], [1, 2, 3]])
        req_b = jnp.asarray([[0, 0, 0], [3, 2, 1]])
        out = np.asarray(correlate_requests(stack, req_a, req_b, "pearson"))
        assert out.shape == (2,)
        assert out[0] == pytest.approx(1.0, abs=1e-5)

    def test_request_mode_flat_indices_match_coords(self):
        # Flat indices and (z, y, x) coords hit the same jitted
        # program family and must agree.
        from correrender_tpu.calculators.correlation import (
            correlate_requests,
        )

        vd, data = make_volume(members=30)
        stack = vd.get_member_stack("data")
        zs, ys, xs = stack.shape[:3]
        coords = jnp.asarray([[1, 2, 3], [0, 1, 1], [2, 0, 2]])
        flat = coords[:, 0] * ys * xs + coords[:, 1] * xs + coords[:, 2]
        ref = jnp.asarray([[0, 0, 0]] * 3)
        a = np.asarray(correlate_requests(stack, coords, ref, "spearman"))
        b = np.asarray(correlate_requests(stack, flat, ref, "spearman"))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_request_mode_separate_stack_b(self):
        from correrender_tpu.calculators.correlation import (
            correlate_requests,
        )

        vd, data = make_volume(members=30)
        stack = np.asarray(vd.get_member_stack("data"))
        stack_b = -stack  # perfectly anti-correlated second field
        req = jnp.asarray([[1, 1, 1], [2, 2, 2]])
        out = np.asarray(
            correlate_requests(
                stack, req, req, "pearson", stack_b=jnp.asarray(stack_b)
            )
        )
        np.testing.assert_allclose(out, [-1.0, -1.0], atol=1e-5)

    def test_request_mode_unhashable_kwargs_fall_back(self):
        # Array mi_bounds cannot key the program cache; the eager
        # path must produce the same values as hashable bounds.
        from correrender_tpu.calculators.correlation import (
            correlate_requests,
        )

        vd, data = make_volume(members=30)
        stack = vd.get_member_stack("data")
        req = jnp.asarray([[1, 2, 3], [3, 2, 1]])
        ref = jnp.asarray([[0, 0, 0]] * 2)
        lo = float(jnp.min(stack))
        hi = float(jnp.max(stack))
        hashable = np.asarray(correlate_requests(
            stack, req, ref, "mi_binned", num_bins=16,
            mi_bounds=((lo, hi), (lo, hi)),
        ))
        arrays = np.asarray(correlate_requests(
            stack, req, ref, "mi_binned", num_bins=16,
            mi_bounds=((jnp.asarray(lo), jnp.asarray(hi)),
                       (jnp.asarray(lo), jnp.asarray(hi))),
        ))
        np.testing.assert_allclose(hashable, arrays, atol=1e-5)


def test_bf16_member_stacks():
    # format_cast float16 → bf16 member stacks (half the HBM
    # residency); estimators accumulate in f32 and stay accurate to
    # bf16 input precision.
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    es, zs, ys, xs = 40, 4, 6, 6
    data = rng.normal(size=(es, zs, ys, xs)).astype(np.float32)
    grid = GridMetadata(xs=xs, ys=ys, zs=zs, ts=1, es=es)
    vd = VolumeData(grid, member_stack_dtype=jnp.bfloat16)
    vd.add_field("q", lambda t, e: data[e])
    stack = vd.get_member_stack("q")
    assert stack.dtype == jnp.bfloat16
    c = calc.CorrelationCalculator(field_name="q",
                                   reference_point=(2, 3, 1))
    vd.add_calculator(c)
    out = np.asarray(vd.get_field(c.output_name))
    ref_series = data[:, 1, 3, 2]
    want = np.corrcoef(data.reshape(es, -1).T, ref_series)[:-1, -1]
    np.testing.assert_allclose(out.reshape(-1), want, atol=0.02)
    assert out[1, 3, 2] == pytest.approx(1.0, abs=1e-2)


class TestReviewRegressions:
    """Round-3 self-review findings (core/calculators)."""

    def test_default_field_names_compute(self):
        # CorrelationCalculator() with no field_name must fall back to
        # the dataset's first field for BOTH query and reference
        # (crashed with KeyError: None).
        vd, _ = make_volume(members=30)
        c = calc.CorrelationCalculator(reference_point=(2, 2, 2))
        vd.add_calculator(c)
        field = np.asarray(vd.get_field(c.output_name))
        assert field[2, 2, 2] == pytest.approx(1.0, abs=1e-5)

    def test_input_dirty_propagates_to_calculator(self):
        # Re-registering an input field must invalidate dependent
        # calculator outputs (stale-cache finding).
        vd, _ = make_volume(members=30)
        c = calc.CorrelationCalculator(field_name="data",
                                       reference_point=(1, 1, 1))
        vd.add_calculator(c)
        f1 = np.asarray(vd.get_field(c.output_name))
        epoch = vd.dirty_epoch(c.output_name)
        new = np.asarray(
            fixtures.synth_box_ensemble(8, 8, 4, 30, seed=9))
        vd.add_field("data", lambda t, e: new[e])
        assert vd.dirty_epoch(c.output_name) > epoch
        f2 = np.asarray(vd.get_field(c.output_name))
        assert not np.allclose(f1, f2)

    def test_rename_field_moves_registry_and_invalidates(self):
        # VolumeData.rename_field: measure changes rename a default-
        # named calculator's output (reference renames the field);
        # both names' caches/epochs must invalidate and order persist.
        vd, _ = make_volume(members=30)
        c = calc.CorrelationCalculator(reference_point=(1, 1, 1))
        vd.add_calculator(c)
        old = c.output_name
        f1 = np.asarray(vd.get_field(old))
        from correrender_tpu.ops.registry import measure_from_id

        c.measure = measure_from_id("kendall")
        new = c.output_name
        assert new != old
        vd.rename_field(old, new)
        assert old not in vd.field_names
        assert vd.calculators[new] is c
        # Registry order preserved: the data field stays first.
        assert vd.field_names[0] == "data"
        f2 = np.asarray(vd.get_field(new))
        assert not np.allclose(f1, f2)  # kendall, not stale pearson
        with pytest.raises(KeyError):
            vd.rename_field("nope", "x")
        vd.add_field("other", lambda t, e: None)
        with pytest.raises(ValueError):
            vd.rename_field(new, "other")

    def test_settings_roundtrip_field_mode(self):
        # symmetric_fields / field_name_ref / time_lag must survive a
        # get_settings -> settings_to_kwargs round-trip.
        c = calc.CorrelationCalculator(
            field_name="a", field_name_ref="b", symmetric_fields=True,
        )
        kw = calc.CorrelationCalculator.settings_to_kwargs(
            c.get_settings()
        )
        assert kw["symmetric_fields"] is True
        assert kw["field_name_ref"] == "b"

        c2 = calc.CorrelationCalculator(
            field_name="a", field_name_ref="b", ensemble_mode=False,
            time_lag=3,
        )
        kw2 = calc.CorrelationCalculator.settings_to_kwargs(
            c2.get_settings()
        )
        assert kw2["time_lag"] == 3
        assert kw2["symmetric_fields"] is False
        assert kw2["field_name_ref"] == "b"


class TestSlabFlatten:
    def test_slabbed_field_matches_direct(self, monkeypatch):
        # Past the eager-flatten threshold correlate_field slices the
        # stack in Z-slabs (the full (V, n) reshape retiles on TPU and
        # OOM'd at 250^3x100); values must match the direct path
        # exactly, including the global binned-MI bounds and the
        # SEPARATE_SYMMETRIC per-voxel-ref mode.
        import correrender_tpu.calculators.correlation as cc

        rng = np.random.default_rng(0)
        stack = rng.standard_normal((9, 6, 5, 20)).astype(np.float32)
        other = rng.standard_normal((9, 6, 5, 20)).astype(np.float32)
        ref = stack[4, 3, 2]
        direct = {}
        for meas in ("pearson", "mi_binned"):
            direct[meas] = np.asarray(
                cc.correlate_field(jnp.asarray(stack), jnp.asarray(ref),
                                   meas))
        direct_sym = np.asarray(
            cc.correlate_field(jnp.asarray(stack), jnp.asarray(other),
                               "pearson"))
        # Force slabbing: threshold below the stack size, slab = a few
        # Z planes (non-dividing remainder on purpose: 9 % 2 = 1).
        monkeypatch.setattr(cc, "_FLAT_SLAB_BYTES",
                            2 * 6 * 5 * 20 * 4)
        for meas in ("pearson", "mi_binned"):
            slabbed = np.asarray(
                cc.correlate_field(jnp.asarray(stack), jnp.asarray(ref),
                                   meas))
            np.testing.assert_allclose(slabbed, direct[meas], atol=1e-6)
        slabbed_sym = np.asarray(
            cc.correlate_field(jnp.asarray(stack), jnp.asarray(other),
                               "pearson"))
        np.testing.assert_allclose(slabbed_sym, direct_sym, atol=1e-6)
        # A per-voxel ref may also arrive pre-flattened to (V, n);
        # the slab path must slice the matching rows, not Z planes.
        slabbed_flat = np.asarray(
            cc.correlate_field(jnp.asarray(stack),
                               jnp.asarray(other.reshape(-1, 20)),
                               "pearson"))
        np.testing.assert_allclose(slabbed_flat, direct_sym, atol=1e-6)

    def test_chunk_remainder_padding(self):
        # _correlate_chunked pads only the remainder chunk; a V that
        # does not divide the chunk must still give exact results.
        import correrender_tpu.calculators.correlation as cc

        rng = np.random.default_rng(1)
        series = rng.standard_normal((37, 16)).astype(np.float32)
        ref = rng.standard_normal(16).astype(np.float32)
        full = np.asarray(cc._correlate_chunked(
            jnp.asarray(series), jnp.asarray(ref),
            cc.CorrelationMeasure.PEARSON, 80, 3, 1, False, 37, None))
        chunked = np.asarray(cc._correlate_chunked(
            jnp.asarray(series), jnp.asarray(ref),
            cc.CorrelationMeasure.PEARSON, 80, 3, 1, False, 8, None))
        np.testing.assert_allclose(chunked, full, atol=1e-6)


class TestAllTypesSettingsRoundtrip:
    """Every registered calculator type must survive
    get_settings -> from_settings (round-3 review: five types emitted
    reference state-file keys their __init__ did not accept, so every
    saved state containing them crashed on load)."""

    def test_every_registered_type(self):
        from correrender_tpu.calculators import base as cal_base
        from correrender_tpu.calculators.base import (
            calculator_from_settings,
        )

        samples = {
            "ensemble_mean": dict(field_name="f"),
            "ensemble_spread": dict(field_name="f"),
            "set_predicate": dict(field_name="f", comparison="greater",
                                  threshold=0.4),
            "residual_color": dict(field_name_a="f", field_name_b="g"),
            "dkl": dict(field_name="f", estimator="knn", num_bins=40,
                        k=5),
            "noise_reduction": dict(field_name="f", sigma=1.5),
        }
        for type_id, cls in sorted(cal_base._TYPE_REGISTRY.items()):
            kwargs = samples.get(type_id)
            if kwargs is None:
                try:
                    calc = cls()
                except TypeError:
                    continue  # needs data-dependent args; covered
                    # by the dedicated roundtrip tests.
            else:
                calc = cls(**kwargs)
            settings = calc.get_settings()
            rebuilt = calculator_from_settings(type_id, dict(settings))
            assert rebuilt.get_settings() == settings, type_id


class TestRound3CoreReviewFixes:
    def test_min_max_survives_eviction(self):
        # Eviction frees memory but does not change data: the two-float
        # min/max side cache must survive it, or ensembles past the
        # budget reload every slab per global-min/max pass (round-3
        # review). invalidate_field (a data change) still clears it.
        cache = LRUFieldCache(max_bytes=2 * 4 * 10)
        cache.put(("f", 0, 0), jnp.ones(10))
        cache.put_min_max(("f", 0, 0), (0.0, 1.0))
        cache.put(("f", 0, 1), jnp.ones(10))
        cache.put(("f", 0, 2), jnp.ones(10))  # evicts ("f", 0, 0)
        assert ("f", 0, 0) not in cache
        assert cache.get_min_max(("f", 0, 0)) == (0.0, 1.0)
        cache.invalidate_field("f")
        assert cache.get_min_max(("f", 0, 0)) is None

    def test_time_stack_cached_and_staged(self):
        import numpy as np

        ts = 4
        grid = GridMetadata(xs=4, ys=4, zs=2, ts=ts, es=1)
        vd = VolumeData(grid, member_stack_dtype=jnp.bfloat16)
        vols = [np.full((2, 4, 4), float(t), np.float32)
                for t in range(ts)]
        calls = []
        vd.add_field("f", lambda t, e: (calls.append(t), vols[t])[1])
        a = vd.get_time_stack("f")
        b = vd.get_time_stack("f")
        assert a.dtype == jnp.bfloat16
        assert b is a  # cached, not re-stacked per call
        assert calls.count(0) == 1

    def test_noise_sigma_zero_is_identity(self):
        from correrender_tpu.calculators.noise import gaussian_blur_3d

        import numpy as np

        vol = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 6, 6))
            .astype(np.float32))
        out = np.asarray(gaussian_blur_3d(vol, sigma=0.0))
        np.testing.assert_allclose(out, np.asarray(vol))

    def test_neural_stencil_and_params_rekey_on_field_change(self):
        import numpy as np

        members, xs, ys, zs = 8, 6, 6, 4
        rng = np.random.default_rng(2)
        a = rng.normal(size=(members, zs, ys, xs)).astype(np.float32)
        b = rng.normal(size=(members, zs, ys, xs)).astype(np.float32)
        b[:, 0, 0, 0] = np.nan  # field b has a NaN voxel series
        grid = GridMetadata(xs=xs, ys=ys, zs=zs, ts=1, es=members)
        vd = VolumeData(grid)
        vd.add_field("a", lambda t, e: a[e])
        vd.add_field("b", lambda t, e: b[e])
        from correrender_tpu.calculators.neural import (
            NeuralCorrelationCalculator,
        )

        neural = NeuralCorrelationCalculator(
            field_name="a", train_steps=4)
        vd.add_calculator(neural)
        out_a = np.asarray(neural.compute(0, 0))
        assert np.isfinite(out_a).all()
        key_a = neural._fit_key
        neural.field_name = "b"  # the viewer writes it directly
        out_b = np.asarray(neural.compute(0, 0))
        # Retrained for the new field, and the stale field-a stencil
        # did not leak: b's NaN voxel is masked.
        assert neural._fit_key != key_a
        assert np.isnan(out_b[0, 0, 0])
        assert np.isfinite(out_b[1, 1, 1])
