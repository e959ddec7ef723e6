"""Transfer-function optimization + solver tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.optim import (
    TFOptimizer,
    optimize_tf_ols,
    optimize_tf_gd,
    optimize_tf_diffdvr,
    cgls,
    lsqr,
    solve_nonneg,
)
from correrender_tpu.optim.solvers import solve_dense
from correrender_tpu.render import Camera, TransferFunction
from correrender_tpu.render.classify import classify


class TestSolvers:
    @pytest.fixture
    def system(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.normal(size=(120, 30)).astype(np.float32))
        x_true = jnp.asarray(rng.uniform(size=30).astype(np.float32))
        b = a @ x_true
        return a, x_true, b

    def test_cgls(self, system):
        a, x_true, b = system
        x = cgls(a, b, iters=60)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   atol=1e-3)

    def test_lsqr(self, system):
        a, x_true, b = system
        x = lsqr(a, b, iters=60)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   atol=1e-3)

    @pytest.mark.parametrize("method", ["lu", "cholesky", "qr", "svd"])
    def test_dense(self, system, method):
        a, x_true, b = system
        x = solve_dense(a.T @ a, a.T @ b, method)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   atol=1e-2)

    def test_nonneg(self, system):
        a, x_true, b = system
        x = solve_nonneg(a.T @ a, a.T @ b, iters=500)
        assert (np.asarray(x) >= 0).all()
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   atol=5e-2)


def _paired_fields(n=16):
    """field_b is a monotone remap of field_a → an exact TF exists."""
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(n, n, n)).astype(np.float32)
    b = np.sqrt(a)  # monotone transform
    return jnp.asarray(a), jnp.asarray(b)


def _tf_a():
    return TransferFunction.from_colormap(
        "viridis", domain=(0.0, 1.0),
        opacity_points=((0.0, 0.1), (1.0, 0.9)),
    )


def _voxel_match_error(field_a, tf_a, field_b, tf_b):
    want = np.asarray(
        classify(field_a.reshape(-1), tf_a.lut,
                 jnp.asarray(tf_a.domain, jnp.float32), premultiply=False)
    )
    got = np.asarray(
        classify(field_b.reshape(-1), tf_b.lut,
                 jnp.asarray(tf_b.domain, jnp.float32), premultiply=False)
    )
    return np.abs(got - want).mean()


class TestOLS:
    def test_recovers_remapped_tf(self):
        a, b = _paired_fields()
        tf_a = _tf_a()
        tf_b = optimize_tf_ols(a, tf_a, b, tf_size=64)
        err = _voxel_match_error(a, tf_a, b, tf_b)
        assert err < 0.02

    @pytest.mark.parametrize("solver", ["cholesky", "cgls", "lsqr"])
    def test_solvers(self, solver):
        a, b = _paired_fields(8)
        tf_b = optimize_tf_ols(a, _tf_a(), b, tf_size=32, solver=solver,
                               nonneg=False)
        err = _voxel_match_error(a, _tf_a(), b, tf_b)
        assert err < 0.05

    def test_lut_in_range(self):
        a, b = _paired_fields(8)
        tf_b = optimize_tf_ols(a, _tf_a(), b, tf_size=32)
        lut = np.asarray(tf_b.lut)
        assert (lut >= 0).all() and (lut <= 1).all()


class TestGD:
    def test_recovers_remapped_tf(self):
        a, b = _paired_fields(12)
        tf_a = _tf_a()
        tf_b = optimize_tf_gd(a, tf_a, b, tf_size=32, epochs=300)
        err = _voxel_match_error(a, tf_a, b, tf_b)
        assert err < 0.05


class TestDiffDVR:
    def test_image_loss_decreases(self):
        from correrender_tpu.render.dvr import dvr_render

        a, b = _paired_fields(12)
        tf_a = _tf_a()
        cam = Camera(position=(0.0, 0.1, 0.8))
        tf_b = optimize_tf_diffdvr(
            a, tf_a, b, cam, tf_size=16, epochs=30, image_size=(32, 32)
        )
        target = np.asarray(
            dvr_render(a, cam, tf_a, image_size=(32, 32))
        )
        got = np.asarray(dvr_render(b, cam, tf_b, image_size=(32, 32)))
        init = np.asarray(
            dvr_render(
                b, cam,
                TransferFunction(lut=jnp.full((16, 4), 0.5),
                                 domain=tf_b.domain),
                image_size=(32, 32),
            )
        )
        err_opt = np.abs(got - target).mean()
        err_init = np.abs(init - target).mean()
        assert err_opt < 0.5 * err_init


class TestHarness:
    def test_method_dispatch_and_size_check(self):
        a, b = _paired_fields(8)
        opt = TFOptimizer(method="ols", tf_size=32)
        tf_b = opt.run(a, _tf_a(), b)
        assert tf_b.lut.shape == (32, 4)
        with pytest.raises(ValueError):
            TFOptimizer(tf_size=33).run(a, _tf_a(), b)
        with pytest.raises(ValueError):
            TFOptimizer(method="diffdvr").run(a, _tf_a(), b)


class TestWorker:
    def test_async_request_reply(self):
        from correrender_tpu.optim import TFOptimizationWorker, TFOptimizer

        a, b = _paired_fields(8)
        worker = TFOptimizationWorker()
        try:
            opt = TFOptimizer()
            opt.tf_size = 32
            r0 = worker.queue_request(opt, a, _tf_a(), b)
            r1 = worker.queue_request(opt, a, _tf_a(), b)
            got = {}
            for _ in range(2):
                req_id, tf_b = worker.get_reply(block=True, timeout=60)
                got[req_id] = tf_b
            assert set(got) == {r0, r1}
            err = _voxel_match_error(a, _tf_a(), b, got[r0])
            assert err < 0.05
            # Queue drained: nothing left to poll.
            assert worker.get_reply() is None
        finally:
            worker.shutdown()

    def test_error_propagates_to_caller(self):
        from correrender_tpu.optim import TFOptimizationWorker, TFOptimizer

        a, b = _paired_fields(8)
        worker = TFOptimizationWorker()
        try:
            opt = TFOptimizer()
            opt.tf_size = 7  # not in POSSIBLE_TF_SIZES
            worker.queue_request(opt, a, _tf_a(), b)
            with pytest.raises(ValueError):
                worker.get_reply(block=True, timeout=30)
        finally:
            worker.shutdown()


class TestRound3ReviewFixes:
    def test_constant_field_b_yields_finite_lut(self):
        # Degenerate domain (hi == lo): 0/0 weights previously NaN'd
        # the whole fitted LUT for every method.
        a, _ = _paired_fields(8)
        b = jnp.zeros_like(a)
        for fit in (optimize_tf_ols, optimize_tf_gd):
            tf_b = fit(a, _tf_a(), b, tf_size=16)
            assert np.isfinite(np.asarray(tf_b.lut)).all(), fit.__name__

    def test_slab_accumulation_matches_single_shot(self, monkeypatch):
        # Fields past the dense-weight budget accumulate the normal
        # equations in voxel slabs; the fit must be identical.
        from correrender_tpu.optim import tf_opt

        a, b = _paired_fields(8)
        one = optimize_tf_ols(a, _tf_a(), b, tf_size=32, nonneg=False)
        monkeypatch.setattr(tf_opt, "_DENSE_WEIGHT_ELEMS", 2048)
        slabbed = optimize_tf_ols(a, _tf_a(), b, tf_size=32,
                                  nonneg=False)
        np.testing.assert_allclose(np.asarray(one.lut),
                                   np.asarray(slabbed.lut), atol=2e-5)

    def test_iterative_solver_past_budget_uses_normal_eqs(
            self, monkeypatch):
        from correrender_tpu.optim import tf_opt

        a, b = _paired_fields(8)
        monkeypatch.setattr(tf_opt, "_DENSE_WEIGHT_ELEMS", 2048)
        tf_b = optimize_tf_ols(a, _tf_a(), b, tf_size=32,
                               solver="cgls", nonneg=False)
        err = _voxel_match_error(a, _tf_a(), b, tf_b)
        assert err < 0.05

    def test_unknown_optimizer_and_loss_raise(self):
        a, b = _paired_fields(6)
        with pytest.raises(ValueError, match="optimizer"):
            optimize_tf_gd(a, _tf_a(), b, tf_size=8,
                           optimizer="Adam")
        cam = Camera(position=(0.1, 0.2, 0.9))
        with pytest.raises(ValueError, match="loss"):
            optimize_tf_diffdvr(a, _tf_a(), b, cam, tf_size=8,
                                loss="L1")

    def test_worker_closed_and_error_id(self):
        from correrender_tpu.optim.tf_opt import (
            TFOptimizationWorker,
            TFOptimizer,
        )

        w = TFOptimizationWorker()
        a, b = _paired_fields(4)
        # A failing fit's exception carries the request id.
        rid = w.queue_request(
            TFOptimizer(method="diffdvr"), a, _tf_a(), b)  # no camera
        with pytest.raises(ValueError) as exc:
            while True:
                r = w.get_reply(block=True, timeout=10)
                if r is not None:
                    break
        assert exc.value.request_id == rid
        w.shutdown()
        with pytest.raises(RuntimeError, match="shutdown"):
            w.queue_request(TFOptimizer(), a, _tf_a(), b)
