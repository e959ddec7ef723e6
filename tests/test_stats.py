"""Estimator correctness vs scipy/numpy references.

Mirrors the reference's math (src/Calculators/Correlation.cpp,
MutualInformation.cpp, DKL.cpp) — validated against independent scipy
implementations and hand-computed reference semantics.
"""

import numpy as np
import pytest
import scipy.stats
import scipy.special

import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.utils import fixtures


@pytest.fixture(scope="module")
def series():
    rng = np.random.default_rng(42)
    n = 100
    x = rng.normal(size=n).astype(np.float32)
    y = (0.7 * x + 0.3 * rng.normal(size=n)).astype(np.float32)
    return x, y


class TestPearson:
    def test_matches_scipy(self, series):
        x, y = series
        got = float(ops.pearson(jnp.asarray(x), jnp.asarray(y)))
        want = scipy.stats.pearsonr(x, y).statistic
        assert got == pytest.approx(want, abs=2e-5)

    def test_batched(self, series):
        x, y = series
        ys = np.stack([y, -y, x])
        got = np.asarray(ops.pearson(jnp.asarray(x), jnp.asarray(ys)))
        for i, row in enumerate(ys):
            want = scipy.stats.pearsonr(x, row).statistic
            assert got[i] == pytest.approx(want, abs=2e-5)

    def test_perfect_correlation(self):
        x = np.linspace(-1, 1, 50, dtype=np.float32)
        assert float(ops.pearson(jnp.asarray(x), jnp.asarray(2 * x + 1))) == (
            pytest.approx(1.0, abs=1e-5)
        )
        assert float(ops.pearson(jnp.asarray(x), jnp.asarray(-x))) == (
            pytest.approx(-1.0, abs=1e-5)
        )


class TestRanks:
    def test_matches_scipy_rankdata(self):
        rng = np.random.default_rng(0)
        v = rng.normal(size=37).astype(np.float32)
        got = np.asarray(ops.fractional_ranks(jnp.asarray(v)))
        want = scipy.stats.rankdata(v)
        np.testing.assert_allclose(got, want)

    def test_ties_averaged(self):
        v = np.array([3.0, 1.0, 3.0, 2.0, 3.0], np.float32)
        got = np.asarray(ops.fractional_ranks(jnp.asarray(v)))
        want = scipy.stats.rankdata(v)  # [4, 1, 4, 2, 4]
        np.testing.assert_allclose(got, want)

    def test_batched(self):
        rng = np.random.default_rng(1)
        v = rng.integers(0, 5, size=(4, 20)).astype(np.float32)
        got = np.asarray(ops.fractional_ranks(jnp.asarray(v)))
        for i in range(4):
            np.testing.assert_allclose(got[i], scipy.stats.rankdata(v[i]))


class TestSpearman:
    def test_matches_scipy(self, series):
        x, y = series
        got = float(ops.spearman(jnp.asarray(x), jnp.asarray(y)))
        want = scipy.stats.spearmanr(x, y).statistic
        assert got == pytest.approx(want, abs=2e-5)

    def test_with_ties(self):
        rng = np.random.default_rng(3)
        x = rng.integers(0, 8, size=60).astype(np.float32)
        y = rng.integers(0, 8, size=60).astype(np.float32)
        got = float(ops.spearman(jnp.asarray(x), jnp.asarray(y)))
        want = scipy.stats.spearmanr(x, y).statistic
        assert got == pytest.approx(want, abs=2e-5)


class TestKendall:
    def test_matches_scipy(self, series):
        x, y = series
        got = float(ops.kendall(jnp.asarray(x), jnp.asarray(y)))
        want = scipy.stats.kendalltau(x, y).statistic
        assert got == pytest.approx(want, abs=2e-5)

    def test_with_ties_no_joint_ties(self):
        # Ties within x and within y, but no pair tied in both — where
        # the reference's n3=0 simplification is exact.
        x = np.array([1, 1, 2, 3, 4, 5, 6, 7], np.float32)
        y = np.array([2, 3, 1, 5, 4, 7, 6, 8], np.float32)
        got = float(ops.kendall(jnp.asarray(x), jnp.asarray(y)))
        want = scipy.stats.kendalltau(x, y).statistic
        assert got == pytest.approx(want, abs=2e-5)

    def test_joint_ties_match_reference_convention(self):
        # Quantized data where pairs tie in BOTH variables: the
        # reference forces n3 = 0 (Correlation.cpp:444), so its tau
        # differs from scipy's C−D numerator by n3. We must match the
        # reference, not scipy.
        rng = np.random.default_rng(7)
        x = rng.integers(0, 4, size=40).astype(np.float32)
        y = (x + rng.integers(0, 3, size=40)).astype(np.float32)

        def reference_tau(x, y):
            n = len(x)
            num = n1 = n2 = n3 = 0.0
            for i in range(n):
                for j in range(i + 1, n):
                    dx, dy = x[i] - x[j], y[i] - y[j]
                    num += np.sign(dx) * np.sign(dy)
                    n1 += dx == 0
                    n2 += dy == 0
                    n3 += (dx == 0) and (dy == 0)
            n0 = n * (n - 1) / 2
            # num == n0-n1-n2+n3-2S; reference numerator drops n3.
            return (num - n3) / (np.sqrt(n0 - n1) * np.sqrt(n0 - n2))

        want = reference_tau(x, y)
        got = float(ops.kendall(jnp.asarray(x), jnp.asarray(y)))
        assert got == pytest.approx(want, abs=2e-5)
        # Sanity: the convention actually diverges from scipy here.
        assert abs(want - scipy.stats.kendalltau(x, y).statistic) > 1e-4

        from correrender_tpu.ops.pallas.kendall_kernel import kendall_pallas

        got_pl = float(kendall_pallas(jnp.asarray(x)[None, :],
                                      jnp.asarray(y))[0])
        assert got_pl == pytest.approx(want, abs=2e-5)

    def test_chunking_invariance(self, series):
        x, y = series
        a = float(ops.kendall(jnp.asarray(x), jnp.asarray(y), chunk=7))
        b = float(ops.kendall(jnp.asarray(x), jnp.asarray(y), chunk=100))
        assert a == pytest.approx(b, abs=1e-6)

    def test_perfect(self):
        x = np.arange(30, dtype=np.float32)
        assert float(ops.kendall(jnp.asarray(x), jnp.asarray(x * 2))) == (
            pytest.approx(1.0)
        )
        assert float(ops.kendall(jnp.asarray(x), jnp.asarray(-x))) == (
            pytest.approx(-1.0)
        )

    def test_large_n_int32_accumulation(self):
        # Past n ≈ 4000 the f32 pair counts round (tau(x, x) drifts
        # below 1 — the bug that motivated the old 4000-sample cap);
        # the auto int32 path stays exact to n ≤ 46340.
        rng = np.random.default_rng(7)
        n = 6000
        x = rng.standard_normal(n).astype(np.float32)
        y = (0.5 * x + rng.standard_normal(n)).astype(np.float32)
        # Exact counts; the final f32 sqrt(a)*sqrt(a) denominator can
        # still sit 1 ulp off a, so tau(x, x) is 1 within one ulp.
        assert float(ops.kendall(jnp.asarray(x), jnp.asarray(x))) == (
            pytest.approx(1.0, abs=1.2e-7)
        )
        got = float(ops.kendall(jnp.asarray(x), jnp.asarray(y)))
        want = scipy.stats.kendalltau(x, y).statistic
        assert got == pytest.approx(want, abs=2e-6)
        # Integer accumulation must not swallow NaN semantics.
        x_nan = x.copy()
        x_nan[17] = np.nan
        assert np.isnan(float(ops.kendall(jnp.asarray(x_nan),
                                          jnp.asarray(y))))

    def test_overflow_guard(self):
        x = jnp.zeros(46341, jnp.float32)
        with pytest.raises(ValueError, match="overflows int32"):
            ops.kendall(x, x)


def _mi_binned_reference(x, y, num_bins, n):
    """Direct numpy transliteration of the reference semantics
    (MutualInformation.cpp:45-143) for test comparison."""
    bx = np.clip((x * num_bins).astype(int), 0, num_bins - 1)
    by = np.clip((y * num_bins).astype(int), 0, num_bins - 1)
    hist = np.zeros((num_bins, num_bins))
    for i, j in zip(bx, by):
        hist[i, j] += 1
    p = hist / hist.sum()
    px = p.sum(axis=1)
    py = p.sum(axis=0)
    eps1, eps2 = 0.5 / n, 0.5 / n**2
    mi = 0.0
    mi -= np.sum(px[px > eps1] * np.log(px[px > eps1]))
    mi -= np.sum(py[py > eps1] * np.log(py[py > eps1]))
    mi += np.sum(p[p > eps2] * np.log(p[p > eps2]))
    return mi


class TestBinnedMI:
    def test_matches_reference_semantics(self, series):
        x, y = series
        xn = (x - x.min()) / (x.max() - x.min())
        yn = (y - y.min()) / (y.max() - y.min())
        got = float(
            ops.mutual_information_binned(
                jnp.asarray(xn), jnp.asarray(yn), num_bins=20
            )
        )
        want = _mi_binned_reference(xn, yn, 20, len(x))
        assert got == pytest.approx(want, abs=1e-4)

    def test_independent_near_zero_dependent_high(self):
        rng = np.random.default_rng(7)
        n = 2000
        a = rng.uniform(size=n).astype(np.float32)
        b = rng.uniform(size=n).astype(np.float32)
        mi_ind = float(
            ops.mutual_information_binned(jnp.asarray(a), jnp.asarray(b), 20)
        )
        mi_dep = float(
            ops.mutual_information_binned(jnp.asarray(a), jnp.asarray(a), 20)
        )
        assert mi_ind < 0.2
        assert mi_dep > 2.0

    def test_correlation_coefficient_bounds(self):
        from correrender_tpu.ops.mi_binned import (
            binned_mi_correlation_coefficient,
        )

        cc = binned_mi_correlation_coefficient(jnp.asarray([0.0, 0.5, 10.0]))
        cc = np.asarray(cc)
        assert cc[0] == pytest.approx(0.0)
        assert 0 < cc[1] < 1
        assert cc[2] == pytest.approx(1.0, abs=1e-4)


def _ksg_reference(x, y, k, est=1):
    """Independent numpy KSG implementation (NPEET-style) mirroring the
    reference's interval semantics, without noise."""
    n = len(x)
    dx = np.abs(x[:, None] - x[None, :])
    dy = np.abs(y[:, None] - y[None, :])
    d = np.maximum(dx, dy)
    psi = scipy.special.digamma
    if est == 1:
        kth = np.sort(d, axis=1)[:, k]  # k+1 smallest incl. self
        a = b = 0.0
        for i in range(n):
            r = kth[i] - 1e-6
            cx = max(np.sum((x >= x[i] - r) & (x < x[i] + r)), 1)
            cy = max(np.sum((y >= y[i] - r) & (y < y[i] + r)), 1)
            a += psi(cx) / n
            b += psi(cy) / n
        return max(-a - b + psi(k) + psi(n), 0.0)
    else:
        idx = np.argsort(d, axis=1)[:, : k + 1]
        a = b = 0.0
        for i in range(n):
            ex = dx[i, idx[i]].max() + 1e-6
            ey = dy[i, idx[i]].max() + 1e-6
            cx = max(np.sum((x >= x[i] - ex) & (x < x[i] + ex)) - 1, 1)
            cy = max(np.sum((y >= y[i] - ey) & (y < y[i] + ey)) - 1, 1)
            a += psi(cx) / n
            b += psi(cy) / n
        return max(-a - b + psi(k) - 1.0 / k + psi(n), 0.0)


class TestKraskovMI:
    @pytest.mark.parametrize("est", [1, 2])
    def test_matches_reference_semantics_no_noise(self, series, est):
        x, y = series
        got = float(
            ops.mutual_information_kraskov(
                jnp.asarray(x), jnp.asarray(y), k=3,
                estimator=est, use_noise=False,
            )
        )
        want = _ksg_reference(x, y, 3, est)
        assert got == pytest.approx(want, abs=1e-4)

    def test_noise_tolerance(self, series):
        # With noise the value shifts by at most O(noise/scale).
        x, y = series
        a = float(
            ops.mutual_information_kraskov(
                jnp.asarray(x), jnp.asarray(y), use_noise=True
            )
        )
        b = float(
            ops.mutual_information_kraskov(
                jnp.asarray(x), jnp.asarray(y), use_noise=False
            )
        )
        assert a == pytest.approx(b, abs=0.05)

    def test_independent_near_zero(self):
        rng = np.random.default_rng(11)
        a = rng.normal(size=500).astype(np.float32)
        b = rng.normal(size=500).astype(np.float32)
        mi = float(
            ops.mutual_information_kraskov(jnp.asarray(a), jnp.asarray(b))
        )
        assert mi < 0.1

    def test_max_mi(self):
        want = scipy.special.digamma(100) - scipy.special.digamma(3)
        assert ops.maximum_mutual_information_kraskov(3, 100) == (
            pytest.approx(want)
        )


class TestDKL:
    def test_standard_normal_near_zero(self):
        rng = np.random.default_rng(5)
        v = rng.normal(size=2000).astype(np.float32)
        got_b = float(ops.dkl_binned(jnp.asarray(v), num_bins=40))
        got_k = float(ops.dkl_knn(jnp.asarray(v), k=3))
        assert abs(got_b) < 0.25
        assert abs(got_k) < 0.15

    def test_non_normal_positive(self):
        rng = np.random.default_rng(6)
        v = rng.exponential(size=2000).astype(np.float32)
        got_b = float(ops.dkl_binned(jnp.asarray(v), num_bins=40))
        got_k = float(ops.dkl_knn(jnp.asarray(v), k=3))
        assert got_b > 0.1
        assert got_k > 0.1

    def test_batched(self):
        rng = np.random.default_rng(8)
        v = rng.normal(size=(3, 500)).astype(np.float32)
        out = np.asarray(ops.dkl_knn(jnp.asarray(v)))
        assert out.shape == (3,)

    def test_knn_ties_nan_reference_parity(self):
        # Exactly tied samples → k-NN distance 0 → NaN, matching the
        # reference's unguarded log(nnDist) + inf→NaN mapping
        # (DKL.cpp:133-166). Quantization must NOT silently produce a
        # finite wrong value, and the binned estimator must stay
        # finite on the same data.
        rng = np.random.default_rng(9)
        v = np.round(rng.normal(size=500) * 4) / 4  # heavy ties
        v = v.astype(np.float32)
        assert np.isnan(float(ops.dkl_knn(jnp.asarray(v), k=3)))
        assert np.isfinite(float(ops.dkl_binned(jnp.asarray(v),
                                                num_bins=40)))


class TestCorrelateDispatch:
    @pytest.mark.parametrize(
        "measure",
        [
            "pearson",
            "spearman",
            "kendall",
            "mi_binned",
            "mi_kraskov",
            "binned_mi_correlation_coefficient",
            "kmi_correlation_coefficient",
        ],
    )
    def test_all_measures_run(self, series, measure):
        x, y = series
        out = ops.correlate(jnp.asarray(x), jnp.asarray(y), measure)
        assert np.isfinite(float(out))

    def test_absolute(self, series):
        x, y = series
        out = ops.correlate(jnp.asarray(x), jnp.asarray(-y), "pearson",
                            absolute=True)
        assert float(out) > 0

    def test_planted_boxes_field(self):
        data = fixtures.synth_box_ensemble(xs=32, ys=32, zs=8, members=200)
        e, zs, ys, xs = data.shape
        vol = jnp.asarray(np.moveaxis(data, 0, -1))  # (z,y,x,e)
        ref = vol[zs // 2, 2, 2]  # inside the first box (g=4 → center 4,4)
        field = np.asarray(ops.pearson(ref, vol))
        assert field.shape == (zs, ys, xs)
        # Strong self-box correlation, weak far-away correlation.
        assert field[zs // 2, 2, 2] == pytest.approx(1.0, abs=1e-5)
        assert abs(field[zs // 2, 16, 16]) < 0.4


def test_field_similarity_kendall_exact_self():
    # Large fields must not break Kendall's f32-exact pair counting
    # (tau(x, x) drifted to 0.994 at 16k samples before the cap).
    from correrender_tpu.ops.similarity import field_similarity

    rng = np.random.default_rng(0)
    f = rng.normal(size=(16, 32, 32)).astype(np.float32)
    assert field_similarity(f, f, measure="kendall") == pytest.approx(
        1.0, abs=1e-6
    )


def test_registry_kendall_auto_dtype_propagates():
    # registry.correlate must hand Kendall dtype=None so the exact
    # int32 pair-count auto-switch engages past n ~ 4000 (round-3
    # review: an explicit float32 default silently defeated it and
    # the similarity path's 46340 cap). Observable deterministically:
    # n past the int32 window must raise rather than round in f32.
    x = jnp.zeros((46341,), jnp.float32)
    with pytest.raises(ValueError, match="int32"):
        ops.correlate(x, x, "kendall")
