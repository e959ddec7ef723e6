"""Diagram subsystem tests: octree, samplers, bayopt, HEB, matrix,
t-SNE, DBSCAN, time-series, distribution similarity."""

import numpy as np
import pytest

from correrender_tpu.diagrams.octree import (
    Octree,
    GridRegion,
    downsample_fields,
)
from correrender_tpu.diagrams import sampling
from correrender_tpu.diagrams.heb import HEBChart
from correrender_tpu.diagrams.matrix import (
    correlation_matrix,
    render_matrix_svg,
)
from correrender_tpu.diagrams.tsne import tsne
from correrender_tpu.diagrams.dbscan import dbscan
from correrender_tpu.diagrams.timeseries import time_series_correlation
from correrender_tpu.diagrams.distribution_similarity import (
    build_features,
    distribution_similarity,
)
from correrender_tpu.utils import fixtures


@pytest.fixture(scope="module")
def box_stack():
    data = fixtures.synth_box_ensemble(xs=32, ys=32, zs=8, members=64)
    return np.moveaxis(data, 0, -1)  # (8, 32, 32, 64)


class TestOctree:
    def test_leaf_cover_exact(self):
        tree = Octree(4, 4, 2)
        total = sum(r.size for r in tree.leaves)
        assert total == 4 * 4 * 2
        assert len(tree.leaves) == 32  # all unit leaves

    def test_nonpow2(self):
        tree = Octree(5, 3, 2)
        assert sum(r.size for r in tree.leaves) == 30

    def test_leaf_path_root(self):
        tree = Octree(4, 4, 4)
        path = tree.leaf_path(0)
        assert path[0] == 0  # root first
        assert not tree.nodes[path[-1]].children  # ends at leaf

    def test_downsample(self):
        stack = np.arange(4 * 4 * 4 * 2, dtype=np.float32).reshape(4, 4, 4, 2)
        means = downsample_fields(stack, 2)
        assert means.shape == (2, 2, 2, 2)
        want = stack[:2, :2, :2].mean(axis=(0, 1, 2))
        np.testing.assert_allclose(means[0, 0, 0], want)


class TestSamplers:
    def test_quasirandom_sequences_in_unit_cube(self):
        h = sampling.halton(np.arange(1, 101), 3)
        assert (h >= 0).all() and (h < 1).all()
        p = sampling.plastic_sequence(100, 6)
        assert p.shape == (100, 6)
        assert (p >= 0).all() and (p < 1).all()

    @pytest.mark.parametrize("method", ["random", "halton", "plastic"])
    def test_samplers_find_high_correlation(self, box_stack, method):
        # Two regions inside the same planted box: high max correlation.
        ra = GridRegion(0, 0, 2, 7, 7, 5)
        rb = GridRegion(8, 0, 2, 15, 7, 5)
        est = sampling.sample_block_pair_max(
            box_stack, ra, rb, "pearson", method=method, num_samples=64
        )
        truth = sampling.exhaustive_block_pair_max(
            box_stack, ra, rb, "pearson"
        )
        assert est <= truth + 1e-5
        assert est > 0.5 * truth

    def test_bayopt_close_to_truth(self, box_stack):
        ra = GridRegion(0, 0, 2, 7, 7, 5)
        rb = GridRegion(8, 0, 2, 15, 7, 5)
        est = sampling.sample_block_pair_max(
            box_stack, ra, rb, "pearson", method="bayesian",
            num_samples=40, num_init=16,
        )
        truth = sampling.exhaustive_block_pair_max(
            box_stack, ra, rb, "pearson"
        )
        assert est <= truth + 1e-5
        assert est > 0.6 * truth

    def test_batched_bayopt_matches_quality_and_determinism(
        self, box_stack
    ):
        from correrender_tpu.diagrams.bayopt import (
            batched_bayesian_opt_max,
        )

        ra = [GridRegion(0, 0, 2, 7, 7, 5), GridRegion(0, 0, 0, 7, 7, 3)]
        rb = [GridRegion(8, 0, 2, 15, 7, 5), GridRegion(8, 0, 0, 15, 7, 3)]
        est = batched_bayesian_opt_max(
            box_stack, ra, rb, "pearson", num_init=16, num_iters=24,
            seed=0,
        )
        assert est.shape == (2,)
        truth = np.array([
            sampling.exhaustive_block_pair_max(box_stack, a, b, "pearson")
            for a, b in zip(ra, rb)
        ])
        assert np.all(est <= truth + 1e-5)
        assert np.all(est > 0.6 * truth)
        # Deterministic given seed, and pair-chunking (incl. the padded
        # final chunk) must not change values.
        chunked = batched_bayesian_opt_max(
            box_stack, ra, rb, "pearson", num_init=16, num_iters=24,
            seed=0, pair_chunk=1,
        )
        np.testing.assert_allclose(est, chunked, atol=1e-6)

    def test_batched_sampler_ksg_and_kwargs_policy(self):
        # KSG request chunks must be bounded by the (R, n, n) dense
        # neighbour workspace, and the kwargs cache policy must accept
        # 0-d scalars but reject non-scalar arrays with a clear error.
        from correrender_tpu.diagrams.sampling import (
            batched_block_pairs_max,
        )

        rng = np.random.default_rng(0)
        stack = rng.standard_normal((8, 8, 8, 64)).astype(np.float32)
        ra = [GridRegion(0, 0, 0, 3, 3, 3)]
        rb = [GridRegion(4, 4, 4, 7, 7, 7)]
        out = batched_block_pairs_max(
            stack, ra, rb, "mi_kraskov", num_samples=16
        )
        assert out.shape == (1,) and np.isfinite(out[0])
        ok = batched_block_pairs_max(
            stack, ra, rb, "mi_binned", num_samples=8, num_bins=8,
            mi_bounds=((np.float32(-4), np.float32(4)),) * 2,
        )
        assert np.isfinite(ok[0])
        with pytest.raises(ValueError, match="scalar"):
            batched_block_pairs_max(
                stack, ra, rb, "mi_binned", num_samples=8,
                mi_bounds=((np.zeros(3), np.ones(3)),) * 2,
            )

    def test_batched_bayopt_zero_iters_falls_back(self, box_stack):
        from correrender_tpu.diagrams.bayopt import (
            batched_bayesian_opt_max,
        )

        ra = [GridRegion(0, 0, 2, 7, 7, 5)]
        rb = [GridRegion(8, 0, 2, 15, 7, 5)]
        est = batched_bayesian_opt_max(
            box_stack, ra, rb, "pearson", num_init=16, num_iters=0
        )
        assert est.shape == (1,) and np.isfinite(est[0])


class TestHEB:
    def test_chart_builds_and_renders(self, box_stack, tmp_path):
        chart = HEBChart(box_stack, downsample_factor=8, max_chords=20)
        chords = chart.compute_correlations()
        assert 0 < len(chords) <= 20
        # Values sorted descending and within [0, 1] for |pearson|.
        vals = [c[2] for c in chords]
        assert vals == sorted(vals, reverse=True)
        assert all(0 <= v <= 1.0 + 1e-6 for v in vals)
        svg = chart.render_svg(str(tmp_path / "heb.svg"))
        assert "<svg" in svg and "path" in svg
        assert (tmp_path / "heb.svg").exists()

    def test_sampled_mode(self, box_stack):
        chart = HEBChart(
            box_stack, downsample_factor=16,
            sampling_method="plastic", num_samples=16, max_chords=10,
        )
        chords = chart.compute_correlations()
        assert len(chords) > 0

    def test_bayesian_mode(self, box_stack):
        # Routes through the batched one-program GP-UCB sampler.
        chart = HEBChart(
            box_stack, downsample_factor=16,
            sampling_method="bayesian", num_samples=24, max_chords=10,
        )
        chords = chart.compute_correlations()
        assert len(chords) > 0
        assert all(0 <= c[2] <= 1.0 + 1e-6 for c in chords)

    def test_bayesian_screening_matches_full(self):
        """Mean-field screening (VERDICT r3 #5): GP-UCB runs only on
        the quasirandom screening's top pairs; on data with distinct
        top correlations the displayed chord set must match the
        full-GP serve. (Near-tied pair values can reorder under ANY
        sampling estimator, so the fixture plants two unambiguous
        long-range couplings.)"""
        rng = np.random.default_rng(0)
        n = 24
        stack = 0.3 * rng.standard_normal(
            (8, 32, 32, n)).astype(np.float32)
        s1 = rng.standard_normal(n).astype(np.float32)
        s2 = rng.standard_normal(n).astype(np.float32)
        # Two distant region pairs share latent signals.
        stack[0:4, 0:8, 0:8] += s1
        stack[4:8, 24:32, 24:32] += s1
        stack[0:4, 24:32, 0:8] += s2
        stack[4:8, 0:8, 24:32] += s2
        kw = dict(downsample_factor=8, sampling_method="bayesian",
                  num_samples=24, max_chords=2)
        full_chart = HEBChart(stack, bayesian_screening=False, **kw)
        full = full_chart.compute_correlations()
        scr_chart = HEBChart(stack, screening_top_frac=0.1, **kw)
        scr = scr_chart.compute_correlations()
        # Screening was actually active (fewer GP pairs than total).
        P = len(full_chart._pair_values[0])
        assert max(4 * 2, int(np.ceil(0.1 * P))) < P
        assert {(i, j) for i, j, _ in scr} \
            == {(i, j) for i, j, _ in full}
        # Refined values agree on the displayed chords.
        fv = {(i, j): v for i, j, v in full}
        for i, j, v in scr:
            assert abs(v - fv[(i, j)]) < 5e-3

    def test_per_axis_downsample(self, box_stack):
        # Reference downscaling_factor_x/y/z: the (8, 32, 32, n) stack
        # with (8, 8, 2) collapses z fully while keeping 4×4 in x/y.
        chart = HEBChart(box_stack, downsample_factor=(8, 8, 2),
                         max_chords=10)
        assert chart.means.shape[:3] == (4, 4, 4)
        assert chart._upscale(chart.leaves[0]).z_max <= 7
        chords = chart.compute_correlations()
        assert len(chords) > 0
        assert "<svg" in chart.render_svg()

    def test_correlation_range_filter(self, box_stack):
        base = HEBChart(box_stack, downsample_factor=8, max_chords=999)
        base.compute_correlations()
        vals = [c[2] for c in base.chords]
        lo, hi = 0.3, 0.8
        chart = HEBChart(box_stack, downsample_factor=8, max_chords=999,
                         correlation_range=(lo, hi))
        chart.compute_correlations()
        got = [c[2] for c in chart.chords]
        assert all(lo <= v <= hi for v in got)
        expect = sorted((v for v in vals if lo <= v <= hi),
                        reverse=True)
        assert np.allclose(sorted(got, reverse=True), expect)

    def test_cell_distance_range_filter(self, box_stack):
        # Pairs with leaf centers closer than the lower bound are
        # skipped before sampling (HEBChartCorrelation.cpp:532-537).
        chart = HEBChart(box_stack, downsample_factor=8, max_chords=999,
                         cell_distance_range=(2.0, 100.0))
        chart.compute_correlations()
        centers = np.array([r.center for r in chart.leaves], np.float32)
        for i, j, _v in chart.chords:
            assert np.linalg.norm(centers[i] - centers[j]) >= 2.0
        # An impossible window yields an empty chord list, not a crash.
        none = HEBChart(box_stack, downsample_factor=8,
                        cell_distance_range=(1000.0, 2000.0))
        assert none.compute_correlations() == []
        assert "<svg" in none.render_svg()

    def test_curve_style_options(self, box_stack):
        chart = HEBChart(box_stack, downsample_factor=8, max_chords=10)
        chart.compute_correlations()
        thick = chart.render_svg(curve_thickness=3.0)
        flat_op = chart.render_svg(opacity_by_value=False)
        assert "<svg" in thick and "<svg" in flat_op
        assert 'opacity="0.8' in flat_op


class TestMatrix:
    def test_correlation_matrix_diag(self):
        rng = np.random.default_rng(0)
        series = rng.normal(size=(5, 200)).astype(np.float32)
        m = correlation_matrix(series)
        np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
        assert np.allclose(m, m.T, atol=1e-6)

    def test_render(self, tmp_path):
        m = np.array([[1.0, -0.5], [-0.5, 1.0]])
        svg = render_matrix_svg(m, labels=["a", "b"],
                                path=str(tmp_path / "m.svg"))
        assert "<rect" in svg


class TestTsne:
    def test_separates_two_blobs(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.3, size=(60, 10))
        b = rng.normal(5, 0.3, size=(60, 10))
        emb = tsne(np.concatenate([a, b]), perplexity=15, num_iters=500)
        assert emb.shape == (120, 2)
        da = emb[:60].mean(axis=0)
        db = emb[60:].mean(axis=0)
        spread = max(emb[:60].std(), emb[60:].std())
        assert np.linalg.norm(da - db) > 2 * spread
        # 1-NN label purity: embedding must keep the blobs separable.
        labels = np.array([0] * 60 + [1] * 60)
        d = np.linalg.norm(emb[:, None] - emb[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        nn = np.argmin(d, axis=1)
        assert (labels[nn] == labels).mean() > 0.95


class TestDbscan:
    def test_two_clusters_and_noise(self):
        rng = np.random.default_rng(1)
        a = rng.normal(0, 0.1, size=(40, 2))
        b = rng.normal(4, 0.1, size=(40, 2))
        noise = np.array([[10.0, -10.0]])
        labels = dbscan(np.concatenate([a, b, noise]), eps=0.5,
                        min_samples=5)
        assert labels[-1] == -1
        assert len(set(labels[:40])) == 1
        assert len(set(labels[40:80])) == 1
        assert labels[0] != labels[40]


class TestTimeSeries:
    def test_pairwise(self):
        rng = np.random.default_rng(2)
        t = np.linspace(0, 8 * np.pi, 200)
        series = np.stack([np.sin(t), np.sin(t), np.cos(t)]).astype(
            np.float32
        ) + 0.01 * rng.normal(size=(3, 200)).astype(np.float32)
        m = time_series_correlation(series)
        assert m[0, 1] > 0.99
        assert abs(m[0, 2]) < 0.2

    def test_lagged(self):
        t = np.linspace(0, 8 * np.pi, 220)
        s = np.stack([np.sin(t)]).astype(np.float32)
        m = time_series_correlation(s, window=120)
        assert m.shape == (1, 101)
        assert m[0, 0] > 0.99

    def test_loader_squeezes_and_rejects_volumes(self, tmp_path):
        # (S, 1, T) squeezes to a valid series; a 5-D ensemble volume
        # must raise a clear error instead of crashing the heatmap
        # (round-3 CLI sweep regression).
        import pytest
        from correrender_tpu.diagrams.timeseries import load_time_series
        from correrender_tpu.io import writers

        rng = np.random.default_rng(0)
        ok = tmp_path / "ok.nc"
        writers.write_netcdf(
            str(ok), rng.normal(size=(6, 1, 40)).astype(np.float32),
            name="series",
        )
        assert load_time_series(str(ok)).shape == (6, 40)

        vol = tmp_path / "vol.nc"
        writers.write_netcdf(
            str(vol),
            rng.normal(size=(5, 2, 4, 6, 6)).astype(np.float32),
            name="f",
        )
        with pytest.raises(ValueError, match="2-D series"):
            load_time_series(str(vol))

    def test_loader_keeps_single_sample_series(self, tmp_path):
        # A (1, T) series is valid — squeezing must not drop the
        # sample axis (round-3 self-review regression).
        from correrender_tpu.diagrams.timeseries import load_time_series
        from correrender_tpu.io import writers

        rng = np.random.default_rng(1)
        p = tmp_path / "one.nc"
        writers.write_netcdf(
            str(p), rng.normal(size=(1, 40)).astype(np.float32),
            name="series",
        )
        assert load_time_series(str(p)).shape == (1, 40)


class TestDistributionSimilarity:
    def test_feature_modes(self, box_stack):
        for mode in ("cell_member_values", "member_cell_values",
                     "cell_neighborhood_correlations"):
            feats, ids = build_features(box_stack, mode, max_points=100)
            assert feats.ndim == 2 and len(feats) > 10
            assert np.isfinite(feats).all()

    def test_pipeline(self, box_stack):
        emb, labels, ids = distribution_similarity(
            box_stack, max_points=150, perplexity=10
        )
        assert emb.shape[1] == 2
        assert len(labels) == len(emb) == len(ids)


class TestBatchedSampling:
    def test_matches_per_pair_loop(self):
        # The batched request-mode path must reproduce the per-pair
        # loop exactly (same quasirandom positions for every pair).
        from correrender_tpu.diagrams.octree import GridRegion
        from correrender_tpu.diagrams.sampling import (
            batched_block_pairs_max,
            sample_block_pair_max,
        )
        from correrender_tpu.utils import fixtures

        data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8, members=40)
        stack = np.moveaxis(data, 0, -1)
        regions = [
            GridRegion(0, 0, 0, 7, 7, 3),
            GridRegion(8, 8, 4, 15, 15, 7),
            GridRegion(4, 0, 2, 11, 7, 5),
        ]
        pairs = [(0, 1), (0, 2), (1, 2)]
        for method in ("plastic", "halton", "random"):
            batched = batched_block_pairs_max(
                stack,
                [regions[i] for i, _ in pairs],
                [regions[j] for _, j in pairs],
                "pearson", method=method, num_samples=24,
            )
            looped = [
                sample_block_pair_max(
                    stack, regions[i], regions[j], "pearson",
                    method=method, num_samples=24, seed=0,
                )
                for i, j in pairs
            ]
            np.testing.assert_allclose(batched, looped, atol=1e-5)

    def test_gp_hyperparam_fit_recovers_scale(self):
        import jax.numpy as jnp

        from correrender_tpu.diagrams.bayopt import (
            fit_gp_hyperparams,
            matern52,
        )

        rng = np.random.default_rng(0)
        x = rng.random((60, 2)).astype(np.float32)
        true_ls = 0.15
        k = np.asarray(matern52(jnp.asarray(x), jnp.asarray(x),
                                true_ls, 1.0))
        y = rng.multivariate_normal(np.zeros(60), k + 1e-6 * np.eye(60))
        ls, var = fit_gp_hyperparams(
            jnp.asarray(x), jnp.asarray(y, jnp.float32)
        )
        # Wide tolerance: ML on 60 points — but must land near 0.15,
        # far from the old hardcoded 0.3 when the data says otherwise.
        assert 0.05 <= float(ls) <= 0.3

    def test_masked_gp_matches_unmasked(self):
        # The fixed-capacity mask trick (static shapes across BayOpt
        # iterations) must reproduce the plain GP over the active
        # subset exactly.
        import jax.numpy as jnp

        from correrender_tpu.diagrams.bayopt import (
            fit_gp_hyperparams,
            gp_posterior,
        )

        rng = np.random.default_rng(1)
        x = rng.random((20, 6)).astype(np.float32)
        y = rng.standard_normal(20).astype(np.float32)
        q = rng.random((32, 6)).astype(np.float32)
        cap = 32
        xp = np.zeros((cap, 6), np.float32); xp[:20] = x
        yp = np.zeros(cap, np.float32); yp[:20] = y
        mask = np.zeros(cap, np.float32); mask[:20] = 1.0
        m0, s0 = gp_posterior(jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(q), 0.3, 1.0)
        m1, s1 = gp_posterior(jnp.asarray(xp), jnp.asarray(yp),
                              jnp.asarray(q), 0.3, 1.0,
                              mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(m0), np.asarray(m1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   atol=1e-5)
        ls0, v0 = fit_gp_hyperparams(jnp.asarray(x), jnp.asarray(y))
        ls1, v1 = fit_gp_hyperparams(jnp.asarray(xp), jnp.asarray(yp),
                                     mask=jnp.asarray(mask))
        assert float(ls0) == float(ls1)
        np.testing.assert_allclose(float(v0), float(v1), rtol=1e-4)

    def test_sampling_test_indices(self, tmp_path):
        from correrender_tpu.app.sampling_test import (
            TEST_CASE_DATA_MAX_SUBSAMPLED,
            run_sampling_test_index,
        )
        from correrender_tpu.io import writers
        from correrender_tpu.utils import fixtures

        data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8,
                                           members=30)
        path = str(tmp_path / "d.nc")
        writers.write_netcdf(path, data[:, None], name="q")  # (E,T,Z,Y,X)
        rows = run_sampling_test_index(
            TEST_CASE_DATA_MAX_SUBSAMPLED, dataset=path,
            csv_path=str(tmp_path / "s.csv"), num_pairs=2, block=6,
        )
        assert [r["method"] for r in rows] == ["mean"] * 4
        assert (tmp_path / "s.csv").exists()


class TestZOrderOctree:
    def test_pow2_grid_matches_topdown_leaf_count(self):
        from correrender_tpu.diagrams.octree import Octree

        a = Octree(4, 4, 4, mode="topdown")
        b = Octree(4, 4, 4, mode="zorder")
        assert len(a.leaves) == len(b.leaves) == 64
        # On a pow2 cube both variants produce the same leaf cells.
        sa = {(r.x_min, r.y_min, r.z_min) for r in a.leaves}
        sb = {(r.x_min, r.y_min, r.z_min) for r in b.leaves}
        assert sa == sb

    def test_non_pow2_grid_covers_all_voxels(self):
        from correrender_tpu.diagrams.octree import Octree

        t = Octree(5, 3, 6, mode="zorder")
        seen = np.zeros((6, 3, 5), bool)
        for r in t.leaves:
            assert r.size == 1  # leaf_size 1 → unit cells
            seen[r.z_min, r.y_min, r.x_min] = True
        assert seen.all()
        # Morton order: the first leaf is the origin cell.
        assert (t.leaves[0].x_min, t.leaves[0].y_min,
                t.leaves[0].z_min) == (0, 0, 0)

    def test_heb_accepts_mode(self):
        from correrender_tpu.diagrams.heb import HEBChart
        from correrender_tpu.utils import fixtures

        data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8, members=20)
        stack = np.moveaxis(data, 0, -1)
        chart = HEBChart(stack, downsample_factor=8,
                         octree_mode="zorder")
        chart.compute_correlations()
        assert chart.num_leaves > 0


class TestHebSignedValues:
    """absolute=False charts: negative correlations must style by
    magnitude and map color over [-1, 1] (round-3 review: a negative
    value wrapped the LUT index and emitted negative stroke widths)."""

    def _anti_stack(self):
        rng = np.random.default_rng(11)
        sig = rng.normal(size=24).astype(np.float32)
        stack = rng.normal(size=(8, 16, 16, 24)).astype(np.float32)
        stack *= 0.05
        stack[:, :, :8] += sig          # left half follows the signal
        stack[:, :, 8:] -= sig          # right half anti-follows it
        return stack

    def test_mean_path_signed_kwarg_no_crash(self):
        chart = HEBChart(
            self._anti_stack(), downsample_factor=8,
            sampling_method="mean", absolute=False,
            correlation_range=(-1.0, 1.0), max_chords=40,
        )
        chords = chart.compute_correlations()
        assert any(v < 0 for _, _, v in chords), \
            "anti-correlated halves must produce negative chords"
        svg = chart.render_svg()
        assert "<svg" in svg
        assert 'stroke-width="-' not in svg
        assert 'stroke-opacity="-' not in svg

    def test_exhaustive_honors_signed(self):
        stack = self._anti_stack()
        from correrender_tpu.diagrams.octree import GridRegion
        ra = GridRegion(0, 0, 0, 3, 3, 3)
        rb = GridRegion(12, 12, 4, 15, 15, 7)
        v_abs = sampling.exhaustive_block_pair_max(stack, ra, rb)
        v_sgn = sampling.exhaustive_block_pair_max(
            stack, ra, rb, absolute=False)
        assert v_abs > 0.5
        assert v_sgn < v_abs  # signed max of anti-correlated blocks

    def test_signed_chart_keeps_strong_anticorrelations(self):
        chart = HEBChart(
            self._anti_stack(), downsample_factor=8,
            sampling_method="mean", absolute=False,
            correlation_range=(-1.0, 1.0), max_chords=3,
        )
        chords = chart.compute_correlations()
        # The strongest |value| chords must include the anti-
        # correlated left-right pairs, not only weak positives.
        assert max(abs(v) for _, _, v in chords) > 0.5
        assert any(v < -0.5 for _, _, v in chords)


class TestRound3DiagramReviewFixes:
    def test_signed_samplers_pick_strongest_magnitude(self):
        # absolute=False samplers must return the signed value of the
        # strongest |relationship| — a signed max reported one weak
        # positive probe over a dominant anti-correlation (round-3
        # review).
        rng = np.random.default_rng(3)
        sig = rng.normal(size=32).astype(np.float32)
        stack = rng.normal(size=(8, 8, 8, 32)).astype(np.float32) * 0.05
        stack[:4] += sig
        stack[4:] -= sig
        from correrender_tpu.diagrams.octree import GridRegion
        ra, rb = GridRegion(0, 0, 0, 7, 7, 3), GridRegion(0, 0, 4, 7, 7, 7)
        v = sampling.sample_block_pair_max(
            stack, ra, rb, "pearson", method="plastic",
            num_samples=16, absolute=False)
        assert v < -0.5
        vb = sampling.batched_block_pairs_max(
            stack, [ra], [rb], "pearson", method="plastic",
            num_samples=16, absolute=False)
        assert vb[0] < -0.5
        ve = sampling.exhaustive_block_pair_max(
            stack, ra, rb, "pearson", absolute=False)
        assert ve < -0.5

    def test_exhaustive_all_nan_pair_returns_nan(self):
        stack = np.full((4, 4, 4, 8), np.nan, np.float32)
        from correrender_tpu.diagrams.octree import GridRegion
        r = GridRegion(0, 0, 0, 3, 3, 3)
        assert np.isnan(
            sampling.exhaustive_block_pair_max(stack, r, r))

    def test_bayopt_all_nan_pair_returns_nan(self):
        from correrender_tpu.diagrams.bayopt import (
            batched_bayesian_opt_max,
        )
        from correrender_tpu.diagrams.octree import GridRegion

        rng = np.random.default_rng(0)
        stack = rng.normal(size=(4, 8, 8, 16)).astype(np.float32)
        stack[:, :4] = np.nan  # masked half
        good = GridRegion(0, 4, 0, 7, 7, 3)
        masked = GridRegion(0, 0, 0, 7, 3, 3)
        out = batched_bayesian_opt_max(
            stack, [masked, good], [masked, good], "pearson",
            num_init=6, num_iters=4)
        assert np.isnan(out[0])       # fully-masked pair → NaN
        assert np.isfinite(out[1])    # real pair unaffected

    def test_scatter_all_nan_renders_empty_plot(self):
        from correrender_tpu.diagrams.scatter import render_scatter_svg

        svg = render_scatter_svg(np.full((4, 4), np.nan),
                                 np.full((4, 4), np.nan))
        assert "<svg" in svg and "no finite" in svg

    def test_drilldown_halves_factors_per_axis(self):
        from correrender_tpu.diagrams.drilldown import HEBDrilldown

        rng = np.random.default_rng(1)
        stack = rng.normal(size=(4, 32, 32, 12)).astype(np.float32)
        dd = HEBDrilldown(stack, downsample_factor=(8, 8, 1),
                          sampling_method="mean")
        focus = dd.drill_into_chord(0)
        # z stays full-res (1), x/y halve — the scalar max//2 made the
        # focus chart COARSER than the context on the flat axis.
        assert focus.factors == (4, 4, 1)

    def test_unknown_sampling_method_raises(self):
        rng = np.random.default_rng(0)
        stack = rng.normal(size=(4, 16, 16, 8)).astype(np.float32)
        chart = HEBChart(stack, downsample_factor=8,
                         sampling_method="halto")  # typo
        with pytest.raises(ValueError, match="sampling method"):
            chart.compute_correlations()


class TestBayesianSignedValues:
    """The bayesian sampler must honor absolute=False like every other
    sampler: the GP still maximizes |corr| but the reported value keeps
    the sign at the winning probe (round-3 review: signed
    correlation_range silently yielded empty bayesian charts)."""

    def _anti_blocks(self):
        rng = np.random.default_rng(5)
        sig = rng.normal(size=48).astype(np.float32)
        stack = 0.05 * rng.normal(size=(8, 16, 16, 48)).astype(np.float32)
        stack[:, :, :8] += sig
        stack[:, :, 8:] -= sig
        return stack

    def test_batched_bayopt_signed(self):
        from correrender_tpu.diagrams.bayopt import (
            batched_bayesian_opt_max,
        )
        from correrender_tpu.diagrams.octree import GridRegion

        stack = self._anti_blocks()
        ra = [GridRegion(0, 0, 0, 7, 15, 7)]
        rb = [GridRegion(8, 0, 0, 15, 15, 7)]
        sgn = batched_bayesian_opt_max(
            stack, ra, rb, "pearson", num_init=12, num_iters=12,
            seed=0, absolute=False,
        )
        ab = batched_bayesian_opt_max(
            stack, ra, rb, "pearson", num_init=12, num_iters=12,
            seed=0,
        )
        assert sgn[0] < -0.5  # anti-correlated halves, sign kept
        np.testing.assert_allclose(abs(sgn[0]), ab[0], atol=1e-6)

    def test_per_pair_bayopt_signed(self):
        from correrender_tpu.diagrams.bayopt import bayesian_opt_max
        from correrender_tpu.diagrams.octree import GridRegion

        stack = self._anti_blocks()
        ra = GridRegion(0, 0, 0, 7, 15, 7)
        rb = GridRegion(8, 0, 0, 15, 15, 7)
        v = bayesian_opt_max(stack, ra, rb, "pearson", num_init=10,
                             num_iters=8, seed=0, absolute=False)
        assert v < -0.5

    def test_signed_bayesian_heb_chart_keeps_anticorrelations(self):
        chart = HEBChart(
            self._anti_blocks(), downsample_factor=8,
            sampling_method="bayesian", num_samples=24,
            absolute=False, correlation_range=(-1.0, -0.3),
            max_chords=8,
        )
        chords = chart.compute_correlations()
        assert chords, "negative correlation_range must keep chords"
        assert all(v < -0.3 for _, _, v in chords)

    def test_batched_bayopt_zero_iters_honors_signed(self):
        from correrender_tpu.diagrams.bayopt import (
            batched_bayesian_opt_max,
        )
        from correrender_tpu.diagrams.octree import GridRegion

        stack = self._anti_blocks()
        ra = [GridRegion(0, 0, 0, 7, 15, 7)]
        rb = [GridRegion(8, 0, 0, 15, 15, 7)]
        est = batched_bayesian_opt_max(
            stack, ra, rb, "pearson", num_init=16, num_iters=0,
            absolute=False,
        )
        assert est[0] < -0.5


def test_scatter_point_color():
    """point_color (ScatterPlotRenderer.cpp:510,539) overrides the
    default fill, accepting tuples, byte colors, and sgl vec4 text."""
    import numpy as np

    from correrender_tpu.diagrams.scatter import (
        _parse_color,
        render_scatter_svg,
    )

    assert _parse_color("0.9 0.3 0.1 1") == (0.9, 0.3, 0.1)
    assert _parse_color("vec4(0.9, 0.3, 0.1, 1)") == (0.9, 0.3, 0.1)
    assert _parse_color((255, 40, 0)) == (1.0, 40 / 255, 0.0)
    rng = np.random.default_rng(0)
    svg = render_scatter_svg(rng.random(40), rng.random(40),
                             point_color=(1.0, 0.0, 0.0))
    assert 'fill="rgb(255,0,0)"' in svg
