"""Histogram / min-max utilities and time-series loading."""

import numpy as np
import pytest

import jax.numpy as jnp

from correrender_tpu.utils.histogram import (
    histogram,
    min_max,
    divergent_min_max,
)
from correrender_tpu.diagrams.timeseries import load_time_series


class TestHistogram:
    def test_counts_and_bounds(self):
        f = jnp.asarray(np.linspace(0, 1, 1000, dtype=np.float32))
        counts, (lo, hi) = histogram(f, num_bins=10)
        assert float(lo) == pytest.approx(0.0)
        assert float(hi) == pytest.approx(1.0)
        c = np.asarray(counts)
        assert c.max() == pytest.approx(1.0)
        assert (c > 0.9).all()  # uniform data → even bins

    def test_nan_ignored(self):
        f = jnp.asarray([0.0, 0.5, 1.0, np.nan])
        counts, _ = histogram(f, num_bins=4, bounds=(0.0, 1.0),
                              normalize=False)
        assert float(jnp.sum(counts)) == 3.0

    def test_min_max(self):
        f = jnp.asarray([1.0, -3.0, np.nan, 2.0])
        lo, hi = min_max(f)
        assert float(lo) == -3.0 and float(hi) == 2.0
        lo, hi = divergent_min_max(f)
        assert float(lo) == -3.0 and float(hi) == 3.0


class TestTimeSeriesLoader:
    def test_netcdf3(self, tmp_path):
        import scipy.io

        path = str(tmp_path / "ts.nc")
        nc = scipy.io.netcdf_file(path, "w")
        nc.createDimension("sample", 5)
        nc.createDimension("time", 20)
        var = nc.createVariable("series", "f", ("sample", "time"))
        var[:] = np.arange(100, dtype=np.float32).reshape(5, 20)
        nc.close()
        arr = load_time_series(path)
        assert arr.shape == (5, 20)
        assert arr[1, 0] == 20.0

    def test_hdf5(self, tmp_path):
        import h5py

        path = str(tmp_path / "ts.h5")
        with h5py.File(path, "w") as f:
            f["data"] = np.ones((3, 7), np.float32)
        arr = load_time_series(path)
        assert arr.shape == (3, 7)


class TestLpips:
    def test_random_feature_lpips_orders_distortions(self):
        from correrender_tpu.utils.metrics import compare_images, lpips

        rng = np.random.default_rng(0)
        img = rng.random((64, 64, 3)).astype(np.float32)
        slight = np.clip(img + 0.01 * rng.normal(size=img.shape), 0, 1)
        heavy = np.clip(img + 0.4 * rng.normal(size=img.shape), 0, 1)
        d0 = lpips(img, img)
        d1 = lpips(img, slight.astype(np.float32))
        d2 = lpips(img, heavy.astype(np.float32))
        assert d0 < 1e-6
        assert d0 < d1 < d2
        # Deterministic (fixed seed).
        assert lpips(img, heavy.astype(np.float32)) == d2
        assert "lpips" in compare_images(img, slight.astype(np.float32))
