"""Loader robustness under corrupt input.

The reference soft-fails bad files through ``sgl::Logfile`` error
paths (VolumeData.cpp:1266-1268); the equivalent contract here is that
a truncated or bit-flipped file raises a normal Python exception
quickly — it must never hang, crash the process, or silently return a
wrong field. Every writer→truncate→load cycle below asserts exactly
that, for each self-contained binary format with an in-tree writer.
"""

import os

import numpy as np
import pytest

from correrender_tpu.io import load_volume
from correrender_tpu.io.grib import write_grib2
from correrender_tpu.io.writers import write_cvol, write_netcdf


def _field(zs=6, ys=5, xs=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((zs, ys, xs)).astype(np.float32)


def _write(fmt, path, field):
    if fmt == "nc":
        write_netcdf(path, field)
    elif fmt == "cvol":
        write_cvol(path, field)
    elif fmt == "grib":
        write_grib2(path, {"t": field})
    else:  # pragma: no cover - parametrization guard
        raise AssertionError(fmt)


def _load_first_field(path):
    vd = load_volume([path])
    name = vd.field_names[0]
    return np.asarray(vd.get_field(name, 0, 0))


@pytest.mark.parametrize("fmt,ext", [("nc", ".nc"), ("cvol", ".cvol"),
                                     ("grib", ".grib")])
class TestTruncationFuzz:
    def test_roundtrip_intact(self, tmp_path, fmt, ext):
        field = _field()
        path = str(tmp_path / f"ok{ext}")
        _write(fmt, path, field)
        got = _load_first_field(path)
        np.testing.assert_allclose(
            got.reshape(field.shape), field, atol=1e-3
        )

    def test_truncations_raise_cleanly(self, tmp_path, fmt, ext):
        field = _field()
        path = str(tmp_path / f"full{ext}")
        _write(fmt, path, field)
        blob = open(path, "rb").read()
        rng = np.random.default_rng(1)
        cuts = sorted(set(
            [1, 3, len(blob) // 2, len(blob) - 1]
            + [int(c) for c in rng.integers(4, len(blob) - 1, 6)]
        ))
        for cut in cuts:
            tpath = str(tmp_path / f"cut{cut}{ext}")
            with open(tpath, "wb") as f:
                f.write(blob[:cut])
            try:
                got = _load_first_field(tpath)
            except Exception:
                continue  # clean failure — the contract
            # A parse that "succeeds" must not fabricate data the
            # full file didn't contain.
            assert got.size <= field.size
            os.unlink(tpath)

    def test_bitflips_never_crash(self, tmp_path, fmt, ext):
        field = _field()
        path = str(tmp_path / f"orig{ext}")
        _write(fmt, path, field)
        blob = bytearray(open(path, "rb").read())
        rng = np.random.default_rng(2)
        for trial in range(12):
            mutated = bytearray(blob)
            for pos in rng.integers(0, len(blob), 3):
                mutated[pos] ^= 1 << int(rng.integers(0, 8))
            mpath = str(tmp_path / f"mut{trial}{ext}")
            with open(mpath, "wb") as f:
                f.write(bytes(mutated))
            try:
                got = _load_first_field(mpath)
                assert np.asarray(got).dtype == np.float32
            except Exception:
                pass  # any ordinary exception is acceptable
