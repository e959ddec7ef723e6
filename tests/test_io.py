"""Loader/writer round-trip and catalog tests."""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from correrender_tpu.io import (
    load_volume,
    loader_for_path,
    load_catalog,
    writers,
)
from correrender_tpu.io.catalog import open_dataset


@pytest.fixture
def vol_zyx():
    rng = np.random.default_rng(0)
    return rng.normal(size=(4, 6, 8)).astype(np.float32)  # (Z, Y, X)


class TestNetCdf:
    def test_netcdf3_roundtrip(self, tmp_path, vol_zyx):
        path = str(tmp_path / "f.nc")
        writers.write_netcdf(path, vol_zyx, name="temp")
        vd = load_volume(path)
        assert vd.grid.shape_zyx == (4, 6, 8)
        got = np.asarray(vd.get_field("temp"))
        np.testing.assert_allclose(got, vol_zyx, rtol=1e-6)

    def test_netcdf3_ensemble_5d(self, tmp_path):
        rng = np.random.default_rng(1)
        data = rng.normal(size=(3, 2, 4, 5, 6)).astype(np.float32)
        path = str(tmp_path / "ens.nc")
        writers.write_netcdf(path, data, name="q")
        vd = load_volume(path)
        assert vd.grid.es == 3 and vd.grid.ts == 2
        got = np.asarray(vd.get_field("q", time=1, member=2))
        np.testing.assert_allclose(got, data[2, 1], rtol=1e-6)

    def test_netcdf4_hdf5_container(self, tmp_path, vol_zyx):
        import h5py

        path = str(tmp_path / "f4.nc")
        with h5py.File(path, "w") as f:
            ds = f.create_dataset("press", data=vol_zyx[None])  # (t,z,y,x)
            ds.dims[0].label = "time"
            ds.dims[1].label = "lev"
            ds.dims[2].label = "lat"
            ds.dims[3].label = "lon"
        vd = load_volume(path)
        assert vd.grid.shape_zyx == (4, 6, 8)
        np.testing.assert_allclose(
            np.asarray(vd.get_field("press")), vol_zyx, rtol=1e-6
        )

    def test_uvw_autoregisters_velocity(self, tmp_path):
        import scipy.io

        path = str(tmp_path / "wind.nc")
        nc = scipy.io.netcdf_file(path, "w")
        for d, s in (("lev", 3), ("lat", 4), ("lon", 5)):
            nc.createDimension(d, s)
        for name in ("u", "v", "w"):
            var = nc.createVariable(name, "f", ("lev", "lat", "lon"))
            var[:] = np.ones((3, 4, 5), np.float32)
        nc.close()
        vd = load_volume(path)
        assert any("Magnitude" in n for n in vd.field_names)


class TestCvol:
    def test_roundtrip(self, tmp_path, vol_zyx):
        path = str(tmp_path / "v.cvol")
        writers.write_cvol(path, vol_zyx, (0.5, 1.0, 2.0))
        ld = loader_for_path(path).open(path)
        assert (ld.xs, ld.ys, ld.zs) == (8, 6, 4)
        assert ld.dx == pytest.approx(0.5)
        got = ld.load_field(ld.field_names[0])
        np.testing.assert_allclose(got, vol_zyx, rtol=1e-6)

    def test_uint8_normalized(self, tmp_path):
        data = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
        path = str(tmp_path / "b.cvol")
        writers.write_cvol(path, data)
        got = loader_for_path(path).open(path).load_field("b")
        np.testing.assert_allclose(got, data / 255.0, atol=1e-6)


class TestDatRaw:
    def test_dat_raw(self, tmp_path, vol_zyx):
        raw = tmp_path / "vol.raw"
        vol_zyx.tofile(str(raw))
        dat = tmp_path / "vol.dat"
        dat.write_text(
            "ObjectFileName: vol.raw\n"
            "Resolution: 8 6 4\n"
            "SliceThickness: 1.0 1.0 2.0\n"
            "Format: FLOAT\n"
        )
        vd = load_volume(str(dat))
        got = np.asarray(vd.get_field(vd.field_names[0]))
        np.testing.assert_allclose(got, vol_zyx, rtol=1e-6)

    def test_mhd(self, tmp_path, vol_zyx):
        raw = tmp_path / "m.raw"
        vol_zyx.tofile(str(raw))
        mhd = tmp_path / "m.mhd"
        mhd.write_text(
            "ObjectType = Image\nNDims = 3\nDimSize = 8 6 4\n"
            "ElementType = MET_FLOAT\nElementSpacing = 1 1 1\n"
            "ElementDataFile = m.raw\n"
        )
        ld = loader_for_path(str(mhd)).open(str(mhd))
        np.testing.assert_allclose(
            ld.load_field(ld.field_names[0]), vol_zyx, rtol=1e-6
        )


class TestVtk:
    def test_vti_ascii(self, tmp_path, vol_zyx):
        flat = " ".join(str(v) for v in vol_zyx.ravel())
        vti = tmp_path / "f.vti"
        vti.write_text(
            '<VTKFile type="ImageData" version="1.0">'
            '<ImageData WholeExtent="0 7 0 5 0 3" Spacing="1 1 1">'
            "<Piece><PointData>"
            f'<DataArray type="Float32" Name="s" format="ascii">{flat}'
            "</DataArray></PointData></Piece></ImageData></VTKFile>"
        )
        ld = loader_for_path(str(vti)).open(str(vti))
        np.testing.assert_allclose(ld.load_field("s"), vol_zyx, atol=1e-5)

    def test_vti_inline_binary_compressed(self, tmp_path, vol_zyx):
        # VTK writes compressed inline data as TWO base64 streams:
        # base64(header) + base64(blocks), each padded independently.
        import base64
        import zlib

        raw = vol_zyx.astype("<f4").tobytes()
        block_size = 256
        blocks = [
            zlib.compress(raw[i : i + block_size])
            for i in range(0, len(raw), block_size)
        ]
        last = len(raw) - (len(blocks) - 1) * block_size
        header = np.array(
            [len(blocks), block_size, last] + [len(b) for b in blocks],
            np.uint32,
        ).tobytes()
        text = (
            base64.b64encode(header).decode()
            + base64.b64encode(b"".join(blocks)).decode()
        )
        vti = tmp_path / "c.vti"
        vti.write_text(
            '<VTKFile type="ImageData" version="1.0"'
            ' compressor="vtkZLibDataCompressor">'
            '<ImageData WholeExtent="0 7 0 5 0 3" Spacing="1 1 1">'
            "<Piece><PointData>"
            f'<DataArray type="Float32" Name="s" format="binary">{text}'
            "</DataArray></PointData></Piece></ImageData></VTKFile>"
        )
        ld = loader_for_path(str(vti)).open(str(vti))
        np.testing.assert_allclose(ld.load_field("s"), vol_zyx, rtol=1e-6)

    def test_legacy_vtk_binary(self, tmp_path, vol_zyx):
        header = (
            "# vtk DataFile Version 3.0\ntest\nBINARY\n"
            "DATASET STRUCTURED_POINTS\nDIMENSIONS 8 6 4\n"
            "SPACING 1 1 1\nORIGIN 0 0 0\n"
            "POINT_DATA 192\nSCALARS s float 1\nLOOKUP_TABLE default\n"
        )
        path = tmp_path / "l.vtk"
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(vol_zyx.astype(">f4").tobytes())
        ld = loader_for_path(str(path)).open(str(path))
        np.testing.assert_allclose(ld.load_field("s"), vol_zyx, rtol=1e-6)


class TestZarr:
    def _write_zarr(self, root, name, data, chunks, compressor=None):
        adir = root / name
        adir.mkdir(parents=True)
        meta = {
            "zarr_format": 2,
            "shape": list(data.shape),
            "chunks": list(chunks),
            "dtype": data.dtype.str,
            "compressor": {"id": compressor} if compressor else None,
            "fill_value": 0,
            "order": "C",
            "filters": None,
        }
        (adir / ".zarray").write_text(json.dumps(meta))
        grid = [range(-(-s // c)) for s, c in zip(data.shape, chunks)]
        import itertools

        for idx in itertools.product(*grid):
            sl = tuple(
                slice(i * c, (i + 1) * c) for i, c in zip(idx, chunks)
            )
            chunk = data[sl]
            # Pad partial chunks to full chunk shape.
            pad = [(0, c - s) for c, s in zip(chunks, chunk.shape)]
            chunk = np.pad(chunk, pad)
            raw = chunk.tobytes()
            if compressor == "zlib":
                raw = zlib.compress(raw)
            (adir / ".".join(str(i) for i in idx)).write_bytes(raw)

    def test_zarr_roundtrip(self, tmp_path, vol_zyx):
        root = tmp_path / "store.zarr"
        self._write_zarr(root, "temp", vol_zyx, (2, 3, 4), "zlib")
        vd = load_volume(str(root))
        got = np.asarray(vd.get_field("temp"))
        np.testing.assert_allclose(got, vol_zyx, rtol=1e-6)

    def test_zarr_4d_partial_chunks(self, tmp_path):
        rng = np.random.default_rng(2)
        data = rng.normal(size=(3, 5, 5, 7)).astype(np.float32)
        root = tmp_path / "s4.zarr"
        self._write_zarr(root, "q", data, (2, 2, 3, 4))
        ld = loader_for_path(str(root)).open(str(root))
        np.testing.assert_allclose(ld.load_field("q", time=2), data[2],
                                   rtol=1e-6)


class TestNifti:
    def test_nifti_roundtrip(self, tmp_path, vol_zyx):
        header = bytearray(352)
        struct.pack_into("<i", header, 0, 348)
        struct.pack_into("<8h", header, 40, 3, 8, 6, 4, 1, 1, 1, 1)
        struct.pack_into("<h", header, 70, 16)  # float32
        struct.pack_into("<8f", header, 76, 1, 1, 1, 2, 1, 1, 1, 1)
        struct.pack_into("<f", header, 108, 352.0)  # vox_offset
        struct.pack_into("<f", header, 112, 1.0)  # scl_slope
        path = tmp_path / "t.nii"
        with open(path, "wb") as f:
            f.write(header)
            f.write(vol_zyx.tobytes())
        ld = loader_for_path(str(path)).open(str(path))
        assert ld.dz == pytest.approx(2.0)
        np.testing.assert_allclose(
            ld.load_field("intensity"), vol_zyx, rtol=1e-6
        )


class TestCatalog:
    def test_catalog_hierarchy_and_expansion(self, tmp_path, vol_zyx):
        for i in range(3):
            writers.write_netcdf(str(tmp_path / f"m_{i}.nc"), vol_zyx)
        catalog = {
            "datasets": [
                {
                    "type": "node",
                    "name": "synthetic",
                    "children": [
                        {
                            "name": "boxes",
                            "filename": "m_%d.nc",
                            "ensemble_range": "0 3",
                            "scale": 2.0,
                        }
                    ],
                }
            ]
        }
        cpath = tmp_path / "datasets.json"
        cpath.write_text(json.dumps(catalog))
        entries = load_catalog(str(cpath))
        assert len(entries) == 1
        info = entries[0]
        assert info.name == "synthetic/boxes"
        assert len(info.filenames) == 3
        vd = open_dataset(info)
        assert vd.grid.es == 3
        got = np.asarray(vd.get_field("data", member=1))
        # Catalog scale multiplies the GRID SPACING like the reference
        # (ZarrLoader.cpp:225-227), never the field values.
        np.testing.assert_allclose(got, vol_zyx, rtol=1e-6)
        assert vd.grid.dx == pytest.approx(2.0)
        assert info.scale == (2.0, 2.0, 2.0)

    def test_subsampling_and_subselection(self, tmp_path):
        data = np.arange(8 * 8 * 8, dtype=np.float32).reshape(8, 8, 8)
        writers.write_netcdf(str(tmp_path / "g.nc"), data)
        catalog = {
            "datasets": [
                {
                    "name": "g",
                    "filename": "g.nc",
                    "subsampling_factor": 2,
                }
            ]
        }
        cpath = tmp_path / "datasets.json"
        cpath.write_text(json.dumps(catalog))
        vd = open_dataset(load_catalog(str(cpath))[0])
        assert vd.grid.shape_zyx == (4, 4, 4)
        got = np.asarray(vd.get_field("data"))
        np.testing.assert_allclose(got, data[::2, ::2, ::2])


class TestMeshWriters:
    def test_obj_and_stl(self, tmp_path):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        tris = np.array([[0, 1, 2]])
        writers.write_obj(str(tmp_path / "m.obj"), verts, tris)
        txt = (tmp_path / "m.obj").read_text()
        assert txt.count("\nv ") + txt.startswith("v ") == 3 or "v 0" in txt
        writers.write_stl(str(tmp_path / "m.stl"), verts, tris)
        blob = (tmp_path / "m.stl").read_bytes()
        assert struct.unpack("<I", blob[80:84])[0] == 1


class TestGrib:
    def test_gated_with_clear_error(self, tmp_path):
        p = tmp_path / "x.grib"
        p.write_bytes(b"GRIB")
        with pytest.raises(NotImplementedError, match="cfgrib"):
            loader_for_path(str(p)).open(str(p))


class TestRbcBin:
    def test_fixed_format_roundtrip(self, tmp_path, monkeypatch):
        # The real format is a fixed 1024x32x1024x4 float block (512 MB);
        # shrink the module constants for the test.
        from correrender_tpu.io import rbc

        monkeypatch.setattr(rbc, "_XS", 8)
        monkeypatch.setattr(rbc, "_YS", 4)
        monkeypatch.setattr(rbc, "_ZS", 8)
        rng = np.random.default_rng(0)
        block = rng.normal(size=(8, 4, 8, 4)).astype("<f4")
        path = str(tmp_path / "snap.bin")
        block.tofile(path)
        from correrender_tpu.io import load_volume

        vd = load_volume(path)
        assert vd.grid.shape_zyx == (8, 4, 8)
        np.testing.assert_allclose(
            np.asarray(vd.get_field("Temperature")), block[..., 3],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(vd.get_field("u")), block[..., 0], atol=1e-6
        )
        # Velocity-derived calculators auto-register like the
        # reference's eager derived fields (RbcBinFileLoader.cpp:100+).
        for name in ("Vector Magnitude", "Vorticity", "Helicity"):
            assert vd.field_exists(name), vd.field_names

    def test_wrong_size_rejected(self, tmp_path):
        path = str(tmp_path / "bad.bin")
        np.zeros(10, np.float32).tofile(path)
        from correrender_tpu.io import load_volume

        with pytest.raises(ValueError):
            load_volume(path)


class TestCatalogAxes:
    def test_axes_transpose_applied(self, tmp_path):
        from correrender_tpu.io import load_volume
        from correrender_tpu.io.catalog import DataSetInformation

        rng = np.random.default_rng(4)
        data = rng.normal(size=(1, 1, 6, 5, 4)).astype(np.float32)
        path = str(tmp_path / "t.nc")
        writers.write_netcdf(path, data, name="temp")
        info = DataSetInformation(name="t", filenames=[path], axes=[0, 2, 1])
        vd = load_volume(path, dataset_info=info)
        # y<->z swap: (z=6,y=5,x=4) becomes (z=5,y=6,x=4).
        assert vd.grid.shape_zyx == (5, 6, 4)
        got = np.asarray(vd.get_field("temp"))
        np.testing.assert_allclose(got, data[0, 0].transpose(1, 0, 2))


class TestBlosc:
    def _roundtrip(self, cname, shuffle, n=10000):
        from correrender_tpu.io.blosc import blosc_compress, blosc_decompress

        rng = np.random.default_rng(0)
        data = rng.normal(size=n).astype(np.float32).tobytes()
        frame = blosc_compress(data, typesize=4, cname=cname,
                               blocksize=8192, shuffle=shuffle)
        assert blosc_decompress(frame) == data

    def test_zstd_shuffle(self):
        self._roundtrip("zstd", True)

    def test_zlib_no_shuffle(self):
        self._roundtrip("zlib", False)

    def test_zstd_bitshuffle(self):
        self._roundtrip("zstd", "bit")

    def test_bitshuffle_remainder(self):
        # n % 8 != 0 elements → trailing elements stored unshuffled.
        self._roundtrip("zlib", "bit", n=1003)

    def test_bitshuffle_vector(self):
        # Hand-computed: 8 uint8 elements, element e = 1 << (e % 8).
        # Bit plane k must then be the byte with only bit k set
        # (element k contributes bit k at LSB-first position k).
        from correrender_tpu.io.blosc import _bit_shuffle, _bit_unshuffle

        data = bytes(1 << e for e in range(8))
        shuffled = _bit_shuffle(data, 1)
        assert shuffled == bytes(1 << k for k in range(8))
        assert _bit_unshuffle(shuffled, 1) == data
        # Multi-byte typesize: planes are per source byte, ordered
        # byte-major (byte b's planes occupy rows b*8..b*8+7).
        le16 = np.arange(8, dtype="<u2") * 257  # low==high byte
        sh = _bit_unshuffle(_bit_shuffle(le16.tobytes(), 2), 2)
        assert sh == le16.tobytes()

    def test_verbatim_blocks(self):
        # Incompressible data → blocks stored raw (csize == dst_size).
        from correrender_tpu.io.blosc import blosc_compress, blosc_decompress

        data = np.random.default_rng(1).bytes(40000)
        frame = blosc_compress(data, typesize=1, cname="zlib",
                               blocksize=8192, shuffle=False)
        assert blosc_decompress(frame) == data

    def test_lz4_inner_codec(self):
        # Encode an lz4 frame with the system liblz4 to exercise the
        # decode path real Zarr stores use.
        import ctypes
        import ctypes.util
        import struct

        from correrender_tpu.io.blosc import blosc_decompress

        lib = ctypes.CDLL(ctypes.util.find_library("lz4") or "liblz4.so.1")
        lib.LZ4_compress_default.restype = ctypes.c_int
        data = (np.arange(5000, dtype=np.float32) * 0.5).tobytes()
        bound = lib.LZ4_compressBound(len(data))
        out = ctypes.create_string_buffer(bound)
        n = lib.LZ4_compress_default(data, out, len(data), bound)
        assert n > 0
        comp = out.raw[:n]
        header = struct.pack("<BBBB", 2, 0, 1 << 5, 4)
        header += struct.pack("<III", len(data), len(data),
                              16 + 4 + 4 + len(comp))
        frame = header + struct.pack("<i", 20) + struct.pack(
            "<i", len(comp)) + comp
        assert blosc_decompress(frame) == data

    def test_zarr_blosc_store(self, tmp_path):
        # End-to-end: blosc-compressed zarr chunk through the loader.
        from correrender_tpu.io.blosc import blosc_compress
        from correrender_tpu.io.zarr_lite import ZarrArray

        data = np.arange(4 * 6 * 8, dtype="<f4").reshape(4, 6, 8)
        adir = tmp_path / "a.zarr" / "q"
        adir.mkdir(parents=True)
        (adir / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [4, 6, 8], "chunks": [4, 6, 8],
            "dtype": "<f4",
            "compressor": {"id": "blosc", "cname": "zstd",
                           "clevel": 5, "shuffle": 1},
            "fill_value": 0, "order": "C", "filters": None,
        }))
        (adir / "0.0.0").write_bytes(
            blosc_compress(data.tobytes(), typesize=4, cname="zstd")
        )
        arr = ZarrArray(str(adir))
        np.testing.assert_array_equal(arr[:, :, :], data)


class TestGrib:
    def test_roundtrip_multilevel(self, tmp_path):
        from correrender_tpu.io.grib import GribLoader, write_grib2

        rng = np.random.default_rng(0)
        t_f = (250 + 30 * rng.random(size=(3, 10, 16))).astype(np.float32)
        u_f = (rng.normal(size=(3, 10, 16)) * 10).astype(np.float32)
        path = str(tmp_path / "f.grb2")
        write_grib2(path, {"t": t_f, "u": u_f},
                    lat=(-30.0, 60.0), lon=(0.0, 150.0), nbits=20)
        ld = GribLoader().open(path)
        assert ld.field_names == ["t", "u"]
        assert (ld.zs, ld.ys, ld.xs, ld.ts) == (3, 10, 16, 1)
        assert ld.levels == [1000.0, 900.0, 800.0]
        np.testing.assert_allclose(ld.load_field("t"), t_f, atol=1e-3)
        np.testing.assert_allclose(ld.load_field("u"), u_f, atol=1e-3)
        np.testing.assert_allclose(
            [ld.lat[0], ld.lat[-1]], [-30.0, 60.0], atol=1e-5
        )

    def test_constant_field_and_registry(self, tmp_path):
        from correrender_tpu.io.base import loader_for_path
        from correrender_tpu.io.grib import write_grib2

        const = np.full((1, 4, 5), 7.25, np.float32)
        path = str(tmp_path / "c.grib")
        write_grib2(path, {"t": const})
        ld = loader_for_path(path).open(path)
        np.testing.assert_allclose(ld.load_field("t"), const, atol=1e-6)

    @pytest.mark.parametrize(
        "packing", ["complex", "complex_diff1", "complex_diff2"]
    )
    def test_complex_packing_roundtrip(self, tmp_path, packing):
        # Templates 5.2/5.3 — the NCEP-standard encodings (complex
        # packing, optionally with 1st/2nd-order spatial differencing).
        from correrender_tpu.io.grib import GribLoader, write_grib2

        rng = np.random.default_rng(3)
        # Smooth + noise: realistic spatial-differencing statistics.
        base = np.cumsum(rng.normal(size=(2, 12, 37)), axis=-1)
        t_f = (250 + base + 0.1 * rng.random((2, 12, 37))).astype(
            np.float32
        )
        path = str(tmp_path / f"{packing}.grb2")
        write_grib2(path, {"t": t_f}, nbits=18, packing=packing)
        ld = GribLoader().open(path)
        got = ld.load_field("t")
        np.testing.assert_allclose(got, t_f, atol=2e-3)

    def test_complex_packing_matches_simple(self, tmp_path):
        from correrender_tpu.io.grib import GribLoader, write_grib2

        rng = np.random.default_rng(4)
        f = (rng.random((1, 9, 21)) * 100).astype(np.float32)
        ps, pc = str(tmp_path / "s.grb2"), str(tmp_path / "c.grb2")
        write_grib2(ps, {"t": f}, nbits=16, packing="simple")
        write_grib2(pc, {"t": f}, nbits=16, packing="complex_diff2")
        a = GribLoader().open(ps).load_field("t")
        b = GribLoader().open(pc).load_field("t")
        # identical integer pipeline → identical decoded values
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestVts:
    def test_structured_grid_ascii(self, tmp_path, vol_zyx):
        # .vts: StructuredGrid with explicit Points; fields load on the
        # regular index grid, spacing derived from coordinate bounds.
        zs, ys, xs = vol_zyx.shape
        z, y, x = np.meshgrid(
            np.arange(zs) * 2.0, np.arange(ys) * 1.0,
            np.arange(xs) * 0.5, indexing="ij",
        )
        pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
        flat = " ".join(str(v) for v in vol_zyx.ravel())
        pts_s = " ".join(str(v) for v in pts.ravel())
        vts = tmp_path / "g.vts"
        vts.write_text(
            '<VTKFile type="StructuredGrid" version="1.0">'
            f'<StructuredGrid WholeExtent="0 {xs-1} 0 {ys-1} 0 {zs-1}">'
            "<Piece><Points>"
            '<DataArray type="Float32" NumberOfComponents="3"'
            f' format="ascii">{pts_s}</DataArray>'
            "</Points><PointData>"
            f'<DataArray type="Float32" Name="s" format="ascii">{flat}'
            "</DataArray></PointData></Piece></StructuredGrid></VTKFile>"
        )
        ld = loader_for_path(str(vts)).open(str(vts))
        np.testing.assert_allclose(ld.load_field("s"), vol_zyx, atol=1e-5)
        assert ld.dx == pytest.approx(0.5) and ld.dz == pytest.approx(2.0)

    def test_repeated_section_groups_one_message(self, tmp_path):
        # GRIB2 allows several (4,5,6,7) groups per message; every
        # group is its own field.
        import struct

        from correrender_tpu.io.grib import GribLoader, write_grib2

        t_f = np.full((1, 4, 5), 280.0, np.float32)
        u_f = np.full((1, 4, 5), -5.0, np.float32)
        pa = str(tmp_path / "a.grb2")
        pb = str(tmp_path / "b.grb2")
        write_grib2(pa, {"t": t_f})
        write_grib2(pb, {"u": u_f})
        a = open(pa, "rb").read()
        b = open(pb, "rb").read()

        def sections(buf):
            # (sec_num, bytes) list between the indicator and 7777.
            out, pos = [], 16
            while pos < len(buf) - 4:
                ln, num = struct.unpack(">IB", buf[pos:pos + 5])
                out.append((num, buf[pos:pos + ln]))
                pos += ln
            return out

        groups_b = b"".join(
            blob for num, blob in sections(b) if num in (4, 5, 6, 7)
        )
        body = a[16:-4] + groups_b
        total = 16 + len(body) + 4
        merged = a[:8] + struct.pack(">Q", total) + body + b"7777"
        pm = str(tmp_path / "m.grb2")
        open(pm, "wb").write(merged)
        ld = GribLoader().open(pm)
        assert sorted(ld.field_names) == ["t", "u"]
        np.testing.assert_allclose(ld.load_field("t"), t_f, atol=1e-4)
        np.testing.assert_allclose(ld.load_field("u"), u_f, atol=1e-4)

    def test_scale_and_heightscale_affect_spacing(self, tmp_path, vol_zyx):
        writers.write_netcdf(str(tmp_path / "h.nc"), vol_zyx)
        catalog = {"datasets": [{
            "name": "h", "filename": "h.nc",
            "scale": [2.0, 1.0, 1.0], "heightscale": 3.0,
        }]}
        cpath = tmp_path / "datasets.json"
        cpath.write_text(json.dumps(catalog))
        info = load_catalog(str(cpath))[0]
        vd = open_dataset(info)
        assert vd.grid.dx == pytest.approx(2.0)
        # heightscale is render-only (MainApp.cpp:2001-2003): physical
        # spacing stays 1.0 so derivative calculators are unaffected,
        # but the render-space box is stretched 3x in y.
        assert vd.grid.dy == pytest.approx(1.0)
        assert vd.grid.render_height_scale == pytest.approx(3.0)
        _, wmax = vd.grid.world_box()
        ys = vd.grid.ys
        assert wmax[1] == pytest.approx((ys - 1) * 3.0)
        # Values untouched (scale is geometric in the reference).
        np.testing.assert_allclose(
            np.asarray(vd.get_field("data")), vol_zyx, rtol=1e-6
        )

    def test_data_date_time_filter(self, tmp_path):
        from correrender_tpu.io.catalog import DataSetInformation
        from correrender_tpu.io.grib import GribLoader, write_grib2

        a = np.full((1, 4, 5), 1.0, np.float32)
        b = np.full((1, 4, 5), 2.0, np.float32)
        pa = str(tmp_path / "a.grb2")
        pb = str(tmp_path / "b.grb2")
        write_grib2(pa, {"t": a}, date=20200101, time=0)
        write_grib2(pb, {"t": b}, date=20200102, time=1200)
        merged = str(tmp_path / "m.grb2")
        with open(merged, "wb") as f:
            f.write(open(pa, "rb").read() + open(pb, "rb").read())
        # Unfiltered: two time steps.
        ld = GribLoader().open(merged)
        assert ld.ts == 2
        # data_date/data_time select one analysis time.
        info = DataSetInformation(date="20200102", data_time="1200")
        ld = GribLoader().open(merged, dataset_info=info)
        assert ld.ts == 1
        np.testing.assert_allclose(ld.load_field("t"), b, atol=1e-5)


class TestGribEncoderRegressions:
    def test_complex_non_octet_group_len_roundtrip(self, tmp_path):
        # Group values are ONE contiguous bit stream (decoder reads
        # them without re-aligning): per-group octet padding — which a
        # group_len that is a multiple of 8 can never expose — shifted
        # every following group's bits (round-3 self-review).
        from correrender_tpu.io.grib import GribLoader, write_grib2

        rng = np.random.default_rng(5)
        f = (np.cumsum(rng.normal(size=(1, 11, 23)), axis=-1)
             + 0.2 * rng.random((1, 11, 23))).astype(np.float32)
        for packing in ("complex", "complex_diff2"):
            path = str(tmp_path / f"g20_{packing}.grb2")
            write_grib2(path, {"t": f}, nbits=17, packing=packing,
                        group_len=20)
            got = GribLoader().open(path).load_field("t")
            np.testing.assert_allclose(got, f, atol=2e-3)

    def test_complex_diff_degenerate_grid(self, tmp_path):
        # n ≤ diff_order grids must drop to a lower order instead of
        # advertising more initial values than the header holds.
        from correrender_tpu.io.grib import GribLoader, write_grib2

        for shape in ((1, 1, 1), (1, 1, 2)):
            f = (np.arange(np.prod(shape), dtype=np.float32)
                 .reshape(shape) + 3.5)
            path = str(tmp_path / f"deg{shape[-1]}.grb2")
            write_grib2(path, {"t": f}, nbits=12,
                        packing="complex_diff2")
            got = GribLoader().open(path).load_field("t")
            np.testing.assert_allclose(got, f, atol=1e-3)

    def test_native_and_numpy_decoders_agree(self, tmp_path, monkeypatch):
        # The native bit-unpack fast path (native/io_codec.cpp) and the
        # numpy fallback must decode identically.
        import correrender_tpu.io.grib as G
        from correrender_tpu.io.grib import GribLoader, write_grib2

        rng = np.random.default_rng(7)
        f = np.cumsum(rng.normal(size=(2, 9, 31)), axis=-1).astype(
            np.float32
        )
        outs = {}
        for packing in ("simple", "complex_diff1"):
            p = str(tmp_path / f"agree_{packing}.grb2")
            write_grib2(p, {"t": f}, nbits=15, packing=packing)
            for native in (True, False):
                monkeypatch.setattr(G, "_IO_CODEC_TRIED", not native)
                monkeypatch.setattr(G, "_IO_CODEC", None)
                outs[(packing, native)] = GribLoader().open(p).load_field("t")
            np.testing.assert_array_equal(
                outs[(packing, True)], outs[(packing, False)]
            )

    def test_nan_voxels_roundtrip_via_bitmap(self, tmp_path):
        # NaN voxels must encode through a section-6 bitmap and decode
        # back as NaN (they silently became the field minimum).
        from correrender_tpu.io.grib import GribLoader, write_grib2

        rng = np.random.default_rng(8)
        f = rng.random((1, 7, 19)).astype(np.float32) * 50
        f[0, 2, 3:9] = np.nan
        f[0, 6, 0] = np.nan
        for packing in ("simple", "complex_diff1"):
            path = str(tmp_path / f"nan_{packing}.grb2")
            write_grib2(path, {"t": f}, nbits=14, packing=packing)
            got = GribLoader().open(path).load_field("t")
            np.testing.assert_array_equal(np.isnan(got), np.isnan(f))
            m = np.isfinite(f)
            np.testing.assert_allclose(got[m], f[m], atol=2e-2)


class TestMultiFileSeries:
    """load_volume file-series layouts (round-3 review regressions)."""

    def _write_series(self, tmp_path, n, shape, offset_scale=1.0):
        from correrender_tpu.io import writers

        rng = np.random.default_rng(0)
        paths = []
        for m in range(n):
            p = str(tmp_path / f"s{m:02d}.nc")
            writers.write_netcdf(
                p,
                (rng.normal(size=shape) + offset_scale * m).astype(
                    np.float32
                ),
                name="v",
            )
            paths.append(p)
        return paths

    def test_catalog_time_steps_list(self, tmp_path):
        # catalog time_range expansion stores a LIST of indices;
        # assigning it as the timestep count raised TypeError.
        from correrender_tpu.io.base import load_volume
        from correrender_tpu.io.catalog import DataSetInformation

        paths = self._write_series(tmp_path, 6, (1, 4, 8, 8))
        info = DataSetInformation(name="series", filenames=paths)
        info.time_steps = [0, 1]
        vd = load_volume(paths, dataset_info=info)
        assert (vd.grid.ts, vd.grid.es) == (2, 3)

    def test_one_member_per_file_with_timesteps(self, tmp_path):
        # Files carrying several timesteps each = one member per file.
        from correrender_tpu.io.base import load_volume

        paths = self._write_series(tmp_path, 3, (5, 4, 8, 8),
                                   offset_scale=10.0)
        vd = load_volume(paths)
        assert (vd.grid.ts, vd.grid.es) == (5, 3)
        m2t3 = np.asarray(vd.get_field("v", 3, 2))
        assert 15 < m2t3.mean() < 25  # file 2's offset

    def test_raw_ushort_sniffing(self, tmp_path):
        # 'short' is a substring of 'ushort' — iteration order loaded
        # ushort volumes as int16.
        from correrender_tpu.io.base import loader_for_path

        rng = np.random.default_rng(1)
        raw = (rng.random((4, 8, 8)) * 60000).astype(np.uint16)
        p = str(tmp_path / "vol_8x8x4_ushort.raw")
        raw.tofile(p)
        ld = loader_for_path(p).open(p)
        arr = ld.load_field(ld.field_names[0])
        assert arr.min() >= 0.0 and arr.max() <= 1.0
        assert arr.max() > 0.8  # u16 normalization, not wrapped int16

    def test_randomized_roundtrip_sweep(self, tmp_path):
        # Property sweep: random shapes x packings x NaN patterns x
        # group lengths must round-trip within quantization tolerance.
        from correrender_tpu.io.grib import GribLoader, write_grib2

        rng = np.random.default_rng(42)
        for trial in range(12):
            nz = int(rng.integers(1, 3))
            nj = int(rng.integers(1, 24))
            ni = int(rng.integers(1, 40))
            packing = ("simple", "complex", "complex_diff1",
                       "complex_diff2")[trial % 4]
            group_len = int(rng.integers(3, 48))
            nbits = int(rng.integers(8, 20))
            f = np.cumsum(
                rng.normal(size=(nz, nj, ni)), axis=-1
            ).astype(np.float32) * rng.uniform(0.01, 100)
            if trial % 3 == 0 and f.size > 4:
                flat = f.reshape(-1)
                flat[rng.integers(0, flat.size,
                                  size=max(flat.size // 7, 1))] = np.nan
            path = str(tmp_path / f"sweep{trial}.grb2")
            write_grib2(path, {"t": f}, nbits=nbits, packing=packing,
                        group_len=group_len)
            got = GribLoader().open(path).load_field("t")
            np.testing.assert_array_equal(np.isnan(got), np.isnan(f))
            m = np.isfinite(f)
            if m.any():
                span = float(np.nanmax(f) - np.nanmin(f)) or 1.0
                tol = max(span / (2**nbits - 1) * 1.01, 1e-6)
                assert np.abs(got[m] - f[m]).max() <= tol, (
                    trial, packing, group_len, nbits
                )


def test_tet_mesh_partitions_each_cell_exactly_once():
    """Monte-Carlo: every interior point of a cell must lie in exactly
    ONE tetrahedron (round-3 review: a face-diagonal fan left ~25% of
    each cell uncovered and double-covered ~25% — total volume still
    summed to 1.0, so only point-coverage catches it)."""
    from correrender_tpu.io.writers import voxels_to_tet_mesh

    verts, tets = voxels_to_tet_mesh(np.ones((2, 2, 2)), 0.5)
    assert len(tets) == 6
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.95, size=(2000, 3))
    counts = np.zeros(len(pts), int)
    for t in tets:
        a, b, c, d = (verts[i].astype(np.float64) for i in t)
        m = np.stack([b - a, c - a, d - a], axis=-1)  # (3, 3)
        bary = np.linalg.solve(m, (pts - a).T).T  # (N, 3)
        inside = (bary > 1e-9).all(axis=1) & (bary.sum(axis=1) < 1 - 1e-9)
        counts += inside
    assert (counts == 1).all()


class TestRound3IoReviewFixes:
    def test_per_timestep_member_files(self, tmp_path):
        # One file PER TIMESTEP, each holding the full ensemble: es
        # must stay the in-file member count and t must select the
        # file (round-3 review: es inflated by the file count and
        # every timestep served timestep-0 data).
        import dataclasses

        es, ts = 4, 3
        for t in range(ts):
            data = np.full((es, 2, 4, 4), 10.0 * t, np.float32)
            data += np.arange(es, dtype=np.float32)[:, None, None, None]
            writers.write_netcdf(str(tmp_path / f"t_{t}.nc"),
                                 data[:, None], name="q")
        catalog = {"datasets": [{
            "name": "series", "filename": "t_%d.nc",
            "time_range": "0 3",
        }]}
        cpath = tmp_path / "datasets.json"
        cpath.write_text(json.dumps(catalog))
        info = load_catalog(str(cpath))[0]
        vd = open_dataset(info)
        assert vd.grid.es == es and vd.grid.ts == ts
        for t in range(ts):
            for e in (0, es - 1):
                got = np.asarray(vd.get_field("q", t, e))
                np.testing.assert_allclose(got, 10.0 * t + e)

    def test_scalar_fill_value_attr(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        path = str(tmp_path / "s.nc")
        data = np.ones((2, 4, 4), np.float32)
        data[0, 0, 0] = 9.96921e36
        with h5py.File(path, "w") as f:
            dset = f.create_dataset("q", data=data)
            # Scalar (not 1-element array) _FillValue: [0]-indexing
            # raised IndexError and silently disabled NaN masking.
            dset.attrs["_FillValue"] = np.float32(9.96921e36)
        ld = loader_for_path(path)
        ld.open(path)
        arr = ld.load_field("q")
        assert np.isnan(arr[0, 0, 0])
        assert np.isfinite(arr[1:]).all()

    def test_raw_uint8_suffix_sniffing(self, tmp_path):
        # 'uint' longest-matched inside '_uint8' and loaded as uint32.
        vol = np.arange(4 * 4 * 2, dtype=np.uint8)
        path = str(tmp_path / "vol_4x4x2_uint8.raw")
        vol.tofile(path)
        ld = loader_for_path(path)
        ld.open(path)
        arr = ld.load_field(ld.field_names[0])
        assert arr.shape == (2, 4, 4)
        np.testing.assert_allclose(
            arr.ravel(), vol.astype(np.float32) / 255.0)

    def test_vti_base64_appended(self, tmp_path):
        import base64 as b64

        data = np.arange(4 * 4 * 2, dtype=np.float32)
        payload = struct.pack("<I", data.nbytes) + data.tobytes()
        enc = b64.b64encode(payload).decode()
        xml = f"""<?xml version="1.0"?>
<VTKFile type="ImageData" version="0.1" byte_order="LittleEndian">
  <ImageData WholeExtent="0 3 0 3 0 1" Spacing="1 1 1">
    <Piece Extent="0 3 0 3 0 1">
      <PointData>
        <DataArray type="Float32" Name="q" format="appended" offset="0"/>
      </PointData>
    </Piece>
  </ImageData>
  <AppendedData encoding="base64">_{enc}</AppendedData>
</VTKFile>"""
        path = str(tmp_path / "b.vti")
        with open(path, "w") as f:
            f.write(xml)
        ld = loader_for_path(path)
        ld.open(path)
        arr = ld.load_field("q")
        np.testing.assert_allclose(arr.ravel(), data)

    def test_grib_custom_names_stay_distinct(self, tmp_path):
        from correrender_tpu.io.grib import GribLoader, write_grib2

        a = np.random.default_rng(0).normal(size=(2, 8, 8)).astype(
            np.float64)
        b = a + 100.0
        path = str(tmp_path / "two.grib2")
        write_grib2(path, {"mi": a, "corr": b})
        ld = GribLoader()
        ld.open(path)
        # Both custom-named fields survive (one shared fallback code
        # collapsed them into a single decoded field).
        assert len(ld.field_names) == 2

    def test_netcdf_unknown_vertical_dim_is_z(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        path = str(tmp_path / "sig.nc")
        data = np.random.default_rng(1).normal(
            size=(3, 2, 4, 4)).astype(np.float32)
        with h5py.File(path, "w") as f:
            f.create_dataset("q", data=data)
            f["q"].dims[0].label = "ensemble"
            f["q"].dims[1].label = "sigma"  # unrecognized vertical dim
            f["q"].dims[2].label = "lat"
            f["q"].dims[3].label = "lon"
        ld = loader_for_path(path)
        ld.open(path)
        assert "q" in ld.field_names  # previously dropped as z-less
        assert ld.es == 3 and ld.zs == 2


class TestMemberGroupTimestepDisambiguation:
    def test_member_groups_not_hijacked_by_timestep_count(self, tmp_path):
        # 3 files, each holding (e=4, t=3) member groups: the file
        # count EQUALS the timestep count, but the timesteps live
        # inside the files — the one-file-per-timestep heuristic
        # collapsed es 12 → 4 and served timestep-0 data for every t
        # (round-3 review). per_file_ts == 1 now gates the heuristic.
        from correrender_tpu.io import writers
        from correrender_tpu.io.base import load_volume
        from correrender_tpu.io.catalog import DataSetInformation

        rng = np.random.default_rng(3)
        paths = []
        for m in range(3):
            p = str(tmp_path / f"g{m}.nc")
            data = (
                0.1 * rng.normal(size=(4, 3, 2, 8, 8))
                + 100.0 * m
                + np.arange(3)[None, :, None, None, None]
            ).astype(np.float32)
            writers.write_netcdf(p, data, name="v")
            paths.append(p)
        info = DataSetInformation(name="groups", filenames=paths)
        info.time_steps = [0, 1, 2]
        vd = load_volume(paths, dataset_info=info)
        assert (vd.grid.ts, vd.grid.es) == (3, 12)
        # Member 5 = file 1's in-file member 1; timestep 2 adds +2.
        a = np.asarray(vd.get_field("v", 2, 5))
        assert 101.5 < a.mean() < 102.5

    def test_one_file_per_timestep_still_detected(self, tmp_path):
        # The fixed heuristic must still serve the layout it was built
        # for: one single-timestep file per t, members inside.
        from correrender_tpu.io import writers
        from correrender_tpu.io.base import load_volume
        from correrender_tpu.io.catalog import DataSetInformation

        rng = np.random.default_rng(4)
        paths = []
        for t in range(3):
            p = str(tmp_path / f"t{t}.nc")
            data = (
                0.1 * rng.normal(size=(4, 1, 2, 8, 8)) + 10.0 * t
            ).astype(np.float32)
            writers.write_netcdf(p, data, name="v")
            paths.append(p)
        info = DataSetInformation(name="perts", filenames=paths)
        info.time_steps = [0, 1, 2]
        vd = load_volume(paths, dataset_info=info)
        assert (vd.grid.ts, vd.grid.es) == (3, 4)
        a = np.asarray(vd.get_field("v", 2, 1))
        assert 19.5 < a.mean() < 20.5


class TestGribCustomParamCodes:
    def test_many_custom_fields_roundtrip_distinct(self, tmp_path):
        # 70 custom-named fields: 192+i overflowed the local-use
        # octet at the 64th field (255 = GRIB2 "missing", then
        # struct.error) — codes now spill into further local-use
        # categories (round-3 review).
        from correrender_tpu.io.grib import GribLoader, write_grib2

        rng = np.random.default_rng(7)
        fields = {
            f"zz_custom_{i}": rng.normal(size=(1, 4, 6)).astype(
                np.float32
            )
            for i in range(70)
        }
        path = str(tmp_path / "many.grb2")
        write_grib2(path, fields)
        ld = GribLoader().open(path)
        assert len(ld.field_names) == 70  # all distinct, none merged
        for name in ld.field_names[:3]:
            assert np.isfinite(ld.load_field(name)).all()


class TestZarrWriter:
    def test_round_trip_zlib_and_raw(self, tmp_path):
        from correrender_tpu.io.writers import write_zarr
        from correrender_tpu.io.zarr_lite import ZarrArray

        rng = np.random.default_rng(3)
        arr = rng.standard_normal((3, 2, 5, 6, 7)).astype(np.float32)
        for comp in ("zlib", None):
            path = str(tmp_path / f"store_{comp}.zarr")
            write_zarr(path, arr, compressor=comp)
            back = ZarrArray(path)[:]
            np.testing.assert_array_equal(back, arr)

    def test_edge_chunks_and_loader(self, tmp_path):
        from correrender_tpu.io import load_volume
        from correrender_tpu.io.writers import write_zarr

        rng = np.random.default_rng(4)
        # Non-divisible chunking exercises edge-chunk zero padding.
        arr = rng.standard_normal((4, 1, 5, 9, 11)).astype(np.float32)
        path = str(tmp_path / "ens.zarr")
        write_zarr(path, arr, chunks=(1, 1, 4, 4, 8),
                   attrs={"field": "data"})
        vd = load_volume(path)
        g = vd.grid
        assert (g.es, g.ts, g.zs, g.ys, g.xs) == (4, 1, 5, 9, 11)
        got = np.asarray(vd.get_field(vd.field_names[0], 0, 2))
        np.testing.assert_allclose(got, arr[2, 0], atol=1e-6)

    def test_save_field_zarr(self, tmp_path):
        from correrender_tpu.core import GridMetadata, VolumeData
        from correrender_tpu.io import writers
        from correrender_tpu.io.zarr_lite import ZarrArray

        vd = VolumeData(GridMetadata(xs=6, ys=5, zs=4, es=2))
        data = np.random.default_rng(5).standard_normal(
            (2, 4, 5, 6)).astype(np.float32)
        vd.add_field("f", lambda t, e: data[e])
        out = str(tmp_path / "f.zarr")
        writers.save_field(vd, "f", out, member=1)
        np.testing.assert_array_equal(ZarrArray(out)[:], data[1])
