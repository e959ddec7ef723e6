"""Native (C++) runtime components, built on demand with the system
toolchain and loaded via ctypes.

The reference implements its host-side hot paths in C++
(src/Calculators/Correlation.cpp, the IsosurfaceCpp submodule, loaders);
here native code covers the same roles where host-side performance
matters: the CPU baseline measurement, marching-cubes mesh extraction,
and binary volume-file codecs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE: dict[str, ctypes.CDLL] = {}


def build_and_load(name: str, extra_flags=()) -> ctypes.CDLL:
    """Compile ``<name>.cpp`` into a shared library (cached) and load it."""
    if name in _CACHE:
        return _CACHE[name]
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        # Compile to a PID-unique temp and rename atomically: a
        # concurrent process (pytest-xdist worker, second CLI) could
        # otherwise dlopen a partially written .so (round-3 review).
        tmp = f"{lib}.{os.getpid()}.tmp"
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            *extra_flags, "-o", tmp, src,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, lib)
    dll = ctypes.CDLL(lib)
    _CACHE[name] = dll
    return dll


def cpu_baseline():
    """The CPU Pearson-throughput baseline library.

    Built with ``-fopenmp``: the voxel loops parallelize like the
    reference's CPU path (CorrelationCalculator.cpp:878-1100), so the
    all-core denominator is measurable (``pearson_throughput_cpu_t``
    with threads=0) next to the single-core one (threads=1).
    """
    dll = build_and_load("cpu_baseline", extra_flags=("-fopenmp",))
    dll.pearson_throughput_cpu.restype = ctypes.c_double
    dll.pearson_throughput_cpu.argtypes = [ctypes.c_int64, ctypes.c_int]
    dll.pearson_throughput_cpu_t.restype = ctypes.c_double
    dll.pearson_throughput_cpu_t.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    dll.cpu_core_count.restype = ctypes.c_int
    dll.cpu_core_count.argtypes = []
    dll.ddr_bandwidth_gbs.restype = ctypes.c_double
    dll.ddr_bandwidth_gbs.argtypes = [ctypes.c_int64, ctypes.c_int]
    dll.pearson_field_cpu.restype = None
    dll.pearson_field_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    dll.ksg_throughput_cpu.restype = ctypes.c_double
    dll.ksg_throughput_cpu.argtypes = [
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    dll.ksg_field_cpu.restype = None
    dll.ksg_field_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    return dll


def ksg_field_cpu(reference, fields, k=3, estimator=1):
    """KSG MI field on the CPU baseline (fields: (es, V) member-major)."""
    import numpy as np

    dll = cpu_baseline()
    reference = np.ascontiguousarray(reference, np.float32)
    fields = np.ascontiguousarray(fields, np.float32)
    es, num_voxels = fields.shape
    out = np.empty(num_voxels, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    dll.ksg_field_cpu(
        reference.ctypes.data_as(fp), fields.ctypes.data_as(fp),
        num_voxels, es, k, estimator, out.ctypes.data_as(fp),
    )
    return out


def io_codec():
    """Native bit-unpack codec (GRIB2 hot loop), or None off-toolchain.

    Soft-fails to None so the pure-numpy decoders keep working on
    boxes without g++ — callers treat this strictly as a fast path.
    """
    try:
        dll = build_and_load("io_codec")
    except Exception:  # noqa: BLE001 - missing toolchain/compile error
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dll.unpack_bits_u64.restype = None
    dll.unpack_bits_u64.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int64, i64p,
    ]
    dll.unpack_groups_u64.restype = ctypes.c_int64
    dll.unpack_groups_u64.argtypes = [
        u8p, ctypes.c_int64, i64p, i64p, i64p, ctypes.c_int64, i64p,
    ]
    return dll
