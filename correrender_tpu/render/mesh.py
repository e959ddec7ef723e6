"""Isosurface mesh extraction (native marching tetrahedra) + export.

Role parity with the reference's IsoSurfaceRasterizer CPU extraction
(src/Renderers/IsoSurfaceRasterizer.cpp:163-173, IsosurfaceCpp
submodule) and mesh export hooks (src/Export/WriteMesh.cpp).
"""

from __future__ import annotations

import ctypes

import numpy as np


def extract_isosurface(volume: np.ndarray, iso_value: float,
                       dedupe: bool = True, snap_gamma: float = 0.0):
    """Extract a triangle mesh of the iso-level set.

    Args:
      volume: (Z, Y, X) float32 scalar grid (NaN cells are skipped).
      iso_value: the iso level.
      dedupe: merge duplicate vertices (indexed mesh) — needed for
        watertight exports.
      snap_gamma: SnapMC snapping threshold in [0, 0.5): edge
        intersections within gamma of a grid vertex snap onto it and
        the resulting degenerate slivers are dropped (reference
        IsoSurfaces.hpp:32-34; 0 = plain marching).

    Returns:
      (vertices (V, 3) float32 in voxel xyz space, triangles (T, 3) int64)
    """
    from correrender_tpu.native import build_and_load

    dll = build_and_load("isosurface")
    dll.isosurface_extract.restype = ctypes.c_int64
    dll.isosurface_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ]
    dll.isosurface_free.argtypes = [ctypes.POINTER(ctypes.c_float)]

    vol = np.ascontiguousarray(volume, np.float32)
    zs, ys, xs = vol.shape
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    nverts = dll.isosurface_extract(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        zs, ys, xs, ctypes.c_float(iso_value),
        ctypes.c_float(snap_gamma), ctypes.byref(out_ptr),
    )
    if nverts == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    flat = np.ctypeslib.as_array(out_ptr, shape=(nverts * 3,)).copy()
    dll.isosurface_free(out_ptr)
    verts = flat.reshape(nverts, 3)
    tris = np.arange(nverts, dtype=np.int64).reshape(-1, 3)
    if dedupe:
        verts, inverse = np.unique(
            verts.round(decimals=5), axis=0, return_inverse=True
        )
        tris = inverse[tris.ravel()].reshape(-1, 3)
        # Snapped (or merged) corners can collapse a triangle to a
        # point or a line — drop zero-area faces.
        e1 = verts[tris[:, 1]] - verts[tris[:, 0]]
        e2 = verts[tris[:, 2]] - verts[tris[:, 0]]
        areas = np.linalg.norm(np.cross(e1, e2), axis=1)
        tris = tris[areas > 1e-7]
    return verts.astype(np.float32), tris


def vertex_normals(vertices: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals."""
    tri_pts = vertices[triangles]
    face_n = np.cross(
        tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0]
    )
    normals = np.zeros_like(vertices)
    for i in range(3):
        np.add.at(normals, triangles[:, i], face_n)
    norm = np.linalg.norm(normals, axis=-1, keepdims=True)
    return normals / np.maximum(norm, 1e-30)
