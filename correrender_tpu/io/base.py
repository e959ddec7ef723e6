"""Loader protocol and registry.

Mirrors the reference's ``VolumeLoader`` contract
(src/Loaders/VolumeLoader.hpp:40-52): ``open()`` reads metadata only
(grid dims, field names, time/member counts); voxel data is pulled
lazily per (field, time, member). Loaders for per-member file series
reuse the first file's metadata (VolumeLoader.hpp:49-51).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_LOADER_REGISTRY: dict[str, type] = {}


def register_loader(cls):
    """Class decorator: register under ``cls.extensions``."""
    for ext in cls.extensions:
        _LOADER_REGISTRY[ext.lower()] = cls
    return cls


def loader_for_path(path: str):
    """Instantiate the right loader for a file path."""
    base = path.rstrip("/")
    ext = os.path.splitext(base)[1].lstrip(".").lower()
    if not ext and base.endswith(".zarr"):
        ext = "zarr"
    cls = _LOADER_REGISTRY.get(ext)
    if cls is None:
        raise ValueError(
            f"no loader for extension {ext!r} (path {path!r}); "
            f"known: {sorted(_LOADER_REGISTRY)}"
        )
    return cls()


class VolumeLoader:
    """Base loader: subclasses fill the metadata attributes in open()."""

    extensions: tuple = ()

    def __init__(self):
        self.path: Optional[str] = None
        self.xs = self.ys = self.zs = 0
        self.ts = 1
        self.es = 1
        self.dx = self.dy = self.dz = 1.0
        self.field_names: list[str] = []
        self.lat = None
        self.lon = None
        self.height = None

    # -- protocol --------------------------------------------------------

    def open(self, path: str, dataset_info=None) -> "VolumeLoader":
        raise NotImplementedError

    def load_field(self, name: str, time: int = 0, member: int = 0) -> np.ndarray:
        """Return one (Z, Y, X) float32 slab."""
        raise NotImplementedError

    # -- helpers ---------------------------------------------------------

    def apply_transforms(self, arr: np.ndarray, dataset_info=None) -> np.ndarray:
        """Catalog-driven transforms: scale, subsampling, subselection,
        format cast (DataSetList.cpp:60-305)."""
        if dataset_info is None:
            return arr
        info = dataset_info
        if info.domain_subselection is not None:
            (x0, y0, z0), (x1, y1, z1) = info.domain_subselection
            arr = arr[z0 : z1 + 1, y0 : y1 + 1, x0 : x1 + 1]
        f = info.subsampling_factor
        if f and f > 1:
            arr = arr[::f, ::f, ::f]
        if info.format_cast is not None:
            arr = arr.astype(info.format_cast).astype(np.float32)
        if info.axes is not None and list(info.axes) != [0, 1, 2]:
            # Axis permutation (reference: `axes` catalog key →
            # VolumeData::setTransposeAxes, VolumeData.cpp:654-655 and
            # :1281-1308 — the reference supports only the y↔z swap
            # (0,2,1); any permutation is accepted here). `axes` is in
            # world (x,y,z) order; slabs are (z,y,x).
            p = list(info.axes)
            arr = np.transpose(arr, [2 - p[2 - j] for j in range(3)])
        return arr

    def grid_metadata(self, dataset_info=None):
        from correrender_tpu.core.fields import GridMetadata

        xs, ys, zs = self.xs, self.ys, self.zs
        dx, dy, dz = self.dx, self.dy, self.dz
        if dataset_info is not None:
            f = dataset_info.subsampling_factor
            if dataset_info.domain_subselection is not None:
                (x0, y0, z0), (x1, y1, z1) = dataset_info.domain_subselection
                xs, ys, zs = x1 - x0 + 1, y1 - y0 + 1, z1 - z0 + 1
            if f and f > 1:
                xs, ys, zs = -(-xs // f), -(-ys // f), -(-zs // f)
                dx, dy, dz = dx * f, dy * f, dz * f
            if dataset_info.scale is not None:
                sx, sy, sz = dataset_info.scale
                # Reference semantics: catalog scale multiplies the
                # grid spacing (e.g. ZarrLoader.cpp:225-227), not the
                # field values.
                dx, dy, dz = dx * sx, dy * sy, dz * sz
            if (dataset_info.axes is not None
                    and list(dataset_info.axes) != [0, 1, 2]):
                p = list(dataset_info.axes)
                dims = [xs, ys, zs]
                spac = [dx, dy, dz]
                xs, ys, zs = dims[p[0]], dims[p[1]], dims[p[2]]
                dx, dy, dz = spac[p[0]], spac[p[1]], spac[p[2]]
        hs = 1.0
        if dataset_info is not None and dataset_info.height_scale:
            # heightscale stretches the rendered y geometry only
            # (MainApp.cpp:2001-2003 applies scale(1, heightScale, 1)
            # at render time); physical spacing — and thus derivative
            # calculators — stay untouched.
            hs = float(dataset_info.height_scale)
        return GridMetadata(
            xs=xs, ys=ys, zs=zs, ts=self.ts, es=self.es,
            dx=dx, dy=dy, dz=dz, render_height_scale=hs,
        )


def load_volume(paths, dataset_info=None, cache_bytes=None):
    """Open file(s) and wire them into a :class:`VolumeData`.

    Mirrors ``VolumeData::setInputFiles`` (VolumeData.cpp:645-747):
    a single path yields one loader; a list of paths is a per-member
    (or per-timestep) file series with metadata reuse; u/v/w fields
    auto-register the velocity calculators.
    """
    from correrender_tpu.core.fields import VolumeData

    if isinstance(paths, (str, os.PathLike)):
        paths = [str(paths)]
    paths = [str(p) for p in paths]

    loaders = []
    first = None
    for p in paths:
        ld = loader_for_path(p)
        ld.open(p, dataset_info)
        if first is None:
            first = ld
        loaders.append(ld)

    es = first.es
    ts = first.ts
    per_file_es = first.es
    per_file_ts = first.ts
    if len(paths) > 1:
        # File series (VolumeData.cpp:663-673): ts from the catalog's
        # time_steps COUNT (the attribute itself is the index list —
        # assigning it to ts raised TypeError at max(ts, 1) and would
        # have stored a list as the timestep count, round-3 review);
        # es = numFiles / ts, or members stack across files when each
        # file already holds several.
        if dataset_info is not None and dataset_info.time_steps:
            ts = dataset_info.time_steps_count
        if per_file_es > 1:
            if ts > 1 and len(paths) == ts and per_file_ts == 1:
                # One file PER TIMESTEP, members inside each file —
                # es must stay the in-file member count; multiplying
                # by the file count inflated es and served timestep-0
                # data for every t (round-3 review). per_file_ts == 1
                # gates the heuristic: when the files THEMSELVES hold
                # the timesteps, a file count that merely equals the
                # timestep count is still a member-group series, and
                # this branch silently dropped those members
                # (round-3 review of the review).
                es = per_file_es
            else:
                es = per_file_es * len(paths)  # member groups per file
        elif per_file_ts > 1:
            es = len(paths)  # one member per file, timesteps inside
        else:
            es = max(len(paths) // max(ts, 1), 1)

    grid = first.grid_metadata(dataset_info)
    import dataclasses as _dc

    grid = _dc.replace(grid, ts=ts, es=es)
    member_dtype = None
    cast = getattr(dataset_info, "format_cast", None)
    if (cast is not None and np.dtype(cast).itemsize == 2
            and np.issubdtype(np.dtype(cast), np.floating)):
        # Reference float16 format_cast → bf16 member stacks on TPU
        # (halves HBM residency; estimators accumulate in float32).
        # Integer casts (short/ushort quantization) stay exact in f32:
        # bf16's 8-bit significand would collapse their levels.
        import jax.numpy as jnp

        member_dtype = jnp.bfloat16
    vd = VolumeData(grid, cache_bytes=cache_bytes,
                    member_stack_dtype=member_dtype)
    if getattr(dataset_info, "transform", None) is not None:
        # Custom model matrix (MainApp.cpp:1991-1996): honored by the
        # exact DVR path; Scene routes around the axis-aligned
        # shear-warp fast path when present.
        vd.model_matrix = np.asarray(dataset_info.transform, np.float32)
    vd.loaders = loaders
    vd.lat, vd.lon, vd.height = first.lat, first.lon, first.height

    def make_provider(name):
        def provider(t, e, _name=name):
            if len(loaders) > 1:
                if per_file_es > 1:
                    if ts > 1 and len(loaders) == ts and per_file_ts == 1:
                        # One file per timestep, members inside.
                        ld = loaders[t]
                        arr = ld.load_field(_name, 0, e)
                    else:
                        # Each file holds a member group: e spans
                        # files × in-file members (the old path
                        # indexed loaders[e] past the list and always
                        # loaded member 0).
                        ld = loaders[e // per_file_es]
                        arr = ld.load_field(_name, t, e % per_file_es)
                elif per_file_ts > 1:
                    # One file per member, timesteps inside the file.
                    ld = loaders[e]
                    arr = ld.load_field(_name, t, 0)
                else:
                    # One file per (member[, time]) snapshot.
                    ld = loaders[e] if ts == 1 else loaders[e * ts + t]
                    arr = ld.load_field(_name, 0, 0)
            else:
                arr = first.load_field(_name, t, e)
            arr = first.apply_transforms(arr, dataset_info)
            return np.ascontiguousarray(arr, np.float32)

        return provider

    for name in first.field_names:
        vd.add_field(name, make_provider(name))

    _auto_register_velocity(vd)
    return vd


def _auto_register_velocity(vd):
    """u/v/w (or U/V/W) present → register velocity-derived calculators
    (VolumeData.cpp:715-747)."""
    names = set(vd.field_names)
    for u, v, w in (("u", "v", "w"), ("U", "V", "W")):
        if {u, v, w} <= names:
            from correrender_tpu.calculators.velocity import (
                HelicityCalculator,
                VelocityMagnitudeCalculator,
                VorticityCalculator,
            )

            for cls in (
                VelocityMagnitudeCalculator,
                VorticityCalculator,
                HelicityCalculator,
            ):
                vd.add_calculator(cls(u=u, v=v, w=w))
            return
