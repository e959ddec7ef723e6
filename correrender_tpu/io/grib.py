"""GRIB loader — gated (eccodes/cfgrib are not in this image).

Reference: src/Loaders/GribLoader.cpp (eccodes). This stub registers
the extension so catalog entries resolve, and raises a clear error
with remediation instead of failing opaquely.
"""

from __future__ import annotations

from correrender_tpu.io.base import VolumeLoader, register_loader


@register_loader
class GribLoader(VolumeLoader):
    extensions = ("grb", "grib", "grb2", "grib2")

    def open(self, path, dataset_info=None):
        try:
            import cfgrib  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                f"cannot load {path!r}: GRIB decoding requires the "
                "'cfgrib'/'eccodes' packages, which are not installed in "
                "this environment. Convert the file to NetCDF "
                "(`grib_to_netcdf`/`cdo -f nc copy`) or install cfgrib."
            )
        raise NotImplementedError("cfgrib backend not wired yet")

    def load_field(self, name, time=0, member=0):  # pragma: no cover
        raise NotImplementedError
