"""I/O: volume loaders, writers, dataset catalog (reference L6 layer).

Loader registry by file extension mirrors the reference's factory map
(src/Volume/VolumeData.hpp:444-446). Python codec libraries are used at
the file boundary where available (h5py); NetCDF3, Zarr v2, VTK, NIfTI,
AmiraMesh and the group-internal binary formats are decoded natively
here (no netCDF4/zarr packages in the image).
"""

from correrender_tpu.io.base import (
    VolumeLoader,
    register_loader,
    loader_for_path,
    load_volume,
)
from correrender_tpu.io import netcdf  # noqa: F401  (registers)
from correrender_tpu.io import hdf5  # noqa: F401
from correrender_tpu.io import raw  # noqa: F401
from correrender_tpu.io import vtk  # noqa: F401
from correrender_tpu.io import zarr_lite  # noqa: F401
from correrender_tpu.io import nifti  # noqa: F401
from correrender_tpu.io import amira  # noqa: F401
from correrender_tpu.io import grib  # noqa: F401
from correrender_tpu.io import field_file  # noqa: F401
from correrender_tpu.io import rbc  # noqa: F401
from correrender_tpu.io.catalog import DataSetInformation, load_catalog
from correrender_tpu.io import writers

__all__ = [
    "VolumeLoader",
    "register_loader",
    "loader_for_path",
    "load_volume",
    "DataSetInformation",
    "load_catalog",
    "writers",
]
