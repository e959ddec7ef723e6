"""Multi-chip parallelism: meshes, shardings, distributed estimators.

The reference is strictly single-process single-GPU (SURVEY.md §2.11);
this layer is new TPU-native design. Two mesh axes:

* ``"space"`` — voxel-parallel: the volume's Z axis is block-sharded;
  per-voxel estimators need no communication (halo exchange only for
  spatial stencils / trilinear sampling at shard edges).
* ``"members"`` — member-parallel for huge ensembles: moment-based
  measures (Pearson) reduce partial sums with ``psum``; rank/kNN
  measures ``all_gather`` the member axis per voxel block.
"""

from correrender_tpu.parallel.mesh import (
    make_mesh,
    reshard_member_to_space,
    reshard_space_to_member,
    shard_member_stack,
    space_only_mesh,
    volume_sharding,
)
from correrender_tpu.parallel.pearson_sharded import (
    correlate_member_sharded,
    correlate_space_sharded,
    pearson_member_sharded,
)

__all__ = [
    "make_mesh",
    "shard_member_stack",
    "volume_sharding",
    "space_only_mesh",
    "reshard_member_to_space",
    "reshard_space_to_member",
    "pearson_member_sharded",
    "correlate_member_sharded",
    "correlate_space_sharded",
    "dvr_shearwarp_sharded",
    "iso_shearwarp_sharded",
]


def __getattr__(name):
    # Lazy: the sharded renderers pull in the full render stack.
    if name == "dvr_shearwarp_sharded":
        from correrender_tpu.parallel.dvr_sharded import (
            dvr_shearwarp_sharded,
        )

        return dvr_shearwarp_sharded
    if name == "iso_shearwarp_sharded":
        from correrender_tpu.parallel.iso_sharded import (
            iso_shearwarp_sharded,
        )

        return iso_shearwarp_sharded
    raise AttributeError(name)
