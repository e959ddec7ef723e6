"""Device meshes and canonical shardings for volume ensembles.

Canonical member-stack layout is ``(Z, Y, X, E)``; the standard mesh is
2D ``(space, members)``:

* ``space`` shards Z (voxel-parallel — embarrassingly parallel for all
  per-voxel estimators);
* ``members`` shards E (member-parallel — needs ``psum``/``all_gather``
  inside the estimators, see pearson_sharded.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    space: int | None = None,
    members: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(space, members)`` mesh over the available devices."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if space is None:
        space = n // members
    if space < 1 or members < 1 or space * members > n:
        # space == 0 happens when members > device count with the
        # auto-derived space axis; an empty 0 x members mesh would
        # otherwise surface later as an obscure sharding error.
        raise ValueError(f"mesh {space}x{members} > {n} devices")
    arr = np.asarray(devices[: space * members]).reshape(space, members)
    return Mesh(arr, axis_names=("space", "members"))


def volume_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (Z, Y, X) scalar field: Z block-sharded."""
    return NamedSharding(mesh, P("space", None, None))


def member_stack_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (Z, Y, X, E) member stack."""
    return NamedSharding(mesh, P("space", None, None, "members"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_member_stack(stack, mesh: Mesh):
    """Place a (Z, Y, X, E) stack onto the mesh."""
    return jax.device_put(stack, member_stack_sharding(mesh))
