"""Device meshes and canonical shardings for volume ensembles.

Canonical member-stack layout is ``(Z, Y, X, E)``; the standard mesh is
2D ``(space, members)``:

* ``space`` shards Z (voxel-parallel — embarrassingly parallel for all
  per-voxel estimators);
* ``members`` shards E (member-parallel — needs ``psum``/``all_gather``
  inside the estimators, see pearson_sharded.py).
"""

from __future__ import annotations

import functools

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


# -- member <-> space resharding -------------------------------------------
#
# Two canonical layouts serve different measure families
# (docs/SCALING.md "Mesh layouts"):
#
# * ``(space, members)`` — moment measures (Pearson): psum combines
#   per-shard moments, so the member axis can stay sharded.
# * pure ``space`` — rank/kNN measures (KSG MI): every member of a
#   voxel is needed simultaneously (ops/pallas/ksg_banded.py), so each
#   device must hold the full member axis of its Z-slab.
#
# Moving between them is an all-to-all of the local shards (each chip
# keeps 1/n of the voxels but swaps which axis it slices); XLA emits
# the collective from a plain ``device_put`` onto the target sharding,
# riding ICI on real meshes. Done once per session per layout — the
# field cache (core/cache.py) keeps both residents while budget allows.


def space_only_mesh(mesh_or_devices=None) -> Mesh:
    """A 1-D ``("space",)`` mesh over the same device pool.

    Accepts an existing 2-D ``(space, members)`` mesh (its devices are
    reused in order, so resharding stays a pure layout change), a
    device list, or None for all devices.
    """
    if isinstance(mesh_or_devices, Mesh):
        devices = list(mesh_or_devices.devices.flat)
    elif mesh_or_devices is None:
        devices = jax.devices()
    else:
        devices = list(mesh_or_devices)
    return Mesh(np.asarray(devices), axis_names=("space",))


def space_sharding(mesh: Mesh) -> NamedSharding:
    """Pure-space sharding of a (Z, Y, X, E) stack on ``mesh``: Z
    block-sharded over EVERY device (both axes of a 2-D mesh, or the
    single axis of a 1-D one), member axis fully local."""
    if len(mesh.axis_names) == 1:
        return NamedSharding(mesh, P(mesh.axis_names[0],
                                     None, None, None))
    return NamedSharding(mesh, P(tuple(mesh.axis_names),
                                 None, None, None))


def reshard_member_to_space(stack, mesh: Mesh):
    """(Z, Y, X, E) stack: ``(space, …, members)`` → pure space sharding.

    Returns ``(resharded_stack, mesh)`` with Z sharded over every
    device of ``mesh`` (row-major over both axes) and the member axis
    fully local — the layout rank/kNN measures require
    (``correlate_space_sharded``). The transfer is the
    once-per-session all-to-all budgeted in docs/SCALING.md (≈33 GB
    per chip at the 2.15 TB config).

    Implemented as an explicit ``lax.all_to_all`` over the members
    axis inside ``shard_map`` — each device exchanges exactly its
    sub-blocks (ICI traffic on real meshes). The naive alternative,
    ``device_put`` onto the target sharding, makes the virtual CPU
    backend materialize ~8× the stack in transient per-device gathers
    (measured 82 GB host RSS for a 4.3 GB stack) and is avoided.

    Z must be divisible by the total device count.
    """
    space, members = mesh.devices.shape
    n_total = space * members
    if stack.shape[0] % n_total:
        raise ValueError(
            f"Z={stack.shape[0]} not divisible by {n_total} devices")
    if members == 1:
        # Already member-local; only the spec name changes.
        return (jax.device_put(stack, space_sharding(mesh)), mesh)
    return _reshard_m2s_fn(mesh)(stack), mesh


@functools.lru_cache(maxsize=16)
def _reshard_m2s_fn(mesh: Mesh):
    """Compiled once per mesh — a fresh shard_map closure per call
    would retrace AND recompile every reshard (the round-1 'warm call
    takes seconds' bug pattern)."""
    from jax import shard_map

    def shuffle(blk):
        # blk: (Z/space, Y, X, E/members) → split Z into `members`
        # sub-slabs and exchange so each device ends with
        # (Z/(space·members), Y, X, E).
        return jax.lax.all_to_all(
            blk, "members", split_axis=0, concat_axis=3, tiled=True)

    return jax.jit(shard_map(
        shuffle,
        mesh=mesh,
        in_specs=P("space", None, None, "members"),
        out_specs=P(("space", "members"), None, None, None),
    ))


def reshard_space_to_member(stack, mesh: Mesh):
    """Inverse re-shard: pure space sharding → ``(space, …, members)``
    on ``mesh`` (the moment-measure layout). Same explicit
    ``all_to_all``, reversed."""
    space, members = mesh.devices.shape
    if members == 1:
        return jax.device_put(stack, member_stack_sharding(mesh))
    return _reshard_s2m_fn(mesh)(stack)


@functools.lru_cache(maxsize=16)
def _reshard_s2m_fn(mesh: Mesh):
    from jax import shard_map

    def shuffle(blk):
        # blk: (Z/(space·members), Y, X, E) → split E into `members`
        # and re-concatenate along Z.
        return jax.lax.all_to_all(
            blk, "members", split_axis=3, concat_axis=0, tiled=True)

    return jax.jit(shard_map(
        shuffle,
        mesh=mesh,
        in_specs=P(("space", "members"), None, None, None),
        out_specs=P("space", None, None, "members"),
    ))
