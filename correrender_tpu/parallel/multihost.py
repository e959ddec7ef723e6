"""Multi-process (multi-host) meshes and per-process data loading.

The single-process mesh in :mod:`.mesh` models one host driving many
chips over ICI. Production ensembles (docs/SCALING.md: 2.15 TB over 16
hosts) additionally span *processes*: every host runs one JAX process,
loads only its own slice of the ensemble from the store (the DCN input
pipeline), and the processes form one logical device mesh — XLA routes
collectives over ICI within a host and DCN across hosts. This module
is the process-spanning half of that design (SURVEY.md §2.12/§5.8):

* :func:`initialize_process` — join the coordination service
  (``jax.distributed``). On CPU backends (the multi-host simulation
  this environment can execute) it forces the platform under the axon
  site hook and enables gloo collectives.
* :func:`process_spanning_mesh` — a ``(space, members)`` mesh whose
  **member columns are process-local**: the global device order is
  process-major, so laying members out column-major means each
  process's devices cover whole member blocks over the full Z range —
  which is exactly what lets a host load *only its members* from the
  store and still materialize the canonical member-sharded stack
  without any host-side exchange.
* :func:`member_stack_from_local` / :func:`member_series_from_local` —
  assemble the global sharded array from per-process member slices
  (``jax.make_array_from_single_device_arrays``; no host gathers).
* :func:`replicate_to_host` — pull any process-sharded result to every
  host via one compiled all-gather (the only cross-process hop a
  consumer needs).

The same code runs unchanged on a real multi-host TPU pod — there
``initialize_process()`` with no arguments picks up the TPU cluster
environment, and the collectives ride ICI/DCN instead of gloo.

No reference analogue: Correrender assumes a single address space
(``/root/reference/src/Volume/VolumeData.cpp:1232-1242``); multi-host
execution is a new-design mandate (SURVEY.md §5.8).

Executed evidence: ``tools/multihost_run.py`` launches N local
processes over a real gRPC coordinator and validates Pearson, the
member→space reshard, and a post-reshard rank program against f64
hosts math — see ``MULTIHOST_r05.json`` at the repo root.
"""

from __future__ import annotations

import os

import numpy as np


def initialize_process(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_devices: int | None = None,
    platform: str | None = None,
):
    """Join (or start, for process 0) the JAX coordination service.

    Must be called before any JAX computation. For the CPU-backed
    multi-host simulation pass all arguments; on a real TPU pod slice
    call with none (the cluster environment is auto-detected).

    ``local_devices``: number of virtual CPU devices this process
    contributes (``--xla_force_host_platform_device_count``).
    """
    if platform is None:
        platform = "cpu" if coordinator is not None else None
    if platform == "cpu" and local_devices:
        import re

        # Replace (not merely add) any inherited device-count flag —
        # a launcher running under pytest inherits the 8-device test
        # flag, which would multiply the per-process device count.
        flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "",
            os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{int(local_devices)}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if platform == "cpu":
        # The axon site hook force-prepends its platform regardless of
        # JAX_PLATFORMS; override via config before backend init (same
        # dance as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")
        # Cross-process CPU collectives need a transport; gloo ships
        # with jaxlib.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator, int(num_processes), int(process_id))
    return jax


def process_spanning_mesh(space: int, members: int):
    """A ``(space, members)`` mesh over ALL processes' devices.

    Devices are laid out member-column-major: column ``m`` holds global
    devices ``[m·space, (m+1)·space)``. Because ``jax.devices()`` is
    process-major, whole columns land inside one process whenever
    ``local_device_count % space == 0`` — the layout that makes the
    member axis the *process* axis for data loading (each host reads
    only its member block, full Z).
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if space * members != len(devices):
        raise ValueError(
            f"mesh {space}x{members} != {len(devices)} global devices")
    arr = np.asarray(devices).reshape(members, space).T
    return Mesh(arr, axis_names=("space", "members"))


def process_member_range(mesh, num_members: int) -> tuple[int, int]:
    """Member index range ``[lo, hi)`` this process must load.

    The union of the member blocks of this process's devices in the
    canonical member-stack sharding. Contiguous by construction of
    :func:`process_spanning_mesh` (asserted).
    """
    import jax

    members = mesh.devices.shape[1]
    if num_members % members:
        raise ValueError(
            f"E={num_members} not divisible by members={members}")
    block = num_members // members
    local = set(d.id for d in jax.local_devices())
    cols = [m for m in range(members)
            if any(d.id in local for d in mesh.devices[:, m])]
    if cols != list(range(cols[0], cols[-1] + 1)):
        raise AssertionError(f"non-contiguous member columns {cols}")
    return cols[0] * block, (cols[-1] + 1) * block


def member_stack_from_local(local_stack, mesh, num_members: int):
    """Global (Z, Y, X, E) member-sharded stack from this process's
    member slice.

    ``local_stack``: (Z, Y, X, E_local) — the members of
    :func:`process_member_range`, full spatial extent. Each local
    device receives exactly its (Z-slab, member-block) tile; the
    global array is assembled with zero cross-process traffic.
    """
    import jax
    from correrender_tpu.parallel.mesh import member_stack_sharding

    lo, hi = process_member_range(mesh, num_members)
    if local_stack.shape[-1] != hi - lo:
        raise ValueError(
            f"local stack has {local_stack.shape[-1]} members, "
            f"process range is [{lo}, {hi})")
    sharding = member_stack_sharding(mesh)
    gshape = tuple(local_stack.shape[:3]) + (num_members,)
    dmap = sharding.devices_indices_map(gshape)
    leaves = []
    for d in jax.local_devices():
        zsl, ysl, xsl, esl = dmap[d]
        tile = np.ascontiguousarray(
            local_stack[zsl, ysl, xsl,
                        esl.start - lo:esl.stop - lo])
        leaves.append(jax.device_put(tile, d))
    return jax.make_array_from_single_device_arrays(
        gshape, sharding, leaves)


def member_series_from_local(local_series, mesh, num_members: int):
    """Global (E,) member-sharded series (e.g. the reference-point
    series) from this process's member slice."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    lo, hi = process_member_range(mesh, num_members)
    if len(local_series) != hi - lo:
        raise ValueError("series length != process member range")
    sharding = NamedSharding(mesh, P("members"))
    gshape = (num_members,)
    dmap = sharding.devices_indices_map(gshape)
    leaves = []
    for d in jax.local_devices():
        (esl,) = dmap[d]
        leaves.append(jax.device_put(
            np.ascontiguousarray(
                local_series[esl.start - lo:esl.stop - lo]), d))
    return jax.make_array_from_single_device_arrays(
        gshape, sharding, leaves)


def replicate_to_host(arr, mesh):
    """Gather a (possibly cross-process) sharded array to every host.

    One compiled identity with replicated output sharding — XLA emits
    the all-gather (DCN across hosts, ICI within). Returns a NumPy
    array.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P()))(arr)
    return np.asarray(out.addressable_data(0))
