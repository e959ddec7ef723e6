"""Distributed Pearson correlation via psum moment accumulation.

New TPU-native design (no reference analogue — SURVEY.md §5.7): with
the member axis sharded over the ``members`` mesh axis, each device
accumulates partial raw moments of its member slice; a single ``psum``
over the mesh axis combines them:

    r = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²)(n·Σyy − Σy²))

Five scalars per voxel cross the ICI instead of the member series —
the moral equivalent of ring attention's blockwise reduction for the
"long axis" of this workload (the ensemble axis; SURVEY.md §5.7).

Rank/kNN measures instead ``all_gather`` the member axis per voxel
block (members ≤ a few thousand — cheap relative to the O(n²) math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from correrender_tpu.ops.pearson import pearson_from_sums
from correrender_tpu.ops.registry import (
    CorrelationMeasure,
    is_measure_binned_mi,
    measure_from_id,
)


@functools.lru_cache(maxsize=32)
def _pearson_sharded_fn(mesh: Mesh, n: int):
    """Build + jit once per (mesh, member count): a fresh shard_map
    closure per call would retrace AND recompile every invocation
    (measured: ~12 s per 'warm' call through the tunnel in round 1's
    config-5 run)."""

    def local_moments(stack_blk, ref_blk):
        # stack_blk: (Zb, Y, X, Eb); ref_blk: (Eb,)
        x = ref_blk.astype(jnp.float32)
        y = stack_blk.astype(jnp.float32)
        sum_x = jnp.sum(x)
        sum_xx = jnp.sum(x * x)
        sum_y = jnp.sum(y, axis=-1)
        sum_yy = jnp.sum(y * y, axis=-1)
        # HIGHEST: XLA's default f32 matmul precision on TPU is bf16,
        # which costs ~3e-4 absolute on correlation fields; the 3-pass
        # decomposition is free here (HBM-bound reduction).
        sum_xy = jnp.einsum("zyxe,e->zyx", y, x,
                            precision=jax.lax.Precision.HIGHEST)
        # Combine partials across the member shards.
        sum_x = jax.lax.psum(sum_x, "members")
        sum_xx = jax.lax.psum(sum_xx, "members")
        sum_y = jax.lax.psum(sum_y, "members")
        sum_yy = jax.lax.psum(sum_yy, "members")
        sum_xy = jax.lax.psum(sum_xy, "members")
        # Shared assembly helper — one home for the num/den math, so a
        # numerical fix reaches both the dense and sharded paths.
        return pearson_from_sums(n, sum_x, sum_y, sum_xy, sum_xx, sum_yy)

    return jax.jit(shard_map(
        local_moments,
        mesh=mesh,
        in_specs=(P("space", None, None, "members"), P("members")),
        out_specs=P("space", None, None),
    ))


def pearson_member_sharded(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """Pearson field with (Z, Y, X, E) sharded (space, -, -, members).

    Args:
      stack: member stack, sharded or shardable over ``mesh``.
      ref: ``(E,)`` reference series (sharded over ``members``).
      mesh: 2D ("space", "members") mesh.

    Returns:
      ``(Z, Y, X)`` field sharded over "space", replicated over
      "members".
    """
    return _pearson_sharded_fn(mesh, stack.shape[-1])(stack, ref)


def correlate_member_sharded(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    mesh: Mesh,
    measure="pearson",
    **kwargs,
) -> jnp.ndarray:
    """General sharded correlation.

    Pearson uses the psum moment path; all other measures all_gather
    the member axis inside each space shard and run the dense
    estimator locally (member series are small; the O(n²)/sort math
    dominates).
    """
    m = measure_from_id(measure)
    if m == CorrelationMeasure.PEARSON:
        return pearson_member_sharded(stack, ref, mesh)
    if is_measure_binned_mi(m) and kwargs.get("mi_bounds") is None:
        # Binned MI normalizes by GLOBAL min/max
        # (CorrelationCalculator.cpp:820-845). Inside shard_map each
        # space shard would see only its local Z-slab (review finding:
        # seams at shard boundaries + divergence from the dense path);
        # the bounds reduce once here, outside the shard_map.
        kwargs = dict(kwargs)
        kwargs["mi_bounds"] = (
            (float(jnp.nanmin(ref)), float(jnp.nanmax(ref))),
            (float(jnp.nanmin(stack)), float(jnp.nanmax(stack))),
        )
    return _gather_sharded_fn(
        mesh, m, tuple(sorted(kwargs.items()))
    )(stack, ref)


@functools.lru_cache(maxsize=32)
def _gather_sharded_fn(mesh: Mesh, m, kwargs_items):
    kwargs = dict(kwargs_items)

    from correrender_tpu.calculators.correlation import correlate_field

    def local(stack_blk, ref_blk):
        full_stack = jax.lax.all_gather(
            stack_blk, "members", axis=-1, tiled=True
        )
        full_ref = jax.lax.all_gather(ref_blk, "members", axis=0, tiled=True)
        return correlate_field(full_stack, full_ref, m, **kwargs)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P("space", None, None, "members"), P("members")),
        out_specs=P("space", None, None),
        check_vma=False,
    ))
