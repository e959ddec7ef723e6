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
    kwargs = dict(kwargs)
    if m == CorrelationMeasure.PEARSON:
        # The psum fast path computes signed r; apply value-mode
        # kwargs here so the sharded result matches the dense
        # correlate_field (which handles absolute for every measure).
        # Any other kwarg routes through the generic gather path.
        absolute = bool(kwargs.pop("absolute", False))
        if not kwargs:
            out = pearson_member_sharded(stack, ref, mesh)
            return jnp.abs(out) if absolute else out
        kwargs["absolute"] = absolute
    bounds = None
    if is_measure_binned_mi(m):
        # Binned MI normalizes by GLOBAL min/max
        # (CorrelationCalculator.cpp:820-845). Inside shard_map each
        # space shard would see only its local Z-slab (review finding:
        # seams at shard boundaries + divergence from the dense path);
        # the bounds reduce once here, outside the shard_map — as
        # TRACED values: host floats would ride the jit cache key and
        # force a blocking sync + full recompile per dataset.
        given = kwargs.pop("mi_bounds", None)
        if given is None:
            bounds = jnp.stack([
                jnp.stack([jnp.nanmin(ref), jnp.nanmax(ref)]),
                jnp.stack([jnp.nanmin(stack), jnp.nanmax(stack)]),
            ]).astype(jnp.float32)
        else:
            from correrender_tpu.ops.registry import _split_bounds

            # Accept BOTH forms the dense path does — flat (min, max)
            # applying to each axis and ((rmin,rmax), (qmin,qmax)) —
            # via the registry's own splitter (a flat tuple crashed
            # the unpack here; round-3 review).
            (rlo, rhi), (qlo, qhi) = _split_bounds(given)
            bounds = jnp.asarray(
                [[rlo, rhi], [qlo, qhi]], jnp.float32
            )
    fn = _gather_sharded_fn(
        mesh, m, tuple(sorted(kwargs.items())), bounds is not None
    )
    if bounds is not None:
        return fn(stack, ref, bounds)
    return fn(stack, ref)


def correlate_space_sharded(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    mesh: Mesh,
    measure="pearson",
    **kwargs,
) -> jnp.ndarray:
    """Correlation on a purely space-sharded stack (member axis local).

    The production layout for rank/kNN measures after
    ``reshard_member_to_space`` (docs/SCALING.md "KSG MI / rank
    measures"): each device holds the FULL member axis of its Z-slab,
    so the dense estimator runs locally with zero collectives during
    compute — the reference series is replicated (one small broadcast)
    and the output comes back space-sharded.

    ``mesh`` is the 1-D ``("space",)`` mesh from ``space_only_mesh``.
    """
    m = measure_from_id(measure)
    kwargs = dict(kwargs)
    bounds = None
    if is_measure_binned_mi(m):
        # Global min/max bounds, reduced outside the shard_map as
        # traced values (same Z-seam reasoning as the member-sharded
        # path above).
        given = kwargs.pop("mi_bounds", None)
        if given is None:
            bounds = jnp.stack([
                jnp.stack([jnp.nanmin(ref), jnp.nanmax(ref)]),
                jnp.stack([jnp.nanmin(stack), jnp.nanmax(stack)]),
            ]).astype(jnp.float32)
        else:
            from correrender_tpu.ops.registry import _split_bounds

            (rlo, rhi), (qlo, qhi) = _split_bounds(given)
            bounds = jnp.asarray([[rlo, rhi], [qlo, qhi]], jnp.float32)
    fn = _space_sharded_fn(
        mesh, m, tuple(sorted(kwargs.items())), bounds is not None
    )
    if bounds is not None:
        return fn(stack, ref, bounds)
    return fn(stack, ref)


@functools.lru_cache(maxsize=32)
def _space_sharded_fn(mesh: Mesh, m, kwargs_items, has_bounds=False):
    kwargs = dict(kwargs_items)

    from correrender_tpu.calculators.correlation import correlate_field

    def local(stack_blk, ref_full, *rest):
        kw = dict(kwargs)
        if rest:
            b = rest[0]
            kw["mi_bounds"] = ((b[0, 0], b[0, 1]), (b[1, 0], b[1, 1]))
        return correlate_field(stack_blk, ref_full, m, **kw)

    # Accept both a 1-D ("space",) mesh and a 2-D (space, members)
    # mesh whose Z axis is sharded over BOTH axes (the layout
    # reshard_member_to_space produces without moving devices).
    axes = (mesh.axis_names[0] if len(mesh.axis_names) == 1
            else tuple(mesh.axis_names))
    in_specs = [P(axes, None, None, None), P()]
    if has_bounds:
        in_specs.append(P())
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(axes, None, None),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=32)
def _gather_sharded_fn(mesh: Mesh, m, kwargs_items, has_bounds=False):
    kwargs = dict(kwargs_items)

    from correrender_tpu.calculators.correlation import correlate_field

    def local(stack_blk, ref_blk, *rest):
        full_stack = jax.lax.all_gather(
            stack_blk, "members", axis=-1, tiled=True
        )
        full_ref = jax.lax.all_gather(ref_blk, "members", axis=0, tiled=True)
        kw = dict(kwargs)
        if rest:
            b = rest[0]
            kw["mi_bounds"] = ((b[0, 0], b[0, 1]), (b[1, 0], b[1, 1]))
        return correlate_field(full_stack, full_ref, m, **kw)

    in_specs = [P("space", None, None, "members"), P("members")]
    if has_bounds:
        in_specs.append(P())  # replicated (2, 2) bounds
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P("space", None, None),
        check_vma=False,
    ))
