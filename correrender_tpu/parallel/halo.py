"""Halo exchange for spatially-sharded volumes.

New TPU-native design (SURVEY.md §2.11): when the volume's Z axis is
block-sharded over the ``space`` mesh axis, spatial stencils (Gaussian
blur, gradient/vorticity, trilinear sampling at shard edges) need each
shard's boundary planes from its neighbours. ``ppermute`` shifts the
boundary slabs across the ICI ring; edge shards clamp (replicating the
reference's clamp-to-edge semantics).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def exchange_halo_z(block: jnp.ndarray, halo: int, axis_name: str = "space"):
    """Pad a local (Zb, Y, X, ...) block with ``halo`` planes from the
    ring neighbours along the sharded Z axis (inside shard_map).

    Edge shards receive edge-replicated planes (clamp-to-edge), matching
    the renderers'/filters' boundary handling.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    zb = block.shape[0]
    if halo <= 0:
        raise ValueError(f"halo must be positive, got {halo}")
    if halo > zb:
        # One ppermute hop supplies at most one neighbour slab; a halo
        # wider than the local Z extent would need multi-hop exchange
        # (and the jnp.where below would shape-mismatch). Resize the
        # mesh or the volume rather than silently mis-padding.
        raise ValueError(
            f"halo {halo} exceeds the per-shard Z extent {zb}; "
            f"use fewer shards (or a smaller stencil) so each shard "
            "holds at least one full halo of planes"
        )

    # Send the top slab up and the bottom slab down the ring.
    top = block[:halo]
    bottom = block[-halo:]
    # from_prev: previous shard's bottom slab (arrives at shard i from i-1).
    from_prev = jax.lax.ppermute(
        bottom, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # from_next: next shard's top slab.
    from_next = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    # Clamp at the domain boundary: the first shard uses its own first
    # plane (replicated), the last its own last plane.
    edge_lo = jnp.repeat(block[:1], halo, axis=0)
    edge_hi = jnp.repeat(block[-1:], halo, axis=0)
    lo = jnp.where(idx == 0, edge_lo, from_prev)
    hi = jnp.where(idx == n - 1, edge_hi, from_next)
    return jnp.concatenate([lo, block, hi], axis=0)


def make_sharded_stencil(
    fn,
    mesh: Mesh,
    halo: int,
    axis_name: str = "space",
    extra_specs=(),
):
    """Wrap a (Z, Y, X)→(Z, Y, X) stencil so it runs on Z-sharded input.

    ``fn(block_with_halo) -> block_with_halo`` is applied per shard on
    the halo-padded block; the halo planes are cropped from the result.
    """

    if halo <= 0:
        raise ValueError(f"halo must be positive, got {halo}")

    def local(block, *extra):
        padded = exchange_halo_z(block, halo, axis_name)
        out = fn(padded, *extra)
        return out[halo:-halo]

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name, None, None),) + tuple(extra_specs),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )


def gaussian_blur_3d_sharded(vol: jnp.ndarray, sigma: float, mesh: Mesh):
    """Z-sharded Gaussian blur with halo exchange (the sharded analogue
    of calculators/noise.py's NoiseReductionCalculator)."""
    from correrender_tpu.calculators.noise import (
        gaussian_blur_3d,
        gaussian_kernel_1d,
    )

    halo = len(gaussian_kernel_1d(sigma)) // 2
    fn = make_sharded_stencil(
        lambda block: gaussian_blur_3d(block, sigma), mesh, halo
    )
    return fn(vol)
