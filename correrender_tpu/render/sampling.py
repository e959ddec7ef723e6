"""Volume sampling: trilinear interpolation with GL texture semantics.

Equivalent to ``texture(sampler3D, texCoords)`` with linear filtering
and clamp-to-edge as used by the reference's raymarchers: voxel centers
sit at ``(i + 0.5) / N`` of normalized texture coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_trilinear(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly sample ``vol`` at normalized coords.

    Args:
      vol: ``(Z, Y, X)`` scalar volume.
      coords: ``(..., 3)`` normalized texture coordinates in xyz order
        (matching GLSL ``texture()`` argument order).

    Returns:
      ``(...)`` interpolated values.
    """
    zs, ys, xs = vol.shape
    dims = jnp.asarray([xs, ys, zs], jnp.float32)
    # Voxel-space position of the sample (centers at integer coords).
    p = coords * dims - 0.5
    p0 = jnp.floor(p)
    frac = p - p0
    p0 = p0.astype(jnp.int32)

    def gather(ox, oy, oz):
        ix = jnp.clip(p0[..., 0] + ox, 0, xs - 1)
        iy = jnp.clip(p0[..., 1] + oy, 0, ys - 1)
        iz = jnp.clip(p0[..., 2] + oz, 0, zs - 1)
        return vol[iz, iy, ix]

    fx = frac[..., 0]
    fy = frac[..., 1]
    fz = frac[..., 2]
    c00 = gather(0, 0, 0) * (1 - fx) + gather(1, 0, 0) * fx
    c10 = gather(0, 1, 0) * (1 - fx) + gather(1, 1, 0) * fx
    c01 = gather(0, 0, 1) * (1 - fx) + gather(1, 0, 1) * fx
    c11 = gather(0, 1, 1) * (1 - fx) + gather(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def sample_nearest(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour sampling with clamp-to-edge."""
    zs, ys, xs = vol.shape
    dims = jnp.asarray([xs, ys, zs], jnp.float32)
    p = jnp.floor(coords * dims).astype(jnp.int32)
    ix = jnp.clip(p[..., 0], 0, xs - 1)
    iy = jnp.clip(p[..., 1], 0, ys - 1)
    iz = jnp.clip(p[..., 2], 0, zs - 1)
    return vol[iz, iy, ix]


def ray_box_intersect(origin, direction, box_min, box_max):
    """Slab-method ray/AABB intersection.

    Matches ``rayBoxIntersectionRayCoords`` usage in the reference DVR
    shader. Returns (t_near, t_far, hit_mask); directions may be
    batched ``(..., 3)``.
    """
    inv_d = 1.0 / direction
    t0 = (box_min - origin) * inv_d
    t1 = (box_max - origin) * inv_d
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_near = jnp.max(t_small, axis=-1)
    t_far = jnp.min(t_big, axis=-1)
    hit = (t_near <= t_far) & (t_far >= 0.0)
    return t_near, t_far, hit
