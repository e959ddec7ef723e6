"""Perspective camera and ray generation.

Replicates the ray setup of the reference's DVR compute shader
(Data/Shaders/Renderers/DVR/DvrShader.glsl:75-82): rays through pixel
centers in NDC via the inverse projection/view matrices, normalized in
view space.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _rays_core(inv_view, inv_proj, width: int, height: int):
    origin = inv_view[:3, 3]
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    ndc_x = 2.0 * px - 1.0
    ndc_y = 1.0 - 2.0 * py  # flip so row 0 = top
    gx, gy = jnp.meshgrid(ndc_x, ndc_y)  # (H, W)
    target = jnp.stack(
        [gx, gy, jnp.ones_like(gx)], axis=-1
    )  # NDC z=1 (far plane direction)
    # View-space direction through the pixel. Elementwise contraction
    # at HIGHEST precision: TPU matmuls default to bf16 inputs, which
    # visibly shifts rays (~0.25%, same finding as dvr.py's model
    # matrix path).
    t4 = jnp.concatenate(
        [target, jnp.ones(target.shape[:-1] + (1,))], axis=-1
    )
    view_target = jnp.einsum(
        "ij,...j->...i", inv_proj, t4,
        precision=jax.lax.Precision.HIGHEST,
    )[..., :3]
    view_dir = view_target / jnp.linalg.norm(
        view_target, axis=-1, keepdims=True
    )
    world_dir = jnp.einsum(
        "ij,...j->...i", inv_view[:3, :3], view_dir,
        precision=jax.lax.Precision.HIGHEST,
    )
    return origin, world_dir


def look_at(eye, center, up) -> np.ndarray:
    """Right-handed look-at view matrix (GL convention)."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective(fovy: float, aspect: float, z_near: float, z_far: float) -> np.ndarray:
    """GL-style perspective projection matrix."""
    t = 1.0 / math.tan(fovy * 0.5)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = t / aspect
    m[1, 1] = t
    m[2, 2] = (z_far + z_near) / (z_near - z_far)
    m[2, 3] = 2.0 * z_far * z_near / (z_near - z_far)
    m[3, 2] = -1.0
    return m


@dataclasses.dataclass
class Camera:
    """Perspective camera; defaults match the reference app's initial view."""

    position: tuple = (0.0, 0.0, 0.8)
    look_at_point: tuple = (0.0, 0.0, 0.0)
    up: tuple = (0.0, 1.0, 0.0)
    fovy: float = math.pi / 4.0  # 45°
    z_near: float = 0.001
    z_far: float = 100.0

    def view_matrix(self) -> np.ndarray:
        return look_at(self.position, self.look_at_point, self.up)

    def inverse_view_matrix(self) -> np.ndarray:
        return np.linalg.inv(self.view_matrix()).astype(np.float32)

    def projection_matrix(self, aspect: float) -> np.ndarray:
        return perspective(self.fovy, aspect, self.z_near, self.z_far)

    def inverse_projection_matrix(self, aspect: float) -> np.ndarray:
        return np.linalg.inv(
            perspective(self.fovy, aspect, self.z_near, self.z_far)
        ).astype(np.float32)

    def rays(self, width: int, height: int):
        """Per-pixel ray origins/directions as jnp arrays.

        Returns (origin (3,), directions (H, W, 3)). Pixel (0,0) is the
        top-left of the image (y flipped from GL window coords so the
        output array is directly viewable).

        The generation runs as ONE compiled program per (width,
        height): eagerly it is ~15 small dispatches, and per-dispatch
        overhead on the tunneled device costs more than the math —
        measured as part of the round-3 eager-renderer sweep.
        """
        return _rays_core(
            jnp.asarray(self.inverse_view_matrix()),
            jnp.asarray(self.inverse_projection_matrix(width / height)),
            width, height,
        )


def ray_dirs_affine(camera: "Camera", width: int, height: int):
    """Affine decomposition of the (unnormalized) ray directions.

    Returns world vectors (e0, ex, ey) such that the ray through pixel
    (px, py) (pixel centers, row 0 = top) has direction
    ``d = e0 + ex·px + ey·py`` up to normalization. Used by the
    matmul-warp path of the shear-warp renderer, where only direction
    *ratios* matter.
    """
    inv_view = camera.inverse_view_matrix()
    inv_proj = camera.inverse_projection_matrix(width / height)

    def dir3(px, py):
        x = 2.0 * (px + 0.5) / width - 1.0
        y = 1.0 - 2.0 * (py + 0.5) / height
        view_target = inv_proj @ np.array([x, y, 1.0, 1.0], np.float64)
        return inv_view[:3, :3].astype(np.float64) @ view_target[:3]

    d00 = dir3(0, 0)
    ex = dir3(1, 0) - d00
    ey = dir3(0, 1) - d00
    return d00, ex, ey


def orbit_camera(
    theta: float,
    phi: float,
    radius: float = 0.8,
    center=(0.0, 0.0, 0.0),
    **kwargs,
) -> Camera:
    """Camera on a sphere around ``center`` (for flythrough paths)."""
    cx, cy, cz = center
    pos = (
        cx + radius * math.cos(phi) * math.sin(theta),
        cy + radius * math.sin(phi),
        cz + radius * math.cos(phi) * math.cos(theta),
    )
    return Camera(position=pos, look_at_point=center, **kwargs)


def default_render_box(shape_zyx):
    """The package-wide default render AABB for a (Z, Y, X) volume.

    Longest side normalized to 0.5 world units, centered at the origin
    (VolumeData.cpp:322-330 convention). One definition — this used to
    be copy-pasted in six renderers, where a drift between e.g.
    prepare_iso_shearwarp and iso_shearwarp would silently corrupt the
    prepared-layout geometry.
    """
    zs, ys, xs = shape_zyx
    dims = np.array(
        [max(xs - 1, 1), max(ys - 1, 1), max(zs - 1, 1)], np.float32
    )
    normalized = dims / dims.max()
    return (-0.25 * normalized, 0.25 * normalized)
