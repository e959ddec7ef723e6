"""Domain-outline renderer: the AABB wireframe.

Reference: src/Renderers/DomainOutlineRenderer.* — a rasterized box
outline. Here the 12 box edges are projected to screen space and drawn
with an analytic distance-to-segment falloff (anti-aliased, vectorized
over pixels — no triangle rasterizer needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _project(points, view, proj, width, height):
    """World → pixel coordinates (+depth)."""
    p4 = np.concatenate([points, np.ones((len(points), 1))], axis=-1)
    clip = (proj @ (view @ p4.T)).T
    # w == 0 (corner exactly in the camera plane) yields inf/NaN here;
    # such edges are masked downstream — suppress the host warning.
    with np.errstate(divide="ignore", invalid="ignore"):
        ndc = clip[:, :3] / clip[:, 3:4]
    px = (ndc[:, 0] * 0.5 + 0.5) * width
    py = (0.5 - ndc[:, 1] * 0.5) * height
    return np.stack([px, py], axis=-1), clip[:, 3]


_EDGES = [
    (0, 1), (1, 3), (3, 2), (2, 0),
    (4, 5), (5, 7), (7, 6), (6, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def outline_render(
    camera,
    box,
    image_size=(512, 512),
    color=(1.0, 1.0, 1.0, 1.0),
    line_width: float = 1.5,
    base_image=None,
    return_depth: bool = False,
) -> jnp.ndarray:
    """Draw the box wireframe, optionally over ``base_image``.

    With ``return_depth`` also returns the (H, W) eye distance of the
    nearest covered edge (+inf off the wireframe) for the shared
    per-view depth buffer. Edge depth interpolates the corner
    distances in screen space — exact enough for hairline geometry."""
    box_min, box_max = np.asarray(box[0]), np.asarray(box[1])
    corners = np.array(
        [
            [
                box_min[0] if i & 1 == 0 else box_max[0],
                box_min[1] if i & 2 == 0 else box_max[1],
                box_min[2] if i & 4 == 0 else box_max[2],
            ]
            for i in range(8)
        ],
        np.float32,
    )
    width, height = image_size
    view = camera.view_matrix()
    proj = camera.projection_matrix(width / height)
    pts, w_clip = _project(corners, view, proj, width, height)

    eye = np.asarray(camera.position, np.float32)
    corner_depth = np.linalg.norm(corners - eye, axis=-1)

    # Host-side edge setup (12 tiny segments); edges with an endpoint
    # behind the camera are masked out (no clipping for now).
    pa = np.array([pts[a] for a, b in _EDGES], np.float32)
    pb = np.array([pts[b] for a, b in _EDGES], np.float32)
    da = np.array([corner_depth[a] for a, b in _EDGES], np.float32)
    db = np.array([corner_depth[b] for a, b in _EDGES], np.float32)
    valid = np.array(
        [w_clip[a] > 0 and w_clip[b] > 0 for a, b in _EDGES], np.float32
    )
    layer = base_image is None
    if layer:
        base_image = jnp.zeros((height, width, 4), jnp.float32)
    return _outline_core(
        jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(da),
        jnp.asarray(db), jnp.asarray(valid),
        jnp.asarray(color, jnp.float32), jnp.float32(line_width),
        base_image, width, height, return_depth, layer,
    )


def segments_render(
    camera,
    p0s,
    p1s,
    image_size=(512, 512),
    color=(1.0, 1.0, 1.0, 1.0),
    line_width: float = 1.5,
    base_image=None,
    return_depth: bool = False,
) -> jnp.ndarray:
    """Draw arbitrary world-space line segments (``p0s[i]→p1s[i]``).

    The reference rasterizes such connecting lines with its own pass
    (ConnectingLineRasterPass.* — the tube linking the two selected
    diagram regions to the 3D view, DiagramRenderer.cpp:728-736); here
    the segments reuse the box-outline hairline core, so any number of
    segments is still one compiled program.
    """
    p0s = np.atleast_2d(np.asarray(p0s, np.float32))
    p1s = np.atleast_2d(np.asarray(p1s, np.float32))
    width, height = image_size
    view = camera.view_matrix()
    proj = camera.projection_matrix(width / height)
    pa, w0 = _project(p0s, view, proj, width, height)
    pb, w1 = _project(p1s, view, proj, width, height)
    eye = np.asarray(camera.position, np.float32)
    da = np.linalg.norm(p0s - eye, axis=-1).astype(np.float32)
    db = np.linalg.norm(p1s - eye, axis=-1).astype(np.float32)
    valid = ((w0 > 0) & (w1 > 0)).astype(np.float32)
    layer = base_image is None
    if layer:
        base_image = jnp.zeros((height, width, 4), jnp.float32)
    return _outline_core(
        jnp.asarray(pa, jnp.float32), jnp.asarray(pb, jnp.float32),
        jnp.asarray(da), jnp.asarray(db), jnp.asarray(valid),
        jnp.asarray(color, jnp.float32), jnp.float32(line_width),
        base_image, width, height, return_depth, layer,
    )


def connecting_line_points(box_a, box_b):
    """Endpoints of the region-connecting line: per axis, each endpoint
    sits on its box's face that FACES the other region (or the face
    midpoint when the centers align on that axis) — the reference's
    HEBChart::getLinePositions face selection (HEBChart.cpp:944-954).
    """
    a_min, a_max = (np.asarray(v, np.float32) for v in box_a)
    b_min, b_max = (np.asarray(v, np.float32) for v in box_b)
    c0 = 0.5 * (a_min + a_max)
    c1 = 0.5 * (b_min + b_max)
    p0 = np.where(c0 < c1, a_max, np.where(c0 > c1, a_min, c0))
    p1 = np.where(c1 < c0, b_max, np.where(c1 > c0, b_min, c1))
    return p0.astype(np.float32), p1.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "return_depth",
                              "layer")
)
def _outline_core(pa, pb, da, db, valid, col, line_width, base_image,
                  width, height, return_depth, layer=False):
    """All 12 edge rasterizations in ONE compiled program — eagerly
    this was ~100 small dispatches and per-dispatch overhead on the
    tunneled device made the hairline wireframe cost 3× a full DVR
    frame (round-3 perf sweep, 209 ms vs 72 ms at 640×480)."""
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    pix = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)

    # Vectorized over the 12 edges: (E, H, W) coverage then reduce.
    ab = pb - pa  # (E, 2)
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-9)  # (E,)
    t = jnp.clip(
        jnp.sum((pix[None] - pa[:, None, None]) * ab[:, None, None],
                axis=-1) / denom[:, None, None],
        0.0, 1.0,
    )  # (E, H, W)
    closest = pa[:, None, None] + t[..., None] * ab[:, None, None]
    d = jnp.linalg.norm(pix[None] - closest, axis=-1)
    cov_e = jnp.clip(1.0 + line_width * 0.5 - d, 0.0, 1.0)
    # where, not multiply: an invalid edge (endpoint in the camera
    # plane, w_clip == 0) projects to inf/NaN coordinates and
    # NaN * 0.0 = NaN would poison every pixel through the max.
    cov_e = jnp.where(valid[:, None, None] > 0, cov_e, 0.0)
    coverage = jnp.max(cov_e, axis=0)

    cov = (coverage * col[3])[..., None]
    if layer:
        # Layer mode (no base): STRAIGHT rgba — constant line color,
        # coverage in alpha only. Emitting rgb pre-multiplied by
        # coverage here made the depth compositor (which treats all
        # layers as straight alpha) darken the AA fringe twice and,
        # worse, registration-order-dependently (round-3 self-review).
        img = jnp.concatenate(
            [jnp.broadcast_to(col[:3], cov.shape[:2] + (3,)), cov],
            axis=-1,
        )
    else:
        rgb = cov * col[:3] + (1 - cov) * base_image[..., :3]
        alpha = jnp.maximum(cov[..., 0], base_image[..., 3])
        img = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
    if not return_depth:
        return img
    ed = da[:, None, None] + t * (db - da)[:, None, None]
    # Any covered pixel carries depth (a visible AA fringe with +inf
    # depth would z-sort behind everything registration-dependently).
    ed = jnp.where(cov_e > 0.0, ed, jnp.inf)
    depth = jnp.min(ed, axis=0)
    return img, depth
