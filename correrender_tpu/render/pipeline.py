"""Fused correlation-compute + volume-render pipelines.

The BASELINE north star: "correlation compute and rendering fuse into a
single XLA program with no host round-trip". In the reference these are
two separate GPU dispatches connected through the device field cache
(CorrelationComputePass → 3D image → DvrShader sampler); here the whole
chain — member stack in, RGBA image out — is one jitted function, so
moving the reference point re-runs a single compiled program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from correrender_tpu.calculators.correlation import correlate_field
from correrender_tpu.render.dvr import dvr_composite, num_steps_for, world_step_size


def render_correlation_fast(
    stack: jnp.ndarray,
    ref_point,
    camera,
    transfer_function,
    measure="pearson",
    image_size=(512, 512),
    attenuation: float = 100.0,
    background=(0.0, 0.0, 0.0, 1.0),
    intermediate_scale: float = 0.75,
    **measure_kwargs,
) -> jnp.ndarray:
    """Correlation field → shear-warp DVR (the interactive fast path).

    The field recompute and the render run back-to-back on device; the
    transfer-function classification is re-evaluated per call (the
    field changes with the reference point). For measures with Pallas
    kernels (Pearson/Kendall/KSG on TPU) the whole frame is a handful
    of fused kernels.
    """
    from correrender_tpu.render.dvr_fast import dvr_shearwarp

    # Traced ref points (an int32[3] under an outer jit — the viewer's
    # drag-the-reference-point loop) index via gather; host ints are
    # coerced so a stray float doesn't change the indexing semantics.
    if isinstance(ref_point, jnp.ndarray):
        x, y, z = ref_point[0], ref_point[1], ref_point[2]
    else:
        x, y, z = (int(c) for c in ref_point)
    ref_series = stack[z, y, x]
    field = correlate_field(stack, ref_series, measure, **measure_kwargs)
    return dvr_shearwarp(
        field,
        camera,
        transfer_function,
        image_size=image_size,
        attenuation=attenuation,
        background=background,
        intermediate_scale=intermediate_scale,
    )


def render_correlation(
    stack: jnp.ndarray,
    ref_point,
    camera,
    transfer_function,
    measure="pearson",
    image_size=(512, 512),
    voxel_step: float = 0.1,
    attenuation: float = 100.0,
    background=(0.0, 0.0, 0.0, 1.0),
    **measure_kwargs,
) -> jnp.ndarray:
    """Correlation field vs. reference point, rendered with DVR
    (single fused XLA program — ray-marcher variant; see
    :func:`render_correlation_fast` for the shear-warp fast path).

    Args:
      stack: ``(Z, Y, X, n)`` member stack.
      ref_point: ``(x, y, z)`` voxel indices of the reference point
        (may be traced arrays for interactive point dragging).
      camera / transfer_function / image_size / voxel_step /
      attenuation / background: see :func:`dvr_render`.
      measure: correlation measure id.

    Returns:
      ``(H, W, 4)`` RGBA image.
    """
    zs, ys, xs, _ = stack.shape
    dims = np.array([max(xs - 1, 1), max(ys - 1, 1), max(zs - 1, 1)], np.float32)
    normalized = dims / dims.max()
    box_min, box_max = -0.25 * normalized, 0.25 * normalized
    step = world_step_size((zs, ys, xs), box_min, box_max, voxel_step)
    steps = num_steps_for(box_min, box_max, step)
    width, height = image_size
    origin, directions = camera.rays(width, height)

    return _fused(
        stack,
        jnp.asarray(ref_point, jnp.int32),
        origin,
        directions,
        jnp.asarray(box_min),
        jnp.asarray(box_max),
        transfer_function.lut,
        jnp.asarray(transfer_function.domain, jnp.float32),
        jnp.float32(step),
        jnp.float32(attenuation),
        jnp.asarray(background, jnp.float32),
        steps,
        str(measure),
        tuple(sorted(measure_kwargs.items())),
    )


@functools.partial(
    jax.jit, static_argnames=("num_steps", "measure", "measure_kwargs")
)
def _fused(
    stack,
    ref_point,
    origin,
    directions,
    box_min,
    box_max,
    tf_lut,
    tf_domain,
    step_size,
    attenuation,
    background,
    num_steps,
    measure,
    measure_kwargs,
):
    x, y, z = ref_point[0], ref_point[1], ref_point[2]
    ref_series = stack[z, y, x]  # dynamic gather — point dragging re-runs
    field = correlate_field(
        stack, ref_series, measure, **dict(measure_kwargs)
    )
    return dvr_composite(
        field,
        origin,
        directions,
        box_min,
        box_max,
        tf_lut,
        tf_domain,
        step_size,
        attenuation,
        background,
        num_steps,
    )
