"""Gather-free transfer-function classification via two-hot matmuls.

XLA `gather` on TPU runs at ~100 M elements/s (measured; it is
scalar-unit bound), which makes per-sample LUT lookups the bottleneck
of any volume renderer. This module replaces the lookup with linear
algebra: the linear-interpolated LUT read

    rgba(v) = (1−f)·lut[i] + f·lut[i+1]

is exactly a *two-hot* row vector ``w(v)`` (tent weights over LUT bins)
times the LUT matrix — an MXU contraction at hundreds of Gelem/s.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def two_hot_weights(
    values: jnp.ndarray, domain, resolution: int
) -> jnp.ndarray:
    """Tent (two-hot) LUT-bin weights — the ONE definition of the
    binning semantics, shared by the renderer's classification and the
    TF-optimization normal equations (a fitted TF is only valid under
    the exact weights the renderer applies).

    Rows sum to 1 for finite inputs, 0 for NaN. A degenerate domain
    (hi == lo, e.g. a constant field) maps every finite value to bin 0
    instead of producing 0/0 = NaN weights.
    """
    lo, hi = domain[0], domain[1]
    span = hi - lo
    safe_span = jnp.where(span > 0, span, 1.0)
    u = jnp.clip((values - lo) / safe_span, 0.0, 1.0) * (resolution - 1)
    u = jnp.where(span > 0, u, 0.0)
    u = jnp.where(jnp.isnan(values), -2.0, u)  # outside every tent
    bins = jnp.arange(resolution, dtype=jnp.float32)
    return jnp.maximum(1.0 - jnp.abs(u[..., None] - bins), 0.0)


@functools.partial(jax.jit, static_argnames=("premultiply",))
def classify(
    scalars: jnp.ndarray,
    lut: jnp.ndarray,
    domain: jnp.ndarray,
    premultiply: bool = True,
) -> jnp.ndarray:
    """Map scalars through a LUT transfer function, matmul-only.

    Args:
      scalars: any-shape scalar field.
      lut: ``(R, 4)`` RGBA LUT (straight alpha).
      domain: ``(2,)`` value range mapped onto the LUT.
      premultiply: return ``(r·a, g·a, b·a, a)`` — the form the
        shear-warp compositor interpolates without color bleeding.

    Returns:
      ``scalars.shape + (4,)`` float32; NaN scalars map to 0.
    """
    w = two_hot_weights(scalars, domain, lut.shape[0])
    out_lut = lut
    if premultiply:
        out_lut = jnp.concatenate(
            [lut[:, :3] * lut[:, 3:4], lut[:, 3:4]], axis=-1
        )
    return jnp.einsum(
        "...r,rc->...c", w, out_lut, preferred_element_type=jnp.float32
    )


def classify_volume(volume, lut, domain, slab: int = 8, premultiply=True):
    """Chunked classification of a (Z, Y, X) volume → (Z, Y, X, 4).

    On TPU this dispatches to the Pallas kernel
    (ops/pallas/classify_kernel.py — VMEM-resident two-hot weights);
    the XLA path chunks over z to bound the (voxels, R) intermediate.
    """
    domain = jnp.asarray(domain, jnp.float32)
    from correrender_tpu.ops.pallas.common import on_tpu

    if on_tpu():
        from correrender_tpu.ops.pallas.classify_kernel import (
            classify_pallas,
        )

        return classify_pallas(volume, lut, domain,
                               premultiply=premultiply)
    zs = volume.shape[0]
    outs = []
    for z0 in range(0, zs, slab):
        outs.append(
            classify(volume[z0 : z0 + slab], lut, domain, premultiply)
        )
    return jnp.concatenate(outs, axis=0)
