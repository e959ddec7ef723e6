"""correrender_tpu — a TPU-native correlation-field engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
chrismile/Correrender (reference mounted at /root/reference): ensemble
volume analytics (Pearson / Spearman / Kendall / mutual-information /
KL-divergence fields), direct volume rendering, isosurfaces, diagram
analytics (HEB chord diagrams, correlation matrices, t-SNE/DBSCAN
embeddings), transfer-function optimization, and neural correlation
estimators — all expressed as XLA programs that run on TPU meshes.

Key design points (vs. the reference's Vulkan/CUDA architecture):

* Fields are ``jnp`` arrays of shape ``[members/time, Z, Y, X]``; there
  is no image-vs-tiled-buffer duality (reference
  ``src/Volume/Cache/DeviceCacheEntry.hpp``) — XLA owns layout.
* Statistical estimators are batched functions over a trailing member
  axis, vectorized over voxels; the hot paths additionally have Pallas
  kernels (``correrender_tpu.ops.pallas``).
* Correlation compute and volume rendering fuse into a single jitted
  program (no host round-trip between "calculator" and "renderer").
* Multi-chip scaling is first-class: volumes shard over a
  ``jax.sharding.Mesh`` (the reference is single-GPU only).
"""

__version__ = "0.1.0"
