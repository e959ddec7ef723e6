"""Rendering: cameras, transfer functions, volume renderers.

The reference renders with Vulkan compute shaders
(Data/Shaders/Renderers/); here every renderer is a jittable JAX
function over the volume array, so derived-field compute and rendering
fuse into one XLA program.
"""

from correrender_tpu.render.camera import Camera
from correrender_tpu.render.tf import TransferFunction
from correrender_tpu.render.dvr import dvr_render
from correrender_tpu.render.sampling import sample_trilinear

__all__ = ["Camera", "TransferFunction", "dvr_render", "sample_trilinear"]
