"""Rendering: cameras, transfer functions, volume renderers.

The reference renders with Vulkan compute shaders
(Data/Shaders/Renderers/); here every renderer is a jittable JAX
function over the volume array, so derived-field compute and rendering
fuse into one XLA program.
"""

from correrender_tpu.render.camera import Camera, orbit_camera
from correrender_tpu.render.tf import TransferFunction
from correrender_tpu.render.dvr import dvr_render
from correrender_tpu.render.sampling import sample_trilinear

__all__ = [
    "Camera",
    "orbit_camera",
    "TransferFunction",
    "dvr_render",
    "sample_trilinear",
]


def __getattr__(name):
    # Lazy heavy imports to keep `import correrender_tpu.render` light.
    if name == "dvr_shearwarp":
        from correrender_tpu.render.dvr_fast import dvr_shearwarp

        return dvr_shearwarp
    if name == "iso_render":
        from correrender_tpu.render.iso import iso_render

        return iso_render
    if name == "world_map_render":
        from correrender_tpu.render.worldmap import world_map_render

        return world_map_render
    raise AttributeError(name)
