"""Application layer: headless scenes, state files, CLI, harnesses.

Replaces the reference's interactive shell (src/MainApp.*, Vulkan/ImGui)
with a functional headless API: a :class:`Scene` owns a VolumeData,
calculators and renderer configs and renders views on demand; JSON
state files stay schema-compatible (src/MainAppState.cpp).
"""

from correrender_tpu.app.state import Scene, RENDERING_MODE_IDS
from correrender_tpu.app import perf, sampling_test, replicability

__all__ = [
    "Scene",
    "RENDERING_MODE_IDS",
    "perf",
    "sampling_test",
    "replicability",
]
