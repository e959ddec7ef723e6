"""Camera paths and flythrough rendering.

Reference: MainApp's camera-path + video-recording support (checkpoint
cameras, sgl CameraPath). Headless analogue: keyframed orbit/spline
paths rendered to an image sequence (the "animated DVR flythrough" of
BASELINE config 4 — time-lag correlation animation uses the same
driver with a per-frame time index).
"""

from __future__ import annotations

import math
import os

import numpy as np

from correrender_tpu.render.camera import Camera, orbit_camera


def orbit_path(num_frames: int, radius: float = 0.85, phi: float = 0.3,
               center=(0.0, 0.0, 0.0)):
    """Full-circle orbit path (the --perf camera flight analogue)."""
    return [
        orbit_camera(2.0 * math.pi * i / num_frames, phi, radius, center)
        for i in range(num_frames)
    ]


def keyframe_path(keyframes, num_frames: int):
    """Catmull-Rom interpolation through keyframe cameras."""
    positions = np.asarray([k.position for k in keyframes], np.float64)
    looks = np.asarray([k.look_at_point for k in keyframes], np.float64)

    def catmull_rom(pts, t_global):
        n = len(pts)
        if n == 1:
            return pts[0]
        seg = min(int(t_global * (n - 1)), n - 2)
        t = t_global * (n - 1) - seg
        p0 = pts[max(seg - 1, 0)]
        p1 = pts[seg]
        p2 = pts[seg + 1]
        p3 = pts[min(seg + 2, n - 1)]
        return 0.5 * (
            2 * p1
            + (-p0 + p2) * t
            + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t * t
            + (-p0 + 3 * p1 - 3 * p2 + p3) * t**3
        )

    cams = []
    for i in range(num_frames):
        t = i / max(num_frames - 1, 1)
        cams.append(
            Camera(
                position=tuple(catmull_rom(positions, t)),
                look_at_point=tuple(catmull_rom(looks, t)),
                fovy=keyframes[0].fovy,
            )
        )
    return cams


def render_flythrough(
    scene,
    cameras,
    output_dir: str,
    image_size=(800, 600),
    time_indices=None,
    view: int = 0,
    prefix: str = "frame",
):
    """Render a camera path (optionally stepping time per frame — the
    time-lag animation mode) to numbered PNGs; returns the file list."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    files = []
    for i, cam in enumerate(cameras):
        scene.views[view] = cam
        if time_indices is not None:
            scene.current_time = int(time_indices[i % len(time_indices)])
        img = np.asarray(scene.render_view(view, image_size=image_size))
        path = os.path.join(output_dir, f"{prefix}_{i:04d}.png")
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(path)
        files.append(path)
    return files
