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
    video_path: str | None = None,
    fps: int = 30,
):
    """Render a camera path (optionally stepping time per frame — the
    time-lag animation mode) to numbered PNGs; returns the file list.
    With ``video_path``, additionally encodes the frames as an MJPEG
    AVI (write_mjpeg_avi).

    Two-phase pipeline: every frame's render is DISPATCHED first
    (device arrays, no sync), then frames are fetched and PNG-encoded.
    The serialized loop paid a full device sync + host transfer + PNG
    deflate per frame (~85 ms of the 98.7 ms config-4 frame, measured
    round 5); pipelining overlaps the device's frame n+1 with the
    host's encode of frame n. PNG compress level 1: these are
    full-color renders where deflate ratios barely move between levels
    but the 1-core host pays ~15 ms/frame at the default level 6.
    """
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    pending = []
    for i, cam in enumerate(cameras):
        scene.views[view] = cam
        if time_indices is not None:
            scene.current_time = int(time_indices[i % len(time_indices)])
        pending.append(scene.render_view(view, image_size=image_size))
    files = []
    for i, img in enumerate(pending):
        img = np.asarray(img)
        path = os.path.join(output_dir, f"{prefix}_{i:04d}.png")
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(path, compress_level=1)
        files.append(path)
    if video_path:
        write_mjpeg_avi(files, video_path, fps=fps)
    return files


def write_mjpeg_avi(frames, path: str, fps: int = 30,
                    quality: int = 90) -> str:
    """Encode frames into an MJPEG AVI — flythrough video export.

    The reference records camera-path videos through sgl's video
    writer; this image has no ffmpeg, so the RIFF/AVI container is
    written directly with PIL-encoded JPEG frames (universally
    playable, dependency-free).

    Args:
      frames: iterable of (H, W, 3/4) float [0,1] / uint8 arrays OR
        image file paths.
      fps: playback rate.
      quality: JPEG quality (1-100).

    Returns:
      ``path``.
    """
    import io as _io
    import struct as _struct

    import numpy as _np
    from PIL import Image

    encoded = []
    size = None
    for fr in frames:
        if isinstance(fr, (str, bytes)):
            img = Image.open(fr).convert("RGB")
        else:
            arr = _np.asarray(fr)
            if arr.dtype != _np.uint8:
                arr = (_np.clip(arr, 0, 1) * 255).astype(_np.uint8)
            img = Image.fromarray(arr[..., :3])
        if size is None:
            size = img.size
        elif img.size != size:
            img = img.resize(size)
        buf = _io.BytesIO()
        img.save(buf, "JPEG", quality=quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\0"
        encoded.append(data)
    if not encoded:
        raise ValueError("no frames to encode")
    w, h = size
    n = len(encoded)
    max_size = max(len(d) for d in encoded)

    def chunk(fourcc, payload):
        out = fourcc + _struct.pack("<I", len(payload)) + payload
        return out + (b"\0" if len(payload) % 2 else b"")

    def lst(fourcc, payload):
        return chunk(b"LIST", fourcc + payload)

    avih = _struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, max_size * fps, 0, 0x10, n, 0, 1,
        max_size, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + _struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                       max_size, 0, 0)
        + _struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = _struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )
    movi_items = b"".join(chunk(b"00dc", d) for d in encoded)
    movi = lst(b"movi", movi_items)
    idx = b""
    off = 4
    for d in encoded:
        idx += b"00dc" + _struct.pack("<III", 0x10, off, len(d))
        off += 8 + len(d) + (len(d) % 2)
    idx1 = chunk(b"idx1", idx)
    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + _struct.pack("<I", len(riff_payload))
                + riff_payload)
    return path
