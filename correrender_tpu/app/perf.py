"""Automatic performance measurement: state sweeps with CSV output.

Reference: src/Utils/AutomaticPerformanceMeasurer.{hpp,cpp} (--perf
mode) — iterates InternalState configs (dataset × resolution ×
renderer), orbits the camera, records frame times and memory, writes
CSV. Here each state is rendered headlessly over an orbit path and
timed with forced materialization (the axon backend's
``block_until_ready`` does not block).
"""

from __future__ import annotations

import csv
import dataclasses
import math
import time

import jax.numpy as jnp
import numpy as np

from correrender_tpu.render.camera import orbit_camera


@dataclasses.dataclass
class PerfState:
    """One sweep state (InternalState.hpp:128-199 analogue)."""

    name: str
    renderer: str = "dvr"
    image_size: tuple = (1920, 1080)
    field: str | None = None
    num_frames: int = 16
    settings: dict = dataclasses.field(default_factory=dict)
    # Memory-pressure mode: the rendered field cycles round-robin per
    # frame, so a cache budget smaller than the field set forces
    # evictions mid-sweep (exercises core/cache.py budget paths under
    # measurement, not just unit tests).
    cycle_fields: tuple = ()


def _sync(x):
    return float(jnp.sum(x))


def _device_memory_mib():
    """Device memory in use (the reference's VRAM column,
    AutomaticPerformanceMeasurer.hpp:84); None off-TPU."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats["bytes_in_use"] / 2**20, 1)
    except Exception:  # noqa: BLE001 - CPU backend has no stats
        return None


def default_perf_states(full: bool = False, fields=None):
    """The reference-style state matrix: renderer × resolution
    (× field), InternalState.cpp:39-110 analogue. The full tier
    includes 4K — the reference's discrete-GPU default resolution
    (InternalState.cpp:42-55)."""
    sizes = (
        [(3840, 2160), (1920, 1080), (1280, 720), (640, 480)] if full
        else [(640, 480)]
    )
    renderers = ["dvr", "iso_ray", "domain_outline", "slice"]
    states = []
    for field in (fields or [None]):
        for r in renderers:
            for (w, h) in sizes:
                suffix = f"_{field}" if field else ""
                states.append(PerfState(
                    f"{r}_{w}x{h}{suffix}", renderer=r,
                    image_size=(w, h), field=field,
                    num_frames=16 if full else 8,
                ))
    if fields and len(fields) > 1:
        # Memory-pressure state: cycling the rendered field each frame
        # churns the field cache (evictions when the budget is below
        # the set's total) — measured, not just unit-tested.
        states.append(PerfState(
            "dvr_field_cycle", renderer="dvr",
            image_size=sizes[-1], field=fields[0],
            num_frames=max(2 * len(fields), 8),
            cycle_fields=tuple(fields),
        ))
    return states


def run_perf_sweep(scene, states, csv_path=None):
    """Render each state over a camera orbit; returns row dicts."""
    rows = []
    for state in states:
        scene.renderers = []
        scene.add_renderer(
            state.renderer, view=0,
            **({"field": state.field} if state.field else {}),
            **state.settings,
        )
        cache = scene.volume_data.cache
        misses_before = cache.misses
        frame_times = []
        for i in range(state.num_frames):
            theta = 2.0 * math.pi * i / state.num_frames
            scene.views[0] = orbit_camera(theta, 0.3, radius=0.85)
            if state.cycle_fields:
                cyc = state.cycle_fields[i % len(state.cycle_fields)]
                scene.renderers[0]["field"] = cyc
            t0 = time.perf_counter()
            img = scene.render_view(0, image_size=state.image_size)
            _sync(img)
            frame_times.append((time.perf_counter() - t0) * 1000.0)
        arr = np.asarray(frame_times[1:] or frame_times)  # drop warm-up
        rows.append(
            {
                "state": state.name,
                "renderer": state.renderer,
                "width": state.image_size[0],
                "height": state.image_size[1],
                "frames": state.num_frames,
                "time_avg_ms": round(float(arr.mean()), 3),
                "time_median_ms": round(float(np.median(arr)), 3),
                "time_min_ms": round(float(arr.min()), 3),
                "time_max_ms": round(float(arr.max()), 3),
                "cache_used_mib": round(
                    cache.used_bytes / 2**20, 1
                ),
                "cache_misses": cache.misses - misses_before,
                "device_mem_mib": _device_memory_mib(),
            }
        )
    if csv_path:
        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    return rows
