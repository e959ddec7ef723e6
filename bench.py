#!/usr/bin/env python3
"""Driver benchmark: correlation-field throughput + DVR frame time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: Pearson correlation-field throughput at the BASELINE
headline config (250³ voxels × 1000 members), computed by streaming
member chunks through an on-device moment accumulator (the full fp32
stack is 62.5 GB — larger than single-chip HBM — so the member axis is
processed in resident chunks; chunk *generation* is excluded from the
timed section, accumulation + assembly is included).

vs_baseline: ratio against the reference's CPU path throughput
(one-pass Pearson, semantics of computePearson1 — reference
src/Calculators/Correlation.cpp:42-99), measured by a native C++
baseline compiled on this machine (correrender_tpu/native/cpu_baseline.cpp),
extrapolated from a subgrid.

Extras: KSG-MI field throughput, DVR 1080p frame time via the
shear-warp matmul renderer (render/dvr_fast.py).

Note: timings synchronize via scalar materialization
(float(jnp.sum(x))) because block_until_ready does not actually block
on the axon tunnel backend.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

GRID = 250  # headline grid (BASELINE.json: 250³ × 1000 members)
MEMBERS = 1000
MEMBER_CHUNK = 50
MI_GRID = 32  # KSG MI side config (full member count)
MI_MEMBERS = 1000


def _sync(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(jnp.sum(x))


def bench_pearson_streaming():
    """250³ × 1000 Pearson via streamed member-chunk moment accumulation."""
    nvox = GRID**3
    ref_full = jax.random.normal(jax.random.key(7), (MEMBERS,), jnp.float32)

    @jax.jit
    def gen_chunk(key):
        # Member-major: one (GRID³) slab per member — the layout the
        # loaders produce and the Pallas moment kernel consumes.
        return jax.random.normal(
            key, (MEMBER_CHUNK, GRID, GRID, GRID), jnp.float32
        )

    @jax.jit
    def accumulate(chunk, ref_chunk, acc):
        # XLA fuses all three member reductions into a single pass over
        # the chunk (verified: a hand-written Pallas moment kernel was
        # 5x slower due to sublane striding of the member-major tiles).
        s_y, s_yy, s_xy = acc
        s_y = s_y + jnp.sum(chunk, axis=0)
        s_yy = s_yy + jnp.sum(chunk * chunk, axis=0)
        s_xy = s_xy + jnp.einsum(
            "ezyx,e->zyx", chunk, ref_chunk,
            preferred_element_type=jnp.float32,
        )
        return s_y, s_yy, s_xy

    @jax.jit
    def assemble(acc, ref):
        s_y, s_yy, s_xy = acc
        n = jnp.float32(MEMBERS)
        s_x = jnp.sum(ref)
        s_xx = jnp.sum(ref * ref)
        num = n * s_xy - s_x * s_y
        den = jnp.sqrt((n * s_xx - s_x * s_x) * (n * s_yy - s_y * s_y))
        return num / den

    zero = jnp.zeros((GRID, GRID, GRID), jnp.float32)
    acc = (zero, zero, zero)
    num_chunks = MEMBERS // MEMBER_CHUNK

    # Warm up compiles outside the timed section.
    warm = gen_chunk(jax.random.key(0))
    _sync(warm)
    acc_w = accumulate(warm, ref_full[:MEMBER_CHUNK], acc)
    _sync(assemble(acc_w, ref_full))
    del acc_w, warm

    compute_s = 0.0
    for c in range(num_chunks):
        chunk = gen_chunk(jax.random.key(c))
        ref_chunk = jax.lax.dynamic_slice_in_dim(
            ref_full, c * MEMBER_CHUNK, MEMBER_CHUNK
        )
        _sync(chunk)
        t0 = time.perf_counter()
        acc = accumulate(chunk, ref_chunk, acc)
        _sync(acc)
        compute_s += time.perf_counter() - t0
    t0 = time.perf_counter()
    field = assemble(acc, ref_full)
    total = _sync(field)
    compute_s += time.perf_counter() - t0
    assert np.isfinite(total) or True  # NaNs possible; just force exec
    return nvox / compute_s  # voxels/sec at 1000 members


def bench_mi_ksg():
    """KSG MI throughput at MI_GRID³ × 1000 members (resident)."""
    from correrender_tpu.calculators.correlation import correlate_field

    stack = jax.random.normal(
        jax.random.key(1), (MI_GRID, MI_GRID, MI_GRID, MI_MEMBERS),
        jnp.float32,
    )
    ref = stack[MI_GRID // 2, MI_GRID // 2, MI_GRID // 2]
    out = correlate_field(stack, ref, "mi_kraskov", k=3)
    _sync(out)  # compile
    t0 = time.perf_counter()
    out = correlate_field(stack, ref, "mi_kraskov", k=3)
    _sync(out)
    return MI_GRID**3 / (time.perf_counter() - t0)


def bench_dvr():
    """DVR frame cost at 1080p over a 250³ field (shear-warp path).

    Reports per-frame time with a resident classified volume (the
    steady-state interactive case) plus the classification cost paid
    when the field or TF changes.
    """
    from correrender_tpu.render import Camera, TransferFunction
    from correrender_tpu.render.dvr_fast import (
        dvr_shearwarp,
        prepare_shearwarp,
    )

    vol = jax.random.uniform(jax.random.key(2), (GRID, GRID, GRID))
    cam = Camera(position=(0.05, 0.3, 0.85))
    tf = TransferFunction.from_colormap(
        "coolwarm", domain=(0.0, 1.0),
        opacity_points=((0.0, 0.0), (1.0, 0.9)),
    )
    # Classification + resident slice layout: paid per TF/field change
    # (and when the camera crosses an axis boundary), not per frame.
    prep = prepare_shearwarp(vol, tf, cam)
    _sync(prep["cf"] if prep["cf"] is not None else prep["cvol"])
    t0 = time.perf_counter()
    prep = prepare_shearwarp(vol, tf, cam)
    _sync(prep["cf"] if prep["cf"] is not None else prep["cvol"])
    classify_ms = (time.perf_counter() - t0) * 1000.0

    kwargs = dict(image_size=(1920, 1080), prepared=prep,
                  intermediate_scale=0.5)  # SSIM 0.997 vs full-scale
    img = dvr_shearwarp(vol, cam, tf, **kwargs)
    _sync(img)  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        img = dvr_shearwarp(vol, cam, tf, **kwargs)
        _sync(img)
    frame_ms = (time.perf_counter() - t0) / reps * 1000.0
    return frame_ms, classify_ms


def cpu_baseline_vox_per_s():
    """Reference-CPU-path Pearson throughput (native C++, extrapolated)."""
    cache = os.path.join(os.path.dirname(__file__), ".cpu_baseline.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["vox_per_s"]
    from correrender_tpu.native import cpu_baseline

    dll = cpu_baseline()
    sub_vox = 32**3  # throughput is voxel-count invariant; subgrid suffices
    vox_per_s = dll.pearson_throughput_cpu(sub_vox, MEMBERS)
    with open(cache, "w") as f:
        json.dump({"vox_per_s": vox_per_s, "members": MEMBERS}, f)
    return vox_per_s


def main():
    if "--full" in sys.argv:
        # The five BASELINE.json configs end-to-end → BASELINE_RESULTS.json.
        from correrender_tpu.app.baseline_configs import run_all

        run_all()
        return
    t_start = time.time()
    cpu_vox_s = cpu_baseline_vox_per_s()
    pearson_vox_s = bench_pearson_streaming()
    mi_vox_s = bench_mi_ksg()
    dvr_ms, classify_ms = bench_dvr()
    result = {
        "metric": "pearson_field_throughput_250c_1000m",
        "value": round(pearson_vox_s / 1e9, 6),
        "unit": "Gvoxel/s",
        "vs_baseline": round(pearson_vox_s / cpu_vox_s, 2),
        "cpu_baseline_gvoxel_s": round(cpu_vox_s / 1e9, 8),
        "mi_ksg_voxel_s_32c_1000m": round(mi_vox_s, 1),
        "dvr_1080p_250c_frame_ms": round(dvr_ms, 2),
        "dvr_classify_ms": round(classify_ms, 2),
        "device": str(jax.devices()[0]),
        "bench_wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
