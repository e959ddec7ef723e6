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

Extras: KSG-MI field throughput + its own CPU-reference ratio
(mi_vs_baseline; CPU path = k-d tree KSG of MutualInformation.cpp:
399-509 reimplemented in native/cpu_baseline.cpp), DVR 1080p frame
time via the shear-warp matmul renderer (render/dvr_fast.py), and a
real-hardware kernel-equality sweep (max|Δ| of every Pallas stat
kernel vs its XLA formulation).

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
MI_GRID = 48  # KSG MI side config (full member count)
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
        # The upcast keeps bf16-staged chunks accumulating in f32 (it
        # fuses into the read — HBM still moves 2 bytes/element).
        chunk = chunk.astype(jnp.float32)
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

    # Two resident chunk buffers, alternated: the member stream never
    # waits on generation and — crucially — the accumulate chain is
    # enqueued WITHOUT per-chunk syncs, so the device pipelines all
    # chunks back-to-back (round 1 paid 20 forced pipeline drains at
    # ~9% of HBM bandwidth; a single end-of-stream sync is the real
    # steady-state shape of the streaming path).
    chunk_a = gen_chunk(jax.random.key(0))
    chunk_b = gen_chunk(jax.random.key(1))
    _sync(chunk_a)
    _sync(chunk_b)
    ref_chunks = [
        ref_full[c * MEMBER_CHUNK:(c + 1) * MEMBER_CHUNK]
        for c in range(num_chunks)
    ]

    # Warm up compiles outside the timed section.
    acc_w = accumulate(chunk_a, ref_chunks[0], acc)
    _sync(assemble(acc_w, ref_full))
    del acc_w

    t0 = time.perf_counter()
    for c in range(num_chunks):
        chunk = chunk_a if c % 2 == 0 else chunk_b
        acc = accumulate(chunk, ref_chunks[c], acc)
    field = assemble(acc, ref_full)
    _sync(field)  # single end-of-stream drain
    compute_s = time.perf_counter() - t0

    # bf16 member staging (the catalog's float16 format_cast → bf16
    # path, core/fields.py): halves the HBM-bound chunk reads; the
    # accumulator stays f32.
    chunk_ab = chunk_a.astype(jnp.bfloat16)
    chunk_bb = chunk_b.astype(jnp.bfloat16)
    _sync(chunk_ab.astype(jnp.float32))
    _sync(chunk_bb.astype(jnp.float32))
    acc = (zero, zero, zero)
    acc_w = accumulate(chunk_ab, ref_chunks[0], acc)
    _sync(assemble(acc_w, ref_full))
    del acc_w
    acc = (zero, zero, zero)
    t0 = time.perf_counter()
    for c in range(num_chunks):
        chunk = chunk_ab if c % 2 == 0 else chunk_bb
        acc = accumulate(chunk, ref_chunks[c], acc)
    field = assemble(acc, ref_full)
    _sync(field)
    bf16_s = time.perf_counter() - t0
    return nvox / compute_s, nvox / bf16_s  # voxels/sec at 1000 members


def bench_mi_ksg():
    """KSG MI throughput at MI_GRID³ × 1000 members (banded kernel)."""
    from correrender_tpu.ops.pallas.ksg_banded import mi_ksg_banded

    stack = jax.random.normal(
        jax.random.key(1), (MI_GRID * MI_GRID * MI_GRID, MI_MEMBERS),
        jnp.float32,
    )
    ref = stack[0]
    out = mi_ksg_banded(stack, ref, k=3, estimator=1)
    _sync(out)  # compile
    t0 = time.perf_counter()
    out = mi_ksg_banded(stack, ref, k=3, estimator=1)
    _sync(out)
    return MI_GRID**3 / (time.perf_counter() - t0)


def cpu_ksg_baseline_vox_per_s():
    """Reference-CPU-path KSG throughput (native C++ k-d tree)."""
    from correrender_tpu.native import cpu_baseline

    def measure():
        dll = cpu_baseline()
        return dll.ksg_throughput_cpu(256, MI_MEMBERS, 3, 1)

    return _cached_baseline(
        ".cpu_ksg_baseline.json",
        {"members": MI_MEMBERS, "k": 3, "estimator": 1}, measure,
    )


def kernel_equality_sweep():
    """max|Δ| of each Pallas stat kernel vs its XLA formulation, ON THE
    REAL DEVICE (VERDICT r1: interpret-mode CI never exercised Mosaic
    numerics). Small shapes — this is a correctness tripwire, not a
    perf probe."""
    from correrender_tpu import ops
    from correrender_tpu.ops.mi_ksg import mutual_information_kraskov
    from correrender_tpu.ops.pallas import (
        mi_ksg_banded,
        mi_ksg_pallas,
        pearson_pallas,
    )
    from correrender_tpu.ops.pallas.kendall_kernel import kendall_pallas
    from correrender_tpu.ops.pallas.spearman_kernel import spearman_pallas

    rng = np.random.default_rng(0)
    n, v = 200, 64
    ref = jnp.asarray(rng.normal(size=n).astype(np.float32))
    series = rng.normal(size=(v, n)).astype(np.float32)
    series[:16] = np.asarray(ref)[None, :] * 0.9 + 0.3 * series[:16]
    series = jnp.asarray(series)

    def mx(a, b):
        return round(float(jnp.max(jnp.abs(a - b))), 8)

    out = {}
    out["pearson"] = mx(pearson_pallas(series, ref),
                        ops.pearson(ref, series))
    out["spearman"] = mx(spearman_pallas(series, ref),
                         ops.spearman(ref, series))
    out["kendall"] = mx(kendall_pallas(series, ref),
                        ops.kendall(ref, series))
    for est in (1, 2):
        want = mutual_information_kraskov(ref, series, k=3, estimator=est)
        out[f"ksg_exact_est{est}"] = mx(
            mi_ksg_pallas(series, ref, k=3, estimator=est), want
        )
        out[f"ksg_banded_est{est}"] = mx(
            mi_ksg_banded(series, ref, k=3, estimator=est), want
        )
    return out


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
    # Resident slice layout: the scalar (slice, v, u) volume is
    # TF-independent, so a transfer-function change re-runs only the
    # fused classify_to_cf pass (prior reuse) — measure exactly that.
    prep = prepare_shearwarp(vol, tf, cam)
    _sync(prep["cf"] if prep["cf"] is not None else prep["cvol"])
    tf2 = TransferFunction.from_colormap(
        "viridis", domain=(0.0, 1.0),
        opacity_points=((0.0, 0.0), (1.0, 0.8)),
    )
    prep2 = prepare_shearwarp(vol, tf2, cam, prior=prep)
    _sync(prep2["cf"] if prep2["cf"] is not None else prep2["cvol"])
    t0 = time.perf_counter()
    prep2 = prepare_shearwarp(vol, tf2, cam, prior=prep)
    _sync(prep2["cf"] if prep2["cf"] is not None else prep2["cvol"])
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

    # Resident-layout cross-check ON HARDWARE: the prepared fast path
    # must match the unprepared (classify-per-call) path at full image
    # scale (VERDICT r1: the fast paths were only pinned against tiny
    # CPU goldens).
    img_unprep = dvr_shearwarp(vol, cam, tf, image_size=(1920, 1080),
                               intermediate_scale=0.5)
    prep_delta = float(jnp.max(jnp.abs(img - img_unprep)))
    return frame_ms, classify_ms, prep_delta


def _cached_baseline(name, params, measure_fn):
    """Per-machine baseline cache; re-measures when the parameters (or
    machine — the cache files are gitignored) change."""
    cache = os.path.join(os.path.dirname(__file__), name)
    if os.path.exists(cache):
        with open(cache) as f:
            data = json.load(f)
        if data.get("params") == params:
            return data["vox_per_s"]
    vox_per_s = measure_fn()
    with open(cache, "w") as f:
        json.dump({"vox_per_s": vox_per_s, "params": params}, f)
    return vox_per_s


def cpu_baseline_vox_per_s():
    """Reference-CPU-path Pearson throughput (native C++, extrapolated)."""
    from correrender_tpu.native import cpu_baseline

    def measure():
        dll = cpu_baseline()
        # Throughput is voxel-count invariant; a subgrid suffices.
        return dll.pearson_throughput_cpu(32**3, MEMBERS)

    return _cached_baseline(
        ".cpu_baseline.json", {"members": MEMBERS}, measure
    )


def main():
    if "--full" in sys.argv:
        # The five BASELINE.json configs end-to-end → BASELINE_RESULTS.json.
        from correrender_tpu.app.baseline_configs import run_all

        run_all()
        return
    t_start = time.time()
    cpu_vox_s = cpu_baseline_vox_per_s()
    cpu_ksg_vox_s = cpu_ksg_baseline_vox_per_s()
    pearson_vox_s, pearson_bf16_vox_s = bench_pearson_streaming()
    mi_vox_s = bench_mi_ksg()
    dvr_ms, classify_ms, prep_delta = bench_dvr()
    equality = kernel_equality_sweep()
    equality["dvr_prepared_vs_unprepared"] = round(prep_delta, 6)
    result = {
        "metric": "pearson_field_throughput_250c_1000m",
        "value": round(pearson_vox_s / 1e9, 6),
        "unit": "Gvoxel/s",
        "vs_baseline": round(pearson_vox_s / cpu_vox_s, 2),
        "cpu_baseline_gvoxel_s": round(cpu_vox_s / 1e9, 8),
        "pearson_bf16_staged_gvoxel_s": round(
            pearson_bf16_vox_s / 1e9, 6
        ),
        "mi_ksg_voxel_s_48c_1000m": round(mi_vox_s, 1),
        "mi_vs_baseline": round(mi_vox_s / cpu_ksg_vox_s, 2),
        "cpu_ksg_baseline_voxel_s": round(cpu_ksg_vox_s, 1),
        "mi_250c_projected_s": round(250**3 / mi_vox_s, 1),
        "dvr_1080p_250c_frame_ms": round(dvr_ms, 2),
        "dvr_classify_ms": round(classify_ms, 2),
        "kernel_equality_max_abs_delta": equality,
        "device": str(jax.devices()[0]),
        "bench_wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
