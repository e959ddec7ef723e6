"""One-command hardware smoke: <3 min on the tunneled TPU.

VERDICT r3 #10: flaky-tunnel sessions need a way to pin silicon
correctness per commit without the ~14-minute full bench. This runs:

1. a timeout-bounded device probe (and aborts clearly if unreachable),
2. ONE on-device equality row per Pallas kernel family vs its XLA
   formulation (small shapes),
3. one DVR shear-warp frame + one iso first-hit frame at 640×360,
4. one tiny HEB request-path serve,

and prints a single JSON line with pass/fail per item.

Run: ``python tools/smoke.py`` (real device; ~1-3 min with warm
compile cache, bounded by per-step timeouts).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _probe(q):
    import jax

    q.put(str(jax.devices()[0]))


def main():
    t_start = time.time()
    out = {"tool": "smoke", "ok": True}

    # -- 1. device probe (bounded; a hung tunnel must not hang us) ---
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    proc = ctx.Process(target=_probe, args=(q,))
    proc.start()
    proc.join(timeout=300)
    if proc.is_alive() or q.empty():
        proc.kill()
        print(json.dumps({"tool": "smoke", "ok": False,
                          "error": "device probe timed out (300 s)"}))
        sys.exit(1)
    out["device"] = q.get()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from correrender_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # cold tunnel compiles dominate otherwise

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def step(name, fn, budget_s=90):
        t0 = time.time()
        try:
            val = fn()
            out[name] = val
        except Exception as exc:  # noqa: BLE001 — report, don't die
            out[name] = f"FAIL: {exc}"
            out["ok"] = False
        out[f"{name}_s"] = round(time.time() - t0, 1)

    # -- 2. kernel-family equality rows (the bench sweep's shapes —
    # n=200 members keeps the banded-KSG band assumptions identical
    # to the per-round equality artifact) ----------------------------
    rng = np.random.default_rng(0)
    n, v = 200, 64
    ref = jnp.asarray(rng.normal(size=n).astype(np.float32))
    series_np = rng.normal(size=(v, n)).astype(np.float32)
    series_np[:16] = np.asarray(ref)[None, :] * 0.9 \
        + 0.3 * series_np[:16]
    stack = jnp.asarray(series_np)

    def eq_pearson():
        from correrender_tpu import ops
        from correrender_tpu.ops.pallas.pearson_kernel import (
            pearson_pallas,
        )

        want = ops.correlate(ref, stack, "pearson")
        got = pearson_pallas(stack, ref)
        return float(jnp.max(jnp.abs(got - want)))

    def eq_spearman():
        from correrender_tpu import ops
        from correrender_tpu.ops.pallas.spearman_kernel import (
            spearman_pallas,
        )

        want = ops.correlate(ref, stack, "spearman")
        got = spearman_pallas(stack, ref)
        return float(jnp.max(jnp.abs(got - want)))

    def eq_ksg():
        from correrender_tpu.ops.mi_ksg import (
            mutual_information_kraskov,
        )
        from correrender_tpu.ops.pallas.ksg_banded import mi_ksg_banded

        want = mutual_information_kraskov(ref, stack, k=3, estimator=1)
        got = mi_ksg_banded(stack, ref, k=3, estimator=1)
        return float(jnp.max(jnp.abs(got - want)))

    step("pearson_pallas_delta", eq_pearson)
    step("spearman_pallas_delta", eq_spearman)
    step("ksg_banded_delta", eq_ksg)

    # -- 3. one frame per fast renderer ------------------------------
    from correrender_tpu.render import Camera, TransferFunction
    from correrender_tpu.render.dvr_fast import dvr_shearwarp
    from correrender_tpu.render.iso_fast import iso_shearwarp

    vol = jax.random.uniform(jax.random.key(3), (96, 96, 96))
    cam = Camera(position=(0.05, 0.3, 0.85))
    tf = TransferFunction.from_colormap("coolwarm", domain=(0, 1))

    def dvr_frame():
        img = dvr_shearwarp(vol, cam, tf, image_size=(640, 360))
        s = sync(img)
        t0 = time.time()
        s += sync(dvr_shearwarp(vol, cam, tf, image_size=(640, 360)))
        ms = (time.time() - t0) * 1000.0
        assert np.isfinite(s)
        return round(ms, 1)

    def iso_frame():
        img = iso_shearwarp(vol, cam, 0.55, image_size=(640, 360),
                            axial_supersample=2)
        s = sync(img)
        t0 = time.time()
        s += sync(iso_shearwarp(vol, cam, 0.55,
                                image_size=(640, 360),
                                axial_supersample=2))
        ms = (time.time() - t0) * 1000.0
        assert np.isfinite(s)
        return round(ms, 1)

    step("dvr_warm_frame_ms", dvr_frame)
    step("iso_ss2_warm_frame_ms", iso_frame)

    def dvr_exact_frame():
        # Pallas plane-order exact marcher (round 5): DVR-kernel
        # compile is ~7 s fresh; the refined iso kernel (~2-3 min) is
        # deliberately excluded from the <3-min smoke budget.
        from correrender_tpu.render.raymarch_exact import (
            dvr_render_exact,
        )

        img = dvr_render_exact(vol, cam, tf, image_size=(640, 360),
                               voxel_step=0.25)
        s = sync(img)
        t0 = time.time()
        s += sync(dvr_render_exact(vol, cam, tf,
                                   image_size=(640, 360),
                                   voxel_step=0.25))
        ms = (time.time() - t0) * 1000.0
        assert np.isfinite(s)
        return round(ms, 1)

    step("dvr_exact_warm_frame_ms", dvr_exact_frame)

    # -- 4. tiny HEB request serve -----------------------------------
    def heb_serve():
        from correrender_tpu.diagrams.heb import HEBChart

        rng = np.random.default_rng(0)
        s = rng.standard_normal((16, 16, 16, 8)).astype(np.float32)
        chart = HEBChart(s, downsample_factor=4,
                         sampling_method="plastic", num_samples=8,
                         max_chords=20)
        chart.compute_correlations()
        t0 = time.time()
        chords = chart.compute_correlations()
        assert len(chords) > 0
        return round((time.time() - t0) * 1000.0, 1)

    step("heb_warm_serve_ms", heb_serve)

    # Equality rows must be small on silicon.
    for k in ("pearson_pallas_delta", "spearman_pallas_delta",
              "ksg_banded_delta"):
        v = out.get(k)
        if isinstance(v, float) and v > 1e-3:
            out["ok"] = False
            out[k] = f"DELTA TOO LARGE: {v}"

    out["wall_s"] = round(time.time() - t_start, 1)
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
