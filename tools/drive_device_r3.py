"""On-device drive of the surfaces the round-3 review sweep touched.

The continuation session's 35 review fixes (depth compositing, scene
cache LRU, optim/diagram/model robustness) were validated only on the
virtual-CPU test mesh — the tunnel was down. This script drives the
touched runtime surfaces on the REAL chip, per the verify recipe:
TF optimization (GD + DiffDVR), BayOpt block-pair sampling, MINE
training, the neural SRN calculator, and a mixed multi-renderer scene
through Scene.render_view (the depth-merge path, registration-order
invariance asserted on hardware). Each section prints a one-line
verdict; the script exits non-zero on any failure and writes
/tmp/drive_device_r3.json.

Run with the chip free (one process at a time on the tunnel).
"""
import os, sys, time, json

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

# DRIVE_CPU=1: API dry-run without touching the (single-process)
# tunneled chip. The axon site hook force-prepends its platform
# regardless of JAX_PLATFORMS, so the override must go through
# jax.config before first backend use (tests/conftest.py pattern).
if os.environ.get("DRIVE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


results = {}
failures = []


def section(name):
    def deco(fn):
        t0 = time.time()
        try:
            out = fn()
            results[name] = {"ok": True, "s": round(time.time() - t0, 1),
                             **(out or {})}
        except Exception as e:  # noqa: BLE001 — drive harness
            results[name] = {"ok": False, "err": f"{type(e).__name__}: {e}"}
            failures.append(name)
        print(name, results[name], flush=True)
    return deco


print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


@section("tf_gd")
def _tf_gd():
    from correrender_tpu.render.tf import TransferFunction
    from correrender_tpu.render.classify import classify
    from correrender_tpu.optim.tf_opt import optimize_tf_gd

    a = jnp.asarray(rng.standard_normal((32, 32, 32), dtype=np.float32))
    b = a * 2.0 + 1.0  # same structure, different value range
    tf_a = TransferFunction.from_colormap("coolwarm", domain=(-3, 3))
    tf_b = optimize_tf_gd(a, tf_a, b, tf_size=64, epochs=200)
    # the fitted TF must map b's values to a's colors
    ca = classify(a.reshape(-1), tf_a.lut,
                  jnp.asarray(tf_a.domain, jnp.float32), premultiply=False)
    cb = classify(b.reshape(-1), tf_b.lut,
                  jnp.asarray(tf_b.domain, jnp.float32), premultiply=False)
    err = float(jnp.mean(jnp.abs(ca - cb)))
    assert err < 0.05, f"GD TF fit error {err}"
    return {"fit_err": round(err, 4)}


@section("tf_diffdvr")
def _tf_diffdvr():
    from correrender_tpu.render.tf import TransferFunction
    from correrender_tpu.render.camera import Camera
    from correrender_tpu.render.dvr import dvr_render
    from correrender_tpu.optim.tf_opt import optimize_tf_diffdvr

    a = jnp.asarray(rng.standard_normal((24, 24, 24), dtype=np.float32))
    b = a * 0.5
    tf_a = TransferFunction.from_colormap("viridis", domain=(-2, 2))
    cam = Camera(position=(0.1, 0.2, 0.9))
    tf_b = optimize_tf_diffdvr(a, tf_a, b, cam, tf_size=32, epochs=60,
                               image_size=(48, 48))
    img_a = dvr_render(a, cam, tf_a, image_size=(48, 48))
    img_b = dvr_render(b, cam, tf_b, image_size=(48, 48))
    err = float(jnp.mean(jnp.abs(img_a - img_b)))
    assert err < 0.05, f"DiffDVR image error {err}"
    return {"img_err": round(err, 4)}


@section("bayopt")
def _bayopt():
    from correrender_tpu.diagrams.bayopt import bayesian_opt_max
    from correrender_tpu.diagrams.octree import GridRegion
    from correrender_tpu.utils.fixtures import synth_box_ensemble

    data = synth_box_ensemble(xs=24, ys=24, zs=12, members=100)
    stack = np.moveaxis(np.asarray(data), 0, -1)  # (Z, Y, X, E)
    ra = GridRegion(0, 0, 0, 11, 11, 11)
    rb = GridRegion(12, 12, 0, 23, 23, 11)
    best = bayesian_opt_max(stack, ra, rb, measure="pearson",
                            num_init=16, num_iters=20)
    assert 0.0 <= best <= 1.0
    return {"best": round(float(best), 4)}


@section("mine_train")
def _mine():
    from correrender_tpu.models.mine import MineEstimator, train_mine

    n = 2000
    x = rng.standard_normal(n).astype(np.float32)
    y = (0.9 * x + 0.45 * rng.standard_normal(n)).astype(np.float32)
    est = MineEstimator.create(hidden=64, num_layers=3)
    _, mi = train_mine(est, jnp.asarray(x), jnp.asarray(y), steps=400)
    # analytic MI for rho≈0.894: −0.5·ln(1−ρ²) ≈ 0.80 nats
    assert 0.3 < mi < 1.5, f"MINE estimate {mi}"
    return {"mi_nats": round(mi, 3)}


@section("neural_srn")
def _srn():
    from correrender_tpu.calculators.neural import NeuralCorrelationCalculator
    from correrender_tpu.core.fields import GridMetadata, VolumeData
    from correrender_tpu.utils.fixtures import synth_box_ensemble

    arrs = np.asarray(synth_box_ensemble(xs=16, ys=16, zs=8, members=50))
    vd = VolumeData(GridMetadata(xs=16, ys=16, zs=8, ts=1, es=50))
    vd.add_field("f", lambda t, e: arrs[e])
    calc = NeuralCorrelationCalculator(
        "f", reference_point=(8, 8, 4), train_steps=60)
    vd.add_calculator(calc)
    out = np.asarray(vd.get_field(calc.output_name))
    assert out.shape == (8, 16, 16) and np.isfinite(out).any()
    return {"max": round(float(np.nanmax(out)), 3)}


@section("mixed_scene_depth")
def _scene():
    from correrender_tpu.app.state import Scene
    from correrender_tpu.core.fields import GridMetadata, VolumeData
    from correrender_tpu.utils.fixtures import synth_box_ensemble

    data = np.asarray(synth_box_ensemble(xs=48, ys=48, zs=24, members=20))
    vd = VolumeData(GridMetadata(xs=48, ys=48, zs=24, ts=1, es=20))
    vd.add_field("f", lambda t, e: data[e])
    iso_v = float(data.mean() + data.std())

    def build(order):
        scene = Scene(vd)
        for kind in order:
            if kind == "dvr":
                scene.add_renderer("dvr", field="f")
            elif kind == "iso":
                scene.add_renderer("iso_ray", field="f", iso_value=iso_v)
            elif kind == "slice":
                scene.add_renderer("slice", field="f")
            else:
                scene.add_renderer("domain_outline", field="f")
        return np.asarray(scene.render_view(0, image_size=(320, 240)))

    img1 = build(("dvr", "iso", "slice", "outline"))
    img2 = build(("outline", "slice", "dvr", "iso"))
    delta = float(np.max(np.abs(img1 - img2)))
    assert delta == 0.0, f"order-dependent composite, max|d|={delta}"
    assert np.isfinite(img1).all()
    return {"order_delta": delta}


print(json.dumps(results), flush=True)
json.dump(results, open("/tmp/drive_device_r3.json", "w"), indent=1)
sys.exit(1 if failures else 0)
