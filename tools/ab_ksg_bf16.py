"""On-device A/B: renderer-jit frame times + KSG bf16-selection marginal rates.

OUTCOME (run 2026-08-18, TPU v5 lite0): the renderer-jit half PASSED
(outline 32.1 ms / slice 62.6 ms at 640x480 — the jit-core commits
hold on hardware). The KSG bf16-selection half is a NEGATIVE RESULT:
the kernel does not compile for v5e — Mosaic rejects packed bf16
vector comparisons outright ("Target does not support this
comparison", arith.cmpf on vector<8x128x2xbf16>), which interpret
mode and the numpy simulation could not surface. sel_bf16 is now
gated to interpret-only (ops/pallas/ksg_banded.py) and the decision
rule below is moot on this hardware generation.

Staged during the round-3 continuation session while the TPU tunnel
was down (8+ hours) — run from the repo root with the chip free (one
process at a time). Decides whether `mi_ksg_banded(sel_bf16=True)`
becomes the default: configs {f32/t1=32, bf16/t1=32, bf16/t1=64} are
measured at the 110k/442k-voxel marginal rate (see docs/ROUND3.md
"Measurement methodology") on correlated AND independent data, plus an
on-device banded-vs-banded equality row. Writes results JSON next to
the log.

Decision rule: flip the default if bf16/t64 beats f32/t32 by >10% on
BOTH datasets and the equality delta stays <= 2e-5.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

def sync(x):
    return float(jnp.sum(x))

print("devices:", jax.devices(), flush=True)
res = {}

# ---- renderer frames (validates the jit-core commit) ----
from correrender_tpu.render.camera import Camera
from correrender_tpu.render import outline as OL
from correrender_tpu.render.slice_renderer import slice_render_3d
from correrender_tpu.render.tf import TransferFunction

rng = np.random.default_rng(0)
vol = jnp.asarray(rng.standard_normal((128,128,128), dtype=np.float32))
cam = Camera(position=(0.05, 0.3, 0.85))
tf = TransferFunction.from_colormap("coolwarm", domain=(-2,2),
                                    opacity_points=((0.0,0.8),(1.0,0.8)))
box = (np.array([-0.25]*3, np.float32), np.array([0.25]*3, np.float32))

def timeit(fn, n=5):
    sync(fn()[0] if isinstance(fn(), tuple) else fn())
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); out=fn()
        sync(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter()-t0)
    return round(min(ts)*1e3,1), round(float(np.median(ts))*1e3,1)

res["outline_640x480_ms"] = timeit(lambda: OL.outline_render(cam, box, image_size=(640,480)))
res["slice3d_640x480_ms"] = timeit(lambda: slice_render_3d(vol, cam, tf, image_size=(640,480)))
print("renderers:", res, flush=True)

# ---- KSG bf16 selection A/B (marginal rate, interleaved) ----
from correrender_tpu.ops.pallas.ksg_banded import _banded_full
from correrender_tpu.ops.mi_ksg import NOISE_AMPLITUDE, _key_ref, _key_query

n = 1000
V1, V2 = 110_592, 442_368
datasets = {}
for kind in ("corr", "indep"):
    r = np.random.default_rng(1)
    ref = r.normal(size=n).astype(np.float32)
    s = r.normal(size=(V2, n)).astype(np.float32)
    if kind == "corr":
        s[: V2//2] = ref[None]*0.9 + 0.3*s[: V2//2]
    refj = jnp.asarray(ref) + jax.random.uniform(_key_ref(), (n,), jnp.float32)*NOISE_AMPLITUDE
    sj = jnp.asarray(s) + jax.random.uniform(_key_query(), (n,), jnp.float32)[None,:]*NOISE_AMPLITUDE
    datasets[kind] = (sj, refj)
    del s

configs = [("f32_t32", False, 32), ("bf16_t32", True, 32), ("bf16_t64", True, 64)]

def run_cfg(sj, refj, V, bf16, t1):
    mi, nbad = _banded_full(sj[:V], refj, 3, 1, 192, 256, False,
                            t1=t1, sel_bf16=bf16)
    t0=time.perf_counter(); sync(mi); dt=time.perf_counter()-t0
    return dt, float(jnp.max(nbad)), float(jnp.mean(nbad))

# compile warmup all configs x sizes on corr data
for name, bf16, t1 in configs:
    for V in (V1, V2):
        t0=time.perf_counter()
        run_cfg(*datasets["corr"], V, bf16, t1)
        print(f"warm {name} V={V}: {time.perf_counter()-t0:.0f}s", flush=True)

for kind in ("corr", "indep"):
    sj, refj = datasets[kind]
    rates = {name: [] for name,_,_ in configs}
    bads = {}
    for rep in range(3):
        for name, bf16, t1 in configs:
            t1s,_ ,_ = run_cfg(sj, refj, V1, bf16, t1)
            t2s, mb, meanb = run_cfg(sj, refj, V2, bf16, t1)
            rates[name].append((V2-V1)/(t2s-t1s))
            bads[name] = (mb, round(meanb,2))
    for name,_,_ in configs:
        med = sorted(rates[name])[1]
        res[f"ksg_{kind}_{name}_voxps"] = round(med)
        res[f"ksg_{kind}_{name}_bad"] = bads[name]
    print(kind, {k:v for k,v in res.items() if kind in k}, flush=True)

# equality on device
from correrender_tpu.ops.pallas.ksg_banded import mi_ksg_banded
from correrender_tpu.ops.pallas.ksg_kernel import _mi_ksg_flat
sj, refj = datasets["indep"]
a = mi_ksg_banded(sj[:4096], refj, k=3, estimator=1, sel_bf16=True)
b = mi_ksg_banded(sj[:4096], refj, k=3, estimator=1, sel_bf16=False)
res["bf16_vs_f32_maxdelta"] = float(jnp.max(jnp.abs(a-b)))
print(json.dumps(res), flush=True)
json.dump(res, open("/tmp/ab_ksg_bf16_results.json","w"), indent=1)
