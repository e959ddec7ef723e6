"""On-device ablation: how much of the banded KSG kernel is the cy
full-row count stage?

ROUND3's null-selection ablation pegged selection at ~53%; the cy
stage (npad² compares per voxel — nominally ~16 W-pass equivalents,
the largest stage by op count) was never measured in isolation. This
script A/Bs the production kernel against a copy whose cy chunk loop
is replaced by a constant (results are garbage — only the rate
matters), interleaved at the 110k/442k-voxel marginal per the
measurement methodology in docs/ROUND3.md.

If cy is a large share, an in-kernel sorted-y banded count (bitonic
lane sort with rcy payload + Wy-band count + the existing per-point
repair) is worth building; if small, it is not.
"""
import sys, time, json

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

import correrender_tpu.ops.pallas.ksg_banded as KB
from correrender_tpu.ops.mi_ksg import NOISE_AMPLITUDE, _key_ref, _key_query

print("devices:", jax.devices(), flush=True)


# The ablation uses ksg_banded._NULL_CY — a test-only trace-time flag
# that replaces the cy chunk loop with `cy = cx` inside the kernel.
assert hasattr(KB, "_NULL_CY"), (
    "ksg_banded needs the _NULL_CY ablation flag (test-only) for this "
    "probe — see tools/ab_cy_ablation.py"
)

n = 1000
V1, V2 = 110_592, 442_368
rng = np.random.default_rng(1)
ref = rng.normal(size=n).astype(np.float32)
refj = jnp.asarray(ref) + jax.random.uniform(
    _key_ref(), (n,), jnp.float32) * NOISE_AMPLITUDE


def make_data(kind):
    s = rng.normal(size=(V2, n)).astype(np.float32)
    if kind == "corr":
        s[: V2 // 2] = ref[None] * 0.9 + 0.3 * s[: V2 // 2]
    return jnp.asarray(s) + jax.random.uniform(
        _key_query(), (n,), jnp.float32)[None, :] * NOISE_AMPLITUDE


def sync(x):
    return float(jnp.sum(x))


def run(sj, V, null_cy):
    # _NULL_CY is read at TRACE time; t1 = 32 vs 33 keeps the two
    # variants in separate jit-cache entries (t1 only sizes the small
    # repair tier — a ~1-row cost difference, noise for this probe).
    KB._NULL_CY = null_cy
    mi, nbad = KB._banded_full(sj[:V], refj, 3, 1, 192, 256, False,
                               t1=32 if not null_cy else 33)
    t0 = time.perf_counter()
    sync(mi)
    return time.perf_counter() - t0


res = {}
for kind in ("corr", "indep"):
    sj = make_data(kind)
    # warmup/compile all four (variant, size) combos
    for null_cy in (False, True):
        for V in (V1, V2):
            run(sj, V, null_cy)
    rates = {False: [], True: []}
    for rep in range(3):
        for null_cy in (False, True):
            t1s = run(sj, V1, null_cy)
            t2s = run(sj, V2, null_cy)
            rates[null_cy].append((V2 - V1) / (t2s - t1s))
    base = sorted(rates[False])[1]
    null = sorted(rates[True])[1]
    res[f"{kind}_base_voxps"] = round(base)
    res[f"{kind}_nullcy_voxps"] = round(null)
    res[f"{kind}_cy_share"] = round(1.0 - base / null, 3)
    print(kind, res, flush=True)

print(json.dumps(res))
json.dump(res, open("/tmp/ab_cy_ablation.json", "w"), indent=1)
