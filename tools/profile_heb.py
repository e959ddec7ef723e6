"""Profile HEBChart.compute_correlations on the tunneled chip.

Round-3 viewer drive measured 121 s for a first HEB serve at ~500
leaves; this script splits that into stage times (downsample, series
gather, correlate dispatch incl. first-compile, repeat) for the mean
and request-sampling paths, per measure.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from correrender_tpu.diagrams.heb import HEBChart


def make_stack(z=32, y=32, x=32, n=20, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((z, y, x, 1)).astype(np.float32)
    noise = rng.standard_normal((z, y, x, n)).astype(np.float32)
    return base + 0.5 * noise


def run(measure, method, num_samples=20):
    stack = make_stack()
    t0 = time.perf_counter()
    chart = HEBChart(
        stack, downsample_factor=4, measure=measure,
        sampling_method=method, num_samples=num_samples, max_chords=250,
    )
    t1 = time.perf_counter()
    chart.compute_correlations()
    t2 = time.perf_counter()
    chart.compute_correlations()
    t3 = time.perf_counter()
    chart.render_svg()
    t4 = time.perf_counter()
    print(
        f"{measure:32s} {method:8s} L={chart.num_leaves:4d} "
        f"init={t1-t0:6.2f}s corr1={t2-t1:7.2f}s corr2={t3-t2:7.2f}s "
        f"svg={t4-t3:5.2f}s"
    )


if __name__ == "__main__":
    import jax

    print(jax.devices())
    for measure in ("pearson", "mi_kraskov"):
        for method in ("mean", "plastic"):
            run(measure, method)
