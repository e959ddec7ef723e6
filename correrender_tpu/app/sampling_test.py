"""Sampling-method evaluation harness (the --sampling mode).

Reference: src/Renderers/Diagram/SamplingTest.cpp — sweeps sampling
configurations {method, numSamples, BO iterations} over block pairs,
compares each method's estimated max-correlation against the exhaustive
ground truth, and reports per-config:

* errorQuantile — 1 − rank of the found maximum among all ground-truth
  pair values (binary-search rank, SamplingTest.cpp:63-115);
* errorLinear — (trueMax − found) / (trueMax − trueMin);
* errorAbsolute — trueMax − found;
* elapsed µs per pair, averaged over numRuns;

written as a CSV (SamplingTest.cpp:351-364). Test cases cover real
data blocks and the synthetic correlated-Gaussian pairs
(Diagram/Test/MultivariateGaussian.*).
"""

from __future__ import annotations

import csv
import dataclasses
import time

import numpy as np

import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.diagrams.octree import GridRegion
from correrender_tpu.diagrams import sampling
from correrender_tpu.utils import fixtures


@dataclasses.dataclass
class SamplingTestCase:
    """One sweep configuration (SamplingTest.cpp:43-60 analogue)."""

    method: str
    num_samples: int = 100
    num_init: int = 20  # Bayesian-opt initial probes
    num_runs: int = 4
    subsample: int = 1  # mean-field subsampling factor f


DEFAULT_CASES = [
    SamplingTestCase("mean", 1),
    SamplingTestCase("random", 50),
    SamplingTestCase("random", 100),
    SamplingTestCase("halton", 100),
    SamplingTestCase("plastic", 100),
    SamplingTestCase("bayesian", 60, num_init=20, num_runs=2),
]


def _ground_truth(stack, ra, rb, measure, **kw):
    def region_series(r):
        sub = stack[
            r.z_min : r.z_max + 1, r.y_min : r.y_max + 1,
            r.x_min : r.x_max + 1,
        ]
        return sub.reshape(-1, sub.shape[-1])

    sa = region_series(ra)
    sb = region_series(rb)
    vals = np.asarray(
        ops.correlate(
            jnp.asarray(sa)[:, None, :], jnp.asarray(sb)[None, :, :],
            measure, absolute=True, **kw,
        )
    ).ravel()
    return np.sort(vals[np.isfinite(vals)])


def evaluate_case(stack, ra, rb, case, measure="pearson",
                  truth=None, **kw):
    """Run one test case on one block pair; returns metric dict.

    ``truth``: precomputed sorted ground-truth values for this
    (pair, measure) — the harness computes it ONCE per pair and
    passes it in (recomputing the exhaustive |A|x|B| sweep per CASE
    was ~6x redundant work; round-3 review).
    """
    if truth is None:
        truth = _ground_truth(stack, ra, rb, measure, **kw)
    if len(truth) == 0:
        raise ValueError(
            "sampling test: every ground-truth correlation for this "
            "block pair is non-finite (constant/masked region) — "
            "choose different blocks or a different field"
        )
    t_max, t_min = truth[-1], truth[0]
    found, micros = [], []
    for run in range(case.num_runs):
        t0 = time.perf_counter()
        extra = {}
        if case.method == "bayesian":
            extra["num_init"] = case.num_init
        if case.method == "mean":
            extra["subsample"] = case.subsample
        est = sampling.sample_block_pair_max(
            stack, ra, rb, measure,
            method=case.method,
            num_samples=case.num_samples,
            seed=run,
            **extra,
            **kw,
        )
        micros.append((time.perf_counter() - t0) * 1e6)
        found.append(est)
    found = np.asarray(found)
    ranks = np.searchsorted(truth, found, side="right")
    error_quantile = 1.0 - ranks / len(truth)
    denom = max(t_max - t_min, 1e-30)
    return {
        "method": case.method,
        "num_samples": case.num_samples,
        "subsample": case.subsample,
        "error_quantile": float(error_quantile.mean()),
        "error_linear": float(((t_max - found) / denom).mean()),
        "error_absolute": float((t_max - found).mean()),
        "time_us": float(np.mean(micros)),
    }


def run_sampling_tests(
    stack=None,
    cases=None,
    measure: str = "pearson",
    num_pairs: int = 4,
    block: int = 8,
    csv_path: str | None = None,
    synthetic: bool = False,
    seed: int = 0,
):
    """Full harness: sample block pairs, sweep cases, optional CSV.

    With ``synthetic=True`` uses correlated-Gaussian block pairs with
    known structure (TEST_CASE_SYNTH_* analogue); otherwise slices
    block pairs out of ``stack`` (TEST_CASE_DATA_*).
    """
    cases = cases or DEFAULT_CASES
    rng = np.random.default_rng(seed)
    if synthetic or stack is None:
        data = fixtures.synth_box_ensemble(
            xs=4 * block, ys=4 * block, zs=block, members=100, seed=seed
        )
        stack = np.moveaxis(data, 0, -1)
    zs, ys, xs, _ = stack.shape

    pairs = []
    for _ in range(num_pairs):
        def rand_region():
            # +1: integers() excludes the high bound, which otherwise
            # structurally excluded block origins touching the domain
            # max-edge from every sampled region (round-3 review).
            x0 = int(rng.integers(0, max(xs - block + 1, 1)))
            y0 = int(rng.integers(0, max(ys - block + 1, 1)))
            z0 = int(rng.integers(0, max(zs - block + 1, 1)))
            return GridRegion(
                x0, y0, z0,
                min(x0 + block - 1, xs - 1),
                min(y0 + block - 1, ys - 1),
                min(z0 + block - 1, zs - 1),
            )

        pairs.append((rand_region(), rand_region()))

    truths = [
        _ground_truth(stack, ra, rb, measure) for ra, rb in pairs
    ]
    rows = []
    for case in cases:
        metrics = [
            evaluate_case(stack, ra, rb, case, measure, truth=truth)
            for (ra, rb), truth in zip(pairs, truths)
        ]
        row = {
            "method": case.method,
            "num_samples": case.num_samples,
            "subsample": case.subsample,
        }
        for key in ("error_quantile", "error_linear", "error_absolute",
                    "time_us"):
            row[key] = round(
                float(np.mean([m[key] for m in metrics])), 6
            )
        rows.append(row)

    if csv_path:
        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    return rows


#: Reference test indices (SamplingTest.cpp:150-153).
TEST_CASE_SYNTH_ERROR = 0
TEST_CASE_DATA_ERROR = 1
TEST_CASE_DATA_MAX = 2
TEST_CASE_DATA_MAX_SUBSAMPLED = 3

_EQUAL_BUDGET_CASES = [
    # Equal-budget comparison: does BayOpt's model-guided probing beat
    # the quasirandom samplers at the same evaluation count?
    SamplingTestCase("random", 60),
    SamplingTestCase("halton", 60),
    SamplingTestCase("plastic", 60),
    SamplingTestCase("bayesian", 60, num_init=20, num_runs=2),
]

_SUBSAMPLED_CASES = [
    SamplingTestCase("mean", 1, subsample=f) for f in (1, 2, 4, 8)
]


def _load_stack(dataset: str, field: str | None = None):
    from correrender_tpu.io import load_volume

    vd = load_volume(dataset)
    name = field or vd.field_names[0]
    import numpy as _np

    return _np.asarray(vd.get_member_stack(name))


def run_sampling_test_index(
    test_index: int,
    dataset: str | None = None,
    field: str | None = None,
    csv_path: str | None = None,
    num_pairs: int = 4,
    block: int = 8,
    seed: int = 0,
):
    """Run one of the reference's four indexed sampling tests
    (runSamplingTests(dataSetPath, testIdx), SamplingTest.cpp:150-155).

    SYNTH_ERROR uses the correlated synthetic ensemble; the DATA_*
    cases run against a real dataset file (any registered loader).
    """
    stack = None
    synthetic = test_index == TEST_CASE_SYNTH_ERROR
    if not synthetic:
        if dataset is None:
            raise ValueError(
                f"test index {test_index} is data-driven; pass a dataset"
            )
        stack = _load_stack(dataset, field)
    if test_index in (TEST_CASE_SYNTH_ERROR, TEST_CASE_DATA_ERROR):
        cases = DEFAULT_CASES
    elif test_index == TEST_CASE_DATA_MAX:
        cases = _EQUAL_BUDGET_CASES
    elif test_index == TEST_CASE_DATA_MAX_SUBSAMPLED:
        cases = _SUBSAMPLED_CASES
    else:
        raise ValueError(f"unknown sampling test index {test_index}")
    return run_sampling_tests(
        stack=stack, cases=cases, num_pairs=num_pairs, block=block,
        csv_path=csv_path, synthetic=synthetic, seed=seed,
    )
