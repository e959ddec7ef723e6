"""Banded Pallas KSG kernel — the fast path for single-reference MI fields.

The exact kernel (ops/pallas/ksg_kernel.py) scans the full (n, n)
pairwise Chebyshev matrix per voxel (~34 VPU ops per entry) and tops
out near the VPU roofline at ~80k voxels/s for n = 1000. This kernel
exploits one structural fact: the reference series x is SHARED by
every voxel, so all points can be put in x-sorted order once. The
k-th-NN Chebyshev distance of point i (the expensive part of the
exact kernel's work) is then found inside a rank band of width W
around i whenever the distance to the nearest point OUTSIDE the band
exceeds it — checkable per point (gap validity). The x-marginal count
is rank-contiguous and falls out of the same band; the y-marginal
count uses exact full O(n) rows (measured cheaper than per-voxel
sorting on v5e, where XLA's HBM-bound sort costs more than 4 compare
passes).

EVERYTHING runs in ONE fused kernel per voxel batch — selection,
both counts, ψ evaluation (branch-free shifted-asymptotic digamma),
in-kernel prefix-sum compaction of invalid points, and their exact
full-row repair — emitting just two scalars per voxel (ψ-sum and
invalid count). Measured Mosaic behaviors drove this shape: every
extra output buffer costs ~30 ms per 16k voxels in DMA pipeline
bubbles, (vb, 1, npad) singleton-middle blocks force 1-sublane
stores, and separate pallas calls re-stream every (V, npad)
intermediate through HBM.

Per-point repair (not per-voxel fallback) is the reason the banding
wins: ~2% of points fail the gap check on worst-case independent
data, so a per-voxel fallback would trigger on nearly every voxel,
while repairs cost M·n with M ≪ V·n. Voxels with more than ``bpad``
invalid points (degenerate/mass-tied data) escalate to the exact
full-matrix kernel through a traceable ``lax.cond`` — no host sync
anywhere, so the whole path runs inside jit/shard_map programs —
and results are exactly equal to the full-matrix path, which tests
assert.

The k-th-NN selection uses sorting networks (sort-8 over band rows,
then a tournament of bitonic half-cleaner merges that tracks the
k+1 smallest) instead of k+1 masked extract-min sweeps — ~3x fewer
band passes for the dominant kernel stage at k = 3.

Reference semantics replicated: k-th order statistic including ties,
value-space count boundaries [v − r, v + r), estimator-2 per-axis
radii over the (k+1)-NN set (src/Calculators/MutualInformation.cpp:
399-509); same deterministic tie-break noise keys as ops/mi_ksg.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from correrender_tpu.ops.mi_ksg import (
    COUNT_EPSILON,
    NOISE_AMPLITUDE,
    _key_query,
    _key_ref,
)
from correrender_tpu.ops.pallas.common import (
    digamma_vpu as _digamma,
    on_tpu,
    round_up,
    select_kth,
)

_BIG = 1e30
_COUNT_ROWS = 256  # j-chunk height of the full-row count pass
#: Test-only ablation (tools/ab_cy_ablation.py): trace the kernel with
#: the cy full-row count stage nulled to measure that stage's share of
#: kernel time. Results are garbage when set — never enable outside
#: the ablation probe.
_NULL_CY = False


def _build_band_val(base, scratch, w_band, npad):
    """Fill scratch[w, i] = base[0, i + w - W/2] via log-doubling rolls.

    Rows 0..7 are built with single rolls; each following step rolls
    the existing block by its own height along the lane axis (row
    w + h equals row w shifted by -h). Wrapped entries are masked by
    callers."""
    first = min(8, w_band)
    for w in range(first):
        # pltpu.roll requires non-negative shifts; reduce mod npad.
        scratch[pl.ds(w, 1), :] = pltpu.roll(
            base, shift=(w_band // 2 - w) % npad, axis=1
        )
    h = first
    while h < w_band:
        step = min(h, w_band - h)  # final step may be partial
        blk = scratch[pl.ds(0, step), :]
        scratch[pl.ds(h, step), :] = pltpu.roll(
            blk, shift=(npad - h) % npad, axis=1
        )
        h += step


# Tie-aware selection shared with the exact kernel (common.select_kth).
_select_kth = select_kth


# Batcher odd-even merge sort network for 8 inputs (19 comparators).
_SORT8_PAIRS = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6),
    (0, 4), (1, 5), (2, 6), (3, 7),
    (2, 4), (3, 5),
    (1, 2), (3, 4), (5, 6),
)


def _bitonic_merge_pairs(m):
    """Comparator pairs sorting a bitonic sequence of length m (pow2)."""
    pairs = []
    half = m // 2
    while half >= 1:
        for base in range(0, m, 2 * half):
            for i in range(base, base + half):
                pairs.append((i, i + half))
        half //= 2
    return pairs


def _select_kth_network(dch, k, w_band, npad):
    """(k+1)-th smallest per COLUMN of the (W, npad) band via sorting
    networks — one sort-8 pass over eight CONTIGUOUS row slabs
    followed by a tournament of sorted-list merges, replacing the k+1
    extract-min rounds (each a full masked-min + tie-count sweep of
    the band). Multiset order statistics fall out of the sort, so tie
    counting disappears.

    Layout note (measured): the groups a column is partitioned into
    are arbitrary, so the sort dimension is taken ACROSS eight
    contiguous (H, npad) slabs — every slice is sublane-tile aligned.
    A first version grouped eight *consecutive* rows (`v[:, i, :]` on
    a (W/8, 8, npad) reshape); the stride-8 sublane gathers it forced
    made it 12% slower than the extract-min loop it replaced.

    Tournament step: for sorted ascending lists a, b of length m,
    c_i = min(a_i, b_{m-1-i}) is the bitonic half-cleaner of a‖rev(b)
    — it holds exactly the m smallest of the union — and one bitonic
    merge network re-sorts it. Requires k+1 <= 8 and W/8 a power of
    two (callers fall back to :func:`_select_kth` otherwise).
    """
    h = w_band // 8
    slabs = [dch[pl_ds_static(i * h, h)] for i in range(8)]
    for a, b in _SORT8_PAIRS:
        lo = jnp.minimum(slabs[a], slabs[b])
        hi = jnp.maximum(slabs[a], slabs[b])
        slabs[a], slabs[b] = lo, hi
    m2 = 1 << (k + 1 - 1).bit_length()  # tracked list length (pow2)
    lists = slabs[:m2]
    merge_pairs = _bitonic_merge_pairs(m2)
    while h > 1:
        h2 = h // 2
        a = [l[:h2] for l in lists]
        b = [l[h2:] for l in lists]
        lists = [jnp.minimum(a[i], b[m2 - 1 - i]) for i in range(m2)]
        for i, j in merge_pairs:
            lo = jnp.minimum(lists[i], lists[j])
            hi = jnp.maximum(lists[i], lists[j])
            lists[i], lists[j] = lo, hi
        h = h2
    return lists[k]  # (1, npad)


def pl_ds_static(start, size):
    return slice(start, start + size)


def _select_kth_plain(dch, k):
    """Tie-oblivious selection: k+1 plain distinct-extract-min rounds
    plus ONE count pass that flags columns where ties made the plain
    answer differ from the multiset order statistic.

    The tie-aware loop (:func:`_select_kth`) spends half its band
    passes counting duplicates that almost never exist once the
    deterministic tie-break noise is added; here tied columns are
    simply flagged and handed to the exact per-point repair — the same
    mechanism that already fixes band-invalid points — so the result
    stays exactly equal to the full-matrix path. Measured: selection
    is ~53% of the fused kernel, and this halves it.

    Returns ``(r, tie_ok)``: r is exact where ``tie_ok`` (and an upper
    bound elsewhere, so the ``margin`` validity test stays sound).
    """
    shape = list(dch.shape)
    shape[0] = 1
    thresh = jnp.full(shape, -1.0, jnp.float32)
    for _ in range(k + 1):
        masked = jnp.where(dch > thresh, dch, _BIG)
        thresh = jnp.min(masked, axis=0, keepdims=True)
    c = jnp.sum((dch <= thresh).astype(jnp.float32), axis=0,
                keepdims=True)
    return thresh, c == float(k + 1)


def _select_kth_bf16(dch, k):
    """Exact k-th selection run mostly at bf16 width. INTERPRET-ONLY —
    retired from the device path (measured negative result).

    On-device outcome (2026-08-18): Mosaic on v5e REFUSES packed bf16
    vector comparisons — compiling this kernel fails with "Target does
    not support this comparison" on ``arith.cmpf`` over
    ``vector<8x128x2xbf16>`` — so the two-lanes-per-register premise
    that motivated the variant does not exist on this target, and no
    compare-free reformulation of masked extract-min survives (every
    variant needs an exclude-below-threshold mask). Kept as the
    measured record so the idea is not re-tried; `mi_ksg_banded`
    raises a clear error if sel_bf16 is requested on real hardware.

    The structural idea (ROUND3 notes: "bf16 distance prefilter with
    exact refinement"): the extract-min rounds — the serial half of the
    kernel — run on a bf16 COPY of the band, which packs two lanes per
    register, then ONE f32 pass recovers the exact multiset order
    statistic. Correctness rests on round-to-nearest being monotone:
    ``x < y ⟹ bf16(x) ≤ bf16(y)``, so the set
    ``S = {j : bf16(dch_j) ≤ r_b}`` is downward-closed in f32 order.
    When ``|S| == k+1`` (no bf16-granularity collision at the
    threshold), S *is* the exact (k+1)-smallest set and
    ``r = max_{j∈S} dch_j`` is the exact f32 k-th order statistic —
    the same value the f32 loop returns. Columns where bf16 rounding
    collides (``|S| ≠ k+1``, which also covers genuine f32 ties) are
    flagged, exactly like :func:`_select_kth_plain` flags ties, and the
    existing per-point repair recomputes them from full f32 rows — so
    results stay exactly equal to the full-matrix path; the cast only
    moves speed and the repair rate (collisions at bf16's 2⁻⁸ relative
    granularity: ~1-2% of points at n=1000 with tie-break noise).

    Returns ``(r, sel_ok)`` with r exact where ``sel_ok`` and an upper
    bound elsewhere (S always contains the (k+1)-smallest, so the max
    over S only overshoots — the ``margin`` validity test stays sound).
    """
    shape = list(dch.shape)
    shape[0] = 1
    dchb = dch.astype(jnp.bfloat16)
    big_b = jnp.bfloat16(_BIG)
    thresh = jnp.full(shape, -1.0, jnp.bfloat16)
    for _ in range(k + 1):
        masked = jnp.where(dchb > thresh, dchb, big_b)
        thresh = jnp.min(masked, axis=0, keepdims=True)
    sel = dchb <= thresh
    c = jnp.sum(sel.astype(jnp.float32), axis=0, keepdims=True)
    r = jnp.max(jnp.where(sel, dch, -1.0), axis=0, keepdims=True)
    return r, c == float(k + 1)


def _band_select(dch, k, w_band, npad, sel_bf16=False):
    """(r, tie_ok) for the in-band selection.

    A sorting-network variant (sort-8 over row slabs + bitonic
    half-cleaner merge tournament, :func:`_select_kth_network`) was
    measured AT PARITY with the extract-min loop on v5e — ~3x fewer
    nominal row-ops, eaten by materialized intermediates — so the
    cheaper tie-flagging loop is the production path; the network is
    kept for k+1 > 8 experiments and as the measured record.
    ``sel_bf16`` switches to the half-width variant
    (:func:`_select_kth_bf16`) — exact via f32 refinement.
    """
    if sel_bf16:
        return _select_kth_bf16(dch, k)
    return _select_kth_plain(dch, k)


def _psi_of_counts(cx, cy, estimator):
    """Est-adjusted ψ terms (same index conventions as the exact
    kernel / XLA path)."""
    if estimator == 1:
        return (_digamma(jnp.maximum(cx, 1.0)),
                _digamma(jnp.maximum(cy, 1.0)))
    return (_digamma(jnp.maximum(cx - 1.0, 1.0)),
            _digamma(jnp.maximum(cy - 1.0, 1.0)))


def _make_kernel_fused(k: int, w_band: int, npad: int, estimator: int,
                       n: int, bpad: int, vb: int, rows: int,
                       t1: int, sel_bf16: bool):
    def kernel(sdxt_ref, xs_ref, gaplo_ref, gaphi_ref, ys_ref,
               out_ref, yband):
      # Voxel-independent loads/derivations (CSE'd across the b loop).
      sdxt = sdxt_ref[:]  # (W, npad) signed x-band diffs, BIG at edges
      adx = jnp.abs(sdxt)
      xs = xs_ref[:]
      xband = xs + sdxt
      col = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
      real = col < n
      lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
      for b in range(vb):
        ys = ys_ref[pl.ds(b, 1), :]  # (1, npad)
        _build_band_val(ys, yband, w_band, npad)
        dy = yband[:] - ys
        dch = jnp.maximum(adx, jnp.abs(dy))

        # r: (1, npad) kth NN dist — exact where tie_ok, an upper
        # bound on tied columns (which repair below recomputes).
        r, tie_ok = _band_select(dch, k, w_band, npad, sel_bf16)

        if estimator == 1:
            rcx = r - COUNT_EPSILON
            rcy = rcx
        else:
            nbr = dch <= r
            rx = jnp.max(jnp.where(nbr, adx, -1.0), axis=0, keepdims=True)
            ry = jnp.max(jnp.where(nbr, jnp.abs(dy), -1.0), axis=0,
                         keepdims=True)
            rcx = rx + COUNT_EPSILON
            rcy = ry + COUNT_EPSILON

        # Value-space x-count [x_i − rcx, x_i + rcx) within the band.
        cx = jnp.sum(
            ((xband >= xs - rcx) & (xband < xs + rcx)).astype(jnp.float32),
            axis=0, keepdims=True,
        )

        # Exact full-row y-count: cy_i = #{j : y_j ∈ [y_i − rcy_i,
        # y_i + rcy_i)} — correct for ANY radius (wrong radii from
        # invalid selections are fixed by the repair stage).
        lo_y = ys - rcy
        hi_y = ys + rcy
        if _NULL_CY:  # rate-only ablation — see flag docstring
            cy = cx
        else:
            cy = jnp.zeros((1, npad), jnp.float32)
            for j0 in range(0, npad, rows):
                yj = ys_ref[b, pl.ds(j0, rows)].reshape(rows, 1)
                cy = cy + jnp.sum(
                    ((yj >= lo_y) & (yj < hi_y)).astype(jnp.float32),
                    axis=0, keepdims=True,
                )

        # Strict margin covers the selection (no out-of-band point can
        # reach or tie the kth distance) and the count radius
        # (rcx ≤ r + eps, incl. the estimator-2 NN-set projections).
        # Tied columns carry an upper-bound r, so the margin test is
        # conservative there; tie_ok routes them to repair regardless.
        margin = r + COUNT_EPSILON
        valid = (gaplo_ref[:] > margin) & (gaphi_ref[:] > margin) & tie_ok

        psix, psiy = _psi_of_counts(cx, cy, estimator)
        psi_sum = jnp.sum(jnp.where(real, psix + psiy, 0.0))

        bad = jnp.where(real & jnp.logical_not(valid), 1.0, 0.0)
        n_bad = jnp.sum(bad)

        # -- compaction: prefix-sum the bad flags; slot q holds the
        # column whose inclusive count is q+1. Kept OUTSIDE the repair
        # branches (the validated round-2 shape): the per-voxel cost
        # is ~10 (1, npad) roll passes — noise next to the (W, npad)
        # band stages — and hoisting lets both repair tiers share one
        # compaction.
        s = bad
        d = 1
        while d < npad:
            sh = pltpu.roll(s, shift=d, axis=1)
            s = s + jnp.where(col >= d, sh, 0.0)
            d *= 2
        rowb = jax.lax.broadcasted_iota(
            jnp.int32, (bpad, npad), 0
        ).astype(jnp.float32)
        hit = ((s == rowb + 1.0) & (bad > 0.0)).astype(jnp.float32)
        colv = jax.lax.broadcasted_iota(
            jnp.int32, (npad, 1), 0
        ).astype(jnp.float32)
        # precision=HIGHEST is load-bearing: Mosaic lowers a default
        # f32 matmul as ONE bf16 pass on v5e, which rounds column
        # indices ≥ 256 to bf16 ulps (267→268, 537→536, …) — the
        # repair then fixes the WRONG columns. Measured on-device
        # (interpret mode can't see it); with HIGHEST the extracted
        # indices are exact through npad=1024 (isolation probe +
        # full-kernel agreement with interpret to 2e-6).
        pos_all = jax.lax.dot_general(
            hit, colv, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        has = jnp.sum(hit, axis=1, keepdims=True) > 0.0
        pos_all = jnp.where(has, pos_all, -1.0)  # (bpad, 1), -1 dead

        @pl.when(n_bad == 0.0)
        def _():
            out_ref[pl.ds(b, 1), :] = jnp.where(lane == 0, psi_sum, 0.0)

        # -- exact per-point repair of the invalid points -------------
        # Two fixed tiers (t1 rows, then bpad rows): the dense repair
        # block costs tier·npad regardless of the actual invalid
        # count, and measured counts are bimodal — uniform/correlated
        # voxels have 0-4 invalid points while independent-Gaussian
        # voxels run ~10-25 — so a right-sized small tier handles the
        # common case at ~1/8 the cost and only degenerate voxels
        # (mass ties) escalate to the big tier.
        def emit_repair(tier, ys=ys, cx=cx, cy=cy, psi_sum=psi_sum,
                        bad=bad, n_bad=n_bad, b=b, pos_all=pos_all):
          pos = pos_all[pl_ds_static(0, tier)]  # (tier, 1)

          cols_b = jax.lax.broadcasted_iota(
              jnp.int32, (tier, npad), 1
          ).astype(jnp.float32)
          oh = (cols_b == pos).astype(jnp.float32)  # (tier, npad)
          xi = jnp.sum(oh * xs, axis=1, keepdims=True)  # (tier, 1)
          yi = jnp.sum(oh * ys, axis=1, keepdims=True)
          adx_r = jnp.abs(xs - xi)  # (tier, npad) full rows
          ady_r = jnp.abs(ys - yi)
          dch_r = jnp.maximum(adx_r, ady_r)
          r_r = _select_kth(dch_r, k, axis=1)  # (tier, 1)
          if estimator == 1:
              rcx_r = r_r - COUNT_EPSILON
              rcy_r = rcx_r
          else:
              nbr_r = dch_r <= r_r
              rx_r = jnp.max(jnp.where(nbr_r, adx_r, -1.0), axis=1,
                             keepdims=True)
              ry_r = jnp.max(jnp.where(nbr_r, ady_r, -1.0), axis=1,
                             keepdims=True)
              rcx_r = rx_r + COUNT_EPSILON
              rcy_r = ry_r + COUNT_EPSILON
          cxn = jnp.sum(((xs >= xi - rcx_r) & (xs < xi + rcx_r)).astype(
              jnp.float32), axis=1, keepdims=True)
          cyn = jnp.sum(((ys >= yi - rcy_r) & (ys < yi + rcy_r)).astype(
              jnp.float32), axis=1, keepdims=True)
          cxo = jnp.sum(oh * cx, axis=1, keepdims=True)
          cyo = jnp.sum(oh * cy, axis=1, keepdims=True)
          pxn, pyn = _psi_of_counts(cxn, cyn, estimator)
          pxo, pyo = _psi_of_counts(cxo, cyo, estimator)
          delta = (pxn - pxo) + (pyn - pyo)
          delta = jnp.where(pos >= 0.0, delta, 0.0)
          total = psi_sum + jnp.sum(delta)
          out_ref[pl.ds(b, 1), :] = (
              jnp.where(lane == 0, total, 0.0)
              + jnp.where(lane == 1, n_bad, 0.0)
          )

        if t1 < bpad:
            @pl.when((n_bad > 0.0) & (n_bad <= float(t1)))
            def _():
                emit_repair(t1)

            @pl.when(n_bad > float(t1))
            def _():
                emit_repair(bpad)
        else:
            @pl.when(n_bad > 0.0)
            def _():
                emit_repair(bpad)

    return kernel


def _shared_spec(shape):
    return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("k", "estimator", "w_band", "bpad", "interpret",
                     "t1", "sel_bf16"),
)
def _banded_full(series, x, k, estimator, w_band, bpad, interpret,
                 t1=32, sel_bf16=False):
    """The full fused pipeline. Returns (mi, max_bad): if
    max_bad > bpad some voxel overflowed the repair tier (corrections
    beyond the first bpad invalid points were dropped) and the caller
    must escalate to the exact kernel."""
    import jax.scipy.special as jss

    v, n = series.shape
    npad = round_up(n, 128)
    pad_n = npad - n

    perm = jnp.argsort(x)
    xs = jnp.pad(x[perm].astype(jnp.float32), (0, pad_n),
                 constant_values=_BIG)
    series_x = jnp.pad(
        series[:, perm].astype(jnp.float32), ((0, 0), (0, pad_n)),
        constant_values=_BIG,
    )

    # Shared band geometry: sdxT[w, i] = xs[j] - xs[i], j = i + w - W/2
    # (BIG at out-of-range j), plus the nearest-excluded gaps.
    ii = np.arange(npad)
    ww = np.arange(w_band)
    jj = ii[None, :] + ww[:, None] - w_band // 2  # (W, npad)
    in_range = jnp.asarray((jj >= 0) & (jj < npad))
    jj_c = np.clip(jj, 0, npad - 1)
    sdxt = jnp.where(in_range, xs[jj_c] - xs[None, :], _BIG).astype(
        jnp.float32
    )
    lo_j = ii - w_band // 2 - 1
    hi_j = ii + w_band // 2
    gap_lo = jnp.where(
        jnp.asarray(lo_j >= 0), xs - xs[np.clip(lo_j, 0, npad - 1)], _BIG
    ).reshape(1, npad)
    gap_hi = jnp.where(
        jnp.asarray(hi_j < npad), xs[np.clip(hi_j, 0, npad - 1)] - xs, _BIG
    ).reshape(1, npad)

    vb = 8
    vpad = -(-v // vb) * vb
    if vpad != v:
        series_x = jnp.pad(series_x, ((0, vpad - v), (0, 0)),
                           mode="edge")
    rows = _COUNT_ROWS if npad % _COUNT_ROWS == 0 else 128

    # Small tier floor of 8 keeps the (tier, npad) repair block at
    # one full sublane tile — below that Mosaic pads the block
    # anyway, so tiers < 8 save nothing.
    kernel = _make_kernel_fused(k, w_band, npad, estimator, n, bpad, vb,
                                rows, int(min(max(t1, 8), bpad)),
                                sel_bf16)
    (out,) = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((vpad, 128), jnp.float32)],
        grid=(vpad // vb,),
        in_specs=[
            _shared_spec((w_band, npad)),
            _shared_spec((1, npad)),
            _shared_spec((1, npad)),
            _shared_spec((1, npad)),
            pl.BlockSpec((vb, npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((vb, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((w_band, npad), jnp.float32)],
        interpret=interpret,
    )(sdxt, xs.reshape(1, npad), gap_lo, gap_hi, series_x)

    psi_sum = out[:v, 0]
    n_bad = out[:v, 1]
    const = jss.digamma(float(k)) + jss.digamma(float(n))
    if estimator == 2:
        const = const - 1.0 / k
    mi = jnp.maximum(-psi_sum / n + const, 0.0).astype(jnp.float32)
    return mi, n_bad


def mi_ksg_banded(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    k: int = 3,
    estimator: int = 1,
    use_noise: bool = True,
    w_band: int = 192,
    interpret: bool | None = None,
    sel_bf16: bool = False,
) -> jnp.ndarray:
    """KSG MI field via the banded kernel with exact per-point repair.

    Exactly equal to mi_ksg_pallas / the XLA path: band-invalid points
    (reported by per-point gap checks) are recomputed with full
    distance rows, so the band width only affects speed.

    Args:
      stack: ``(..., n)`` member series.
      ref: ``(n,)`` reference series.
      k: neighbour count.
      estimator: Kraskov estimator 1 or 2.
      use_noise: add the deterministic tie-breaking noise.
      w_band: rank-band width. 192 measured best-or-equal on v5e at
        n = 1000 across correlated AND independent fields (133k/132k
        vox/s marginal vs 132k/128k at W=256, 138k/83k at W=128 —
        narrow bands push the invalid rate past the small repair
        tier on independent data). Band width only affects speed,
        never results.
      interpret: force interpreter mode (auto: off-TPU only).
      sel_bf16: INTERPRET-ONLY (negative result, kept as the measured
        record): run the extract-min selection rounds on a bf16 copy
        of the band with an exact f32 refinement (see
        :func:`_select_kth_bf16`). Exactness is unchanged, but the
        on-device A/B (2026-08-18) found Mosaic on v5e cannot lower
        packed bf16 vector comparisons at all (``arith.cmpf`` on
        ``8x128x2xbf16``: "Target does not support this comparison"),
        so the two-lanes-per-register premise is dead on this target
        and the flag raises on a real TPU instead of crashing inside
        Mosaic.

    Returns:
      ``(...)`` float32 MI field.
    """
    if estimator not in (1, 2):
        raise ValueError(f"estimator must be 1 or 2, got {estimator}")
    if interpret is None:
        interpret = not on_tpu()
    if sel_bf16 and not interpret:
        raise ValueError(
            "sel_bf16 is interpret-only: Mosaic on TPU v5e cannot "
            "lower packed bf16 vector comparisons (arith.cmpf on "
            "8x128x2xbf16 — measured on-device 2026-08-18, see "
            "docs/ROUND3.md), so the bf16-selection variant cannot "
            "compile for real hardware."
        )
    n = stack.shape[-1]
    lead = stack.shape[:-1]
    npad = round_up(n, 128)
    w_band = int(min(w_band, npad))
    if k + 1 > w_band // 2:
        raise ValueError(f"k={k} too large for band width {w_band}")
    series = stack.reshape(-1, n)
    x = ref
    if use_noise:
        nx = jax.random.uniform(_key_ref(), (n,), jnp.float32)
        ny = jax.random.uniform(_key_query(), (n,), jnp.float32)
        x = x + nx * NOISE_AMPLITUDE
        series = series + ny[None, :] * NOISE_AMPLITUDE

    from correrender_tpu.ops.pallas.ksg_kernel import _mi_ksg_flat

    # One fixed always-big repair tier (no host sync — the whole path
    # traces under jit/shard_map, so fused programs keep the fast
    # kernel). Voxels with more invalid points than the tier holds
    # (degenerate/mass-tied data) escalate to the exact full-matrix
    # kernel through a traceable lax.cond — only the taken branch
    # executes at runtime, so clean fields never pay for it.
    bpad = int(min(256, npad))
    # Small repair tier: bf16 selection flags ~2-4% of points per voxel
    # on top of the gap failures (numpy sim at n=1000/W=192: invalid
    # p50 rises 23→38 on independent data, 92% of voxels past 32), so
    # the bf16 path right-sizes to 64 — t1 only trades repair cost,
    # never values.
    t1 = 64 if sel_bf16 else 32
    mi, n_bad = _banded_full(series, x, k, estimator, w_band, bpad,
                             interpret, t1=t1, sel_bf16=sel_bf16)
    mi = jax.lax.cond(
        jnp.max(n_bad) <= bpad,
        lambda s, xx, banded: banded,
        lambda s, xx, banded: _mi_ksg_flat(s, xx, k, estimator,
                                           interpret),
        series, x, mi,
    )
    return mi.reshape(lead)
