"""Banded Pallas KSG kernel — the fast path for single-reference MI fields.

The exact kernel (ops/pallas/ksg_kernel.py) scans the full (n, n)
pairwise Chebyshev matrix per voxel (~34 VPU ops per entry) and tops
out near the VPU roofline at ~80k voxels/s for n = 1000. This kernel
exploits one structural fact: the reference series x is SHARED by
every voxel, so all points can be put in x-sorted order once. The
k-th-NN Chebyshev distance of point i (the expensive part: 4/5 of the
exact kernel's work) is then found inside a rank band of width W
around i whenever the distance to the nearest point OUTSIDE the band
exceeds it — checkable per point (gap validity). The x-marginal count
is rank-contiguous and falls out of the same band; the y-marginal
count is done with full O(n) rows (exact, no validity needed given a
correct radius) — measured cheaper than per-voxel y-sorting on v5e,
where XLA's HBM-bound sort costs more than 4 compare passes.

Pipeline (ONE jit dispatch — the tunneled chip pays tens of ms per
call round-trip, so staging matters):

  1. kernel A (x-order, (W, npad) band in VMEM): k-th-NN radius,
     banded cx, per-point gap validity;
  2. kernel B (x-order, row-chunked like the exact kernel): exact cy;
  3. per-voxel top-k compaction of invalid positions (no global
     nonzero — measured 200 ms for a 16M-point field);
  4. repair kernel (full O(n) rows in VMEM, no gathers): recomputes
     r/cx/cy for each voxel's ≤B invalid points and emits the ψ
     correction directly — per-point repair is the reason this design
     wins; a per-voxel fallback would trigger on nearly every voxel.

Voxels with more than B invalid points escalate to a wider repair
tier, and ultimately to the exact kernel — results are therefore
exactly equal to the full-matrix path, which tests assert.

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
from correrender_tpu.ops.pallas.common import on_tpu, round_up

_BIG = 1e30
_COUNT_ROWS = 256  # j-chunk height of the full-row count kernel


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


def _select_kth(dch, k, width, axis):
    """(k+1)-th smallest per row/column incl. ties (same semantics as
    the exact kernel's extract-min-above-threshold loop)."""
    shape = list(dch.shape)
    shape[axis] = 1
    thresh = jnp.full(shape, -1.0, jnp.float32)
    cnt = jnp.zeros(shape, jnp.float32)
    for _ in range(k + 1):
        active = cnt < (k + 1)
        masked = jnp.where(dch > thresh, dch, _BIG)
        m = jnp.min(masked, axis=axis, keepdims=True)
        dup = jnp.sum((dch == m).astype(jnp.float32), axis=axis,
                      keepdims=True)
        thresh = jnp.where(active, m, thresh)
        cnt = jnp.where(active, cnt + dup, cnt)
    return thresh


def _make_kernel_a(k: int, w_band: int, npad: int, estimator: int,
                   n: int, bpad: int, vb: int):
    """Processes ``vb`` voxels per grid step (amortizes the per-step
    Mosaic overhead, which dominated at one voxel per step)."""

    def kernel(sdxt_ref, xs_ref, gaplo_ref, gaphi_ref, ys_ref,
               combo_ref, pos_ref, yband):
      # cx/rc/valid share ONE lane-concatenated output buffer: every
      # extra output buffer costs ~30 ms at field scale (per-step DMA
      # pipeline bubbles — measured 106 ms vs 57 ms for 3-vs-1).
      for b in range(vb):
        ys = ys_ref[pl.ds(b, 1), :]  # (1, npad)
        _build_band_val(ys, yband, w_band, npad)
        sdxt = sdxt_ref[:]  # (W, npad) signed x-band diffs, BIG at edges
        adx = jnp.abs(sdxt)
        dy = yband[:] - ys
        dch = jnp.maximum(adx, jnp.abs(dy))

        r = _select_kth(dch, k, w_band, axis=0)  # (1, npad) kth NN dist

        if estimator == 1:
            rcx = r - COUNT_EPSILON
            rc_out = rcx  # y-count radius too
        else:
            nbr = dch <= r
            rx = jnp.max(jnp.where(nbr, adx, -1.0), axis=0, keepdims=True)
            ry = jnp.max(jnp.where(nbr, jnp.abs(dy), -1.0), axis=0,
                         keepdims=True)
            rcx = rx + COUNT_EPSILON
            rc_out = ry + COUNT_EPSILON

        # Value-space count [x_i - rcx, x_i + rcx) within the band.
        xs = xs_ref[:]
        xband = xs + sdxt
        lo = xs - rcx
        hi = xs + rcx
        cx = jnp.sum(((xband >= lo) & (xband < hi)).astype(jnp.float32),
                     axis=0, keepdims=True)

        gap_lo = gaplo_ref[:]
        gap_hi = gaphi_ref[:]
        # Strict margin covers the selection (no out-of-band point can
        # reach or tie the kth distance) and the count radius
        # (rcx <= r + eps), incl. the estimator-2 NN-set projections.
        margin = r + COUNT_EPSILON
        valid = (gap_lo > margin) & (gap_hi > margin)

        combo_ref[pl.ds(b, 1), pl.ds(0, npad)] = cx
        combo_ref[pl.ds(b, 1), pl.ds(npad, npad)] = rc_out
        combo_ref[pl.ds(b, 1), pl.ds(2 * npad, npad)] = (
            valid.astype(jnp.float32)
        )

        # In-kernel compaction of invalid positions: prefix-sum the bad
        # flags (log-doubling rolls), then slot b holds the column
        # whose inclusive count is b+1. Replaces XLA top_k, which
        # measured 3.3 µs/voxel — a third of the whole pipeline.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
        bad = jnp.where(
            (col < n) & jnp.logical_not(valid), 1.0, 0.0
        )
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
        pos = jnp.dot(hit, colv, preferred_element_type=jnp.float32)
        has = jnp.sum(hit, axis=1, keepdims=True) > 0.0
        pos_ref[b] = jnp.where(has, pos, -1.0)  # (bpad, 1)

    return kernel


def _make_kernel_cy(npad: int, rows: int, vb: int):
    """Exact full-row y-count: cy_i = #{j : y_j in [y_i - rc_i,
    y_i + rc_i)}. Row-chunked over j like the exact kernel; correct
    for any radius, so it needs no validity of its own (a wrong radius
    from an invalid selection is fixed by the repair kernel).
    Processes ``vb`` voxels per grid step."""
    num_chunks = npad // rows

    def kernel(ys_ref, rc_ref, cy_ref):
        c = pl.program_id(1)
        for b in range(vb):
            ys = ys_ref[pl.ds(b, 1), :]  # (1, npad)
            rc = rc_ref[pl.ds(b, 1), :]
            j0 = c * rows
            yj = ys_ref[b, pl.ds(j0, rows)].reshape(rows, 1)
            lo = ys - rc  # (1, npad)
            hi = ys + rc
            part = jnp.sum(
                ((yj >= lo) & (yj < hi)).astype(jnp.float32),
                axis=0, keepdims=True,
            )

            @pl.when(c == 0)
            def _():
                cy_ref[pl.ds(b, 1), :] = jnp.zeros((1, npad), jnp.float32)

            cy_ref[pl.ds(b, 1), :] += part

    return kernel, num_chunks


def _make_kernel_repair(k: int, npad: int, bpad: int, estimator: int,
                        vb: int):
    """Full-row exact recompute of ≤bpad points per voxel, emitting
    the ψ correction per point (no gathers: each grid step reads its
    own voxels' rows; centre values are extracted with one-hot sums).
    Processes ``vb`` voxels per grid step."""

    def kernel(xs_ref, psi_ref, ys_ref, pos_ref, cx_ref, cy_ref,
               delta_ref):
      for b in range(vb):
        xs = xs_ref[:]  # (1, npad)
        row = ys_ref[pl.ds(b, 1), :]  # (1, npad)
        pos = pos_ref[b]  # (bpad, 1) f32 positions, -1 for dead slots
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (bpad, npad), 1
        ).astype(jnp.float32)
        oh = (cols == pos).astype(jnp.float32)  # (bpad, npad)
        xi = jnp.sum(oh * xs, axis=1, keepdims=True)  # (bpad, 1)
        yi = jnp.sum(oh * row, axis=1, keepdims=True)

        adx = jnp.abs(xs - xi)  # (bpad, npad)
        ady = jnp.abs(row - yi)
        dch = jnp.maximum(adx, ady)
        # Dead slots (pos = -1) see garbage; masked at the end.
        r = _select_kth(dch, k, npad, axis=1)  # (bpad, 1)

        if estimator == 1:
            rcx = r - COUNT_EPSILON
            rcy = rcx
        else:
            nbr = dch <= r
            rx = jnp.max(jnp.where(nbr, adx, -1.0), axis=1, keepdims=True)
            ry = jnp.max(jnp.where(nbr, ady, -1.0), axis=1, keepdims=True)
            rcx = rx + COUNT_EPSILON
            rcy = ry + COUNT_EPSILON

        cxn = jnp.sum(((xs >= xi - rcx) & (xs < xi + rcx)).astype(
            jnp.float32), axis=1, keepdims=True)
        cyn = jnp.sum(((row >= yi - rcy) & (row < yi + rcy)).astype(
            jnp.float32), axis=1, keepdims=True)
        cxo = jnp.sum(oh * cx_ref[pl.ds(b, 1), :], axis=1,
                      keepdims=True)
        cyo = jnp.sum(oh * cy_ref[pl.ds(b, 1), :], axis=1,
                      keepdims=True)

        if estimator == 1:
            def idx(c):
                return jnp.maximum(c, 1.0) - 1.0
        else:
            def idx(c):
                return jnp.maximum(c - 2.0, 0.0)

        # ψ(count) via one-hot MXU lookup (table[i] = ψ(i + 1)).
        psi = psi_ref[0].reshape(npad, 1)

        def look(c):
            return jnp.dot((cols == c).astype(jnp.float32), psi,
                           preferred_element_type=jnp.float32)

        delta = -(look(idx(cxn)) - look(idx(cxo))
                  + look(idx(cyn)) - look(idx(cyo)))
        delta_ref[b] = jnp.where(pos >= 0.0, delta, 0.0)  # (bpad, 1)

    return kernel


def _vox_spec(npad):
    return pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _shared_spec(shape):
    return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("k", "estimator", "w_band", "bpad", "interpret"),
)
def _banded_full(series, x, k, estimator, w_band, bpad, interpret):
    """The full banded pipeline in one dispatch. Returns (mi, max_bad):
    if max_bad > bpad the caller must retry with a wider repair tier
    (corrections beyond the top-bpad invalid points were dropped)."""
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

    # Batch voxels per grid step; big per-voxel arrays stay 2D so
    # every block is a stack of full (8, 128) tiles.
    vb = 8
    vpad = -(-v // vb) * vb
    if vpad != v:
        series_x = jnp.pad(series_x, ((0, vpad - v), (0, 0)),
                           mode="edge")

    def vspec(last):
        return pl.BlockSpec((vb, last), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    pos_spec = pl.BlockSpec((vb, bpad, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel_a = _make_kernel_a(k, w_band, npad, estimator, n, bpad, vb)
    combo, pos = pl.pallas_call(
        kernel_a,
        out_shape=[
            jax.ShapeDtypeStruct((vpad, 3 * npad), jnp.float32),
            jax.ShapeDtypeStruct((vpad, bpad, 1), jnp.float32),
        ],
        grid=(vpad // vb,),
        in_specs=[
            _shared_spec((w_band, npad)),
            _shared_spec((1, npad)),
            _shared_spec((1, npad)),
            _shared_spec((1, npad)),
            vspec(npad),
        ],
        out_specs=[vspec(3 * npad), pos_spec],
        scratch_shapes=[pltpu.VMEM((w_band, npad), jnp.float32)],
        interpret=interpret,
    )(sdxt, xs.reshape(1, npad), gap_lo, gap_hi, series_x)
    cx = combo[:, :npad]
    rc = combo[:, npad:2 * npad]
    valid = combo[:, 2 * npad:]

    # Chunk height must DIVIDE npad (npad is always a multiple of 128).
    rows = _COUNT_ROWS if npad % _COUNT_ROWS == 0 else 128
    kernel_cy, num_chunks = _make_kernel_cy(npad, rows, vb)
    vox2 = pl.BlockSpec((vb, npad), lambda i, c: (i, 0),
                        memory_space=pltpu.VMEM)
    (cy,) = pl.pallas_call(
        kernel_cy,
        out_shape=[jax.ShapeDtypeStruct((vpad, npad), jnp.float32)],
        grid=(vpad // vb, num_chunks),
        in_specs=[vox2, vox2],
        out_specs=[vox2],
        interpret=interpret,
    )(series_x, rc)

    cx2, cy2, valid2 = cx[:v], cy[:v], valid[:v]

    # Raw (unclamped) MI from the (possibly partially wrong) counts.
    mask = (jnp.arange(npad) < n).reshape(1, npad)
    psix, psiy = _psi_pair(cx2, cy2, estimator)
    const = jss.digamma(float(k)) + jss.digamma(float(n))
    if estimator == 2:
        const = const - 1.0 / k
    a = jnp.sum(jnp.where(mask, psix, 0.0), axis=-1) / n
    b = jnp.sum(jnp.where(mask, psiy, 0.0), axis=-1) / n
    mi_raw = (-(a + b) + const).astype(jnp.float32)

    # Invalid positions were compacted in-kernel; count for the tier
    # check.
    bad = jnp.where(mask, valid2 <= 0.0, False)
    n_bad = jnp.sum(bad, axis=-1)  # (v,)

    import scipy.special

    psi_table = jnp.asarray(
        scipy.special.digamma(np.arange(1, npad + 1)).astype(np.float32)
    ).reshape(1, npad)

    kernel_r = _make_kernel_repair(k, npad, bpad, estimator, vb)
    (delta,) = pl.pallas_call(
        kernel_r,
        out_shape=[jax.ShapeDtypeStruct((vpad, bpad, 1), jnp.float32)],
        grid=(vpad // vb,),
        in_specs=[
            _shared_spec((1, npad)),
            _shared_spec((1, npad)),
            vspec(npad),
            pos_spec,
            vspec(npad),
            vspec(npad),
        ],
        out_specs=[pos_spec],
        interpret=interpret,
    )(xs.reshape(1, npad), psi_table, series_x, pos, cx, cy)

    mi = jnp.maximum(
        mi_raw + jnp.sum(delta[:v, :, 0], axis=-1) / n, 0.0
    )
    return mi, jnp.max(n_bad)


def _psi_pair(cx, cy, estimator):
    import jax.scipy.special as jss

    if estimator == 1:
        return (jss.digamma(jnp.maximum(cx, 1.0)),
                jss.digamma(jnp.maximum(cy, 1.0)))
    return (jss.digamma(jnp.maximum(cx - 1.0, 1.0)),
            jss.digamma(jnp.maximum(cy - 1.0, 1.0)))


def mi_ksg_banded(
    stack: jnp.ndarray,
    ref: jnp.ndarray,
    k: int = 3,
    estimator: int = 1,
    use_noise: bool = True,
    w_band: int = 256,
    interpret: bool | None = None,
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
      w_band: rank-band width (256 measured fastest on v5e at
        n = 1000: ~2% invalid rate).
      interpret: force interpreter mode (auto: off-TPU only).

    Returns:
      ``(...)`` float32 MI field.
    """
    if estimator not in (1, 2):
        raise ValueError(f"estimator must be 1 or 2, got {estimator}")
    import jax.core

    if isinstance(stack, jax.core.Tracer):
        # Under an outer trace the host-side repair-tier sync below is
        # unavailable; delegate to the fully-traceable exact kernel.
        from correrender_tpu.ops.pallas.ksg_kernel import mi_ksg_pallas

        return mi_ksg_pallas(stack, ref, k=k, estimator=estimator,
                             use_noise=use_noise, interpret=interpret)
    if interpret is None:
        interpret = not on_tpu()
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

    # Repair tiers: widen the per-voxel repair capacity if some voxel
    # has more invalid points than the tier holds (one scalar sync per
    # tier); degenerate data falls back to the exact kernel.
    for bpad in (64, 256):
        if bpad >= npad:
            break
        mi, max_bad = _banded_full(series, x, k, estimator, w_band, bpad,
                                   interpret)
        if int(max_bad) <= bpad:
            return mi.reshape(lead)

    from correrender_tpu.ops.pallas.ksg_kernel import _mi_ksg_flat

    return _mi_ksg_flat(series, x, k, estimator, interpret).reshape(lead)
