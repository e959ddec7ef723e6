"""The flagship correlation calculator.

Replicates the capability surface of the reference's
``CorrelationCalculator`` (src/Calculators/CorrelationCalculator.{hpp,cpp}):

* correlation field modes: SINGLE (one field, reference point vs all
  voxels), SEPARATE (two fields, reference point of field A vs all
  voxels of field B), SEPARATE_SYMMETRIC (per-voxel field-vs-field)
  (CorrelationCalculator.hpp:59-64);
* ensemble vs time correlation mode, optional time-lag reference
  series (hpp:126-128);
* all seven measures, absolute-value mode, MI bins / KSG k / estimator
  index settings (state-file keys mirrored from
  CorrelationCalculator.cpp:401-760);
* request mode: correlate arbitrary (point-i, point-j) pairs — the
  service used by the HEB diagram sampler (hpp:246-258).

TPU-native design: no CPU/VULKAN/CUDA triplication and no batch-split
heuristics (hpp:271-275) — one jitted voxel-chunked program; chunk
size is derived from a memory budget instead of per-measure
magic thresholds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.calculators.base import Calculator, register_calculator_type
from correrender_tpu.ops.registry import (
    CorrelationMeasure,
    hashable_kwargs,
    is_measure_binned_mi,
    is_measure_kraskov_mi,
    measure_from_id,
)

#: Voxel-chunk memory budget for the pairwise-heavy measures.
DEFAULT_CHUNK_BUDGET_BYTES = 256 << 20


def _auto_chunk(measure: CorrelationMeasure, n: int, budget: int,
                num_bins: int = 80) -> int:
    """Pick a voxel chunk so the per-chunk working set fits the budget."""
    if measure in (CorrelationMeasure.PEARSON, CorrelationMeasure.SPEARMAN):
        per_voxel = 16 * n  # a few (V, n) f32 temporaries
    elif measure == CorrelationMeasure.KENDALL:
        per_voxel = 4 * n * min(n, 128) * 3  # (V, n, chunk) sign products
    elif is_measure_binned_mi(measure):
        # one-hots + joint at the ACTUAL bin count (a hardcoded 80
        # undercounted mi_bins=256 working sets ~5x -> HBM OOM).
        per_voxel = 4 * n * num_bins * 2 + 4 * num_bins * num_bins
    else:  # Kraskov
        per_voxel = 4 * n * n * 3  # dx, dy, dcheb
    chunk = max(budget // max(per_voxel, 1), 1)
    # Lane-align for the VPU.
    if chunk >= 256:
        chunk = (chunk // 128) * 128
    return int(chunk)


@functools.partial(
    jax.jit,
    static_argnames=(
        "measure", "num_bins", "k", "kraskov_estimator", "absolute",
        "voxel_chunk",
    ),
)
def _correlate_chunked(
    series: jnp.ndarray,  # (V, n)
    ref: jnp.ndarray,  # (n,) or (V, n)
    measure: CorrelationMeasure,
    num_bins: int,
    k: int,
    kraskov_estimator: int,
    absolute: bool,
    voxel_chunk: int,
    mi_bounds,
):
    v = series.shape[0]
    per_voxel_ref = ref.ndim == 2

    def one_chunk(args):
        chunk_series, chunk_ref = args
        return ops.correlate(
            chunk_ref,
            chunk_series,
            measure,
            num_bins=num_bins,
            k=k,
            kraskov_estimator=kraskov_estimator,
            mi_bounds=mi_bounds,
            absolute=absolute,
        )

    # Pad ONLY the remainder chunk: jnp.pad over the full (V, n)
    # series copied the whole stack — at 250³×100 that one copy
    # (6.25 GB) pushed the program past HBM (18 GB requested on a
    # 16 GB chip). The bulk reshape below is a free view of the
    # input; the tail pad copies at most one chunk.
    num_full = v // voxel_chunk
    rem = v - num_full * voxel_chunk
    parts = []
    if num_full:
        bulk = series[: num_full * voxel_chunk].reshape(
            num_full, voxel_chunk, -1
        )
        if per_voxel_ref:
            ref_bulk = ref[: num_full * voxel_chunk].reshape(
                num_full, voxel_chunk, -1
            )
            out = jax.lax.map(one_chunk, (bulk, ref_bulk))
        else:
            out = jax.lax.map(lambda s: one_chunk((s, ref)), bulk)
        parts.append(out.reshape(num_full * voxel_chunk))
    if rem:
        def pad_tail(a):
            return jnp.pad(a[num_full * voxel_chunk:],
                           ((0, voxel_chunk - rem), (0, 0)))

        tail_ref = pad_tail(ref) if per_voxel_ref else ref
        tail_out = one_chunk((pad_tail(series), tail_ref))
        parts.append(tail_out[:rem])
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def correlate_field(
    stack: jnp.ndarray,
    ref,
    measure="pearson",
    *,
    num_bins: int = 80,
    k: int = 3,
    kraskov_estimator: int = 1,
    absolute: bool = False,
    mi_bounds=None,
    chunk_budget_bytes: int = DEFAULT_CHUNK_BUDGET_BYTES,
) -> jnp.ndarray:
    """Correlate every voxel's member series against a reference.

    Args:
      stack: ``(Z, Y, X, n)`` member stack (member axis last).
      ref: either a ``(n,)`` reference series (SINGLE/SEPARATE modes) or
        a ``(Z, Y, X, n)`` second stack (SEPARATE_SYMMETRIC mode).
      measure: measure id or enum.
      mi_bounds: global (min, max) normalization bounds for binned MI;
        computed from the inputs if omitted.

    Returns:
      ``(Z, Y, X)`` float32 correlation field.
    """
    m = measure_from_id(measure)
    spatial_shape = stack.shape[:-1]
    n = stack.shape[-1]
    ref = jnp.asarray(ref)
    per_voxel_ref = ref.ndim > 1

    if is_measure_binned_mi(m) and mi_bounds is None:
        # Global normalization like the reference (global field
        # min/max, CorrelationCalculator.cpp:820-845) — computed on
        # the un-flattened stack so slabbing below can't bias it.
        qmin, qmax = jnp.nanmin(stack), jnp.nanmax(stack)
        rmin, rmax = jnp.nanmin(ref), jnp.nanmax(ref)
        mi_bounds = ((rmin, rmax), (qmin, qmax))

    # Flatten in Z-slabs past ~1 GB: an eager (Z, Y, X, n) → (V, n)
    # reshape of a large stack RETILES it — TPU pads the two minor
    # dims to (8, 128) tiles, the padding locations differ between
    # the two shapes, and the copy materializes input+output (at
    # 250³×100 that single reshape is an 18 GB program on a 16 GB
    # chip). Leading-dim slab slices keep the tiling, so only one
    # slab-sized retile is ever live.
    kwargs = dict(
        num_bins=num_bins, k=k, kraskov_estimator=kraskov_estimator,
        absolute=absolute, mi_bounds=mi_bounds,
        chunk_budget_bytes=chunk_budget_bytes,
    )
    if stack.ndim == 4 and stack.size * 4 > _FLAT_SLAB_BYTES:
        zs, ys, xs = stack.shape[:3]
        planes = max(int(_FLAT_SLAB_BYTES // (4 * n * ys * xs)), 1)

        def ref_slab(z0):
            # A per-voxel ref may arrive 4-D (SYMMETRIC mode) or
            # already flattened to (V, n) — slice the matching rows.
            if not per_voxel_ref:
                return ref
            if ref.ndim == 2:
                return ref[z0 * ys * xs : (z0 + planes) * ys * xs]
            return ref[z0 : z0 + planes].reshape(-1, n)

        outs = [
            _correlate_field_flat(
                stack[z0 : z0 + planes].reshape(-1, n),
                ref_slab(z0),
                m,
                **kwargs,
            )
            for z0 in range(0, zs, planes)
        ]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
        return out.reshape(spatial_shape)

    series = stack.reshape(-1, n)
    if per_voxel_ref:
        ref = ref.reshape(-1, n)
    return _correlate_field_flat(series, ref, m, **kwargs).reshape(
        spatial_shape
    )


#: Eager-flatten threshold / slab size (see correlate_field).
_FLAT_SLAB_BYTES = 1 << 30


def _correlate_field_flat(
    series: jnp.ndarray,
    ref: jnp.ndarray,
    m: CorrelationMeasure,
    *,
    num_bins: int,
    k: int,
    kraskov_estimator: int,
    absolute: bool,
    mi_bounds,
    chunk_budget_bytes: int,
) -> jnp.ndarray:
    """Flat-series core of :func:`correlate_field`: (V, n) → (V,)."""
    n = series.shape[-1]
    per_voxel_ref = ref.ndim > 1

    # Fast path: Kendall against a single reference series on TPU —
    # VMEM-resident pairwise sign sweep (exact equality with the XLA
    # path; ops/pallas/kendall_kernel.py).
    if (m == CorrelationMeasure.KENDALL and not per_voxel_ref
            and n <= 4000):
        # n bound: the kernel accumulates double-counted pair sums in
        # f32, exact only while n^2 stays within the 24-bit integer
        # window (same bound ops/kendall.py documents; larger n takes
        # the XLA path, which escalates to float64 pair counts).
        from correrender_tpu.ops.pallas.common import on_tpu

        if on_tpu():
            from correrender_tpu.ops.pallas.kendall_kernel import (
                kendall_pallas,
            )

            out = kendall_pallas(series, ref)
            if absolute:
                out = jnp.abs(out)
            return out

    # Fast path: Spearman on TPU — sortless pairwise ranks fused with
    # the Pearson moments (~4x the argsort+scatter XLA path at n=1000;
    # ops/pallas/spearman_kernel.py).
    if m == CorrelationMeasure.SPEARMAN and not per_voxel_ref:
        from correrender_tpu.ops.pallas.common import on_tpu

        if on_tpu():
            from correrender_tpu.ops.pallas.spearman_kernel import (
                spearman_pallas,
            )

            out = spearman_pallas(series, ref)
            if absolute:
                out = jnp.abs(out)
            return out

    # Fast path: KSG against a single reference series uses the Pallas
    # kernel on TPU (VMEM-resident pairwise distances, ~16x the XLA
    # formulation at n=1000 — ops/pallas/ksg_kernel.py; both Kraskov
    # estimators).
    if is_measure_kraskov_mi(m) and not per_voxel_ref:
        from correrender_tpu.ops.pallas.common import on_tpu

        if on_tpu():
            from correrender_tpu.ops.mi_ksg import (
                kmi_correlation_coefficient,
            )
            from correrender_tpu.ops.pallas.ksg_banded import (
                mi_ksg_banded,
            )

            # Fully traceable (fixed repair tier + lax.cond
            # escalation), so jit/shard_map callers — including the
            # fused KSG+DVR pipeline — keep the banded fast path.
            out = mi_ksg_banded(
                series, ref, k=k, estimator=kraskov_estimator
            )
            if m == CorrelationMeasure.KMI_CORRELATION_COEFFICIENT:
                out = kmi_correlation_coefficient(out)
            if absolute:
                out = jnp.abs(out)
            return out

    chunk = min(_auto_chunk(m, n, chunk_budget_bytes, num_bins),
                series.shape[0])
    return _correlate_chunked(
        series,
        ref,
        m,
        num_bins,
        k,
        kraskov_estimator,
        absolute,
        chunk,
        mi_bounds,
    )


def correlate_requests(
    stack: jnp.ndarray,
    requests_a: jnp.ndarray,
    requests_b: jnp.ndarray,
    measure="pearson",
    stack_b: jnp.ndarray | None = None,
    **kwargs,
) -> jnp.ndarray:
    """Request-buffer mode: correlate arbitrary voxel pairs.

    The reference feeds ``RequestData{xi,yi,zi,xj,yj,zj}`` buffers
    through a 1D compute dispatch (CorrelationMain.glsl, USE_REQUESTS_BUFFER);
    here requests are index arrays into the flattened grid.

    Args:
      stack: ``(Z, Y, X, n)`` member stack.
      requests_a / requests_b: ``(R, 3)`` integer voxel coords (z, y, x)
        or ``(R,)`` flat indices.
      stack_b: optional second stack for pair-field requests.

    Returns:
      ``(R,)`` correlation values.
    """
    m = measure_from_id(measure)
    ra = jnp.asarray(requests_a)
    rb = jnp.asarray(requests_b)
    key = hashable_kwargs(kwargs)
    if key is None:
        # Kwargs that cannot key the program cache (non-scalar array
        # mi_bounds): eager path, same value semantics.
        flat = stack.reshape(-1, stack.shape[-1])
        if stack_b is None:
            flat_b, shape_b = flat, stack.shape[:3]
        else:
            flat_b = stack_b.reshape(-1, stack_b.shape[-1])
            shape_b = stack_b.shape[:3]
        return ops.correlate(
            flat[_to_flat(ra, stack.shape[:3])],
            flat_b[_to_flat(rb, shape_b)],
            m,
            **kwargs,
        )
    # One cached jitted program per (measure, kwargs): the eager path
    # paid ~12 tunnel dispatches per chunk (round-3 HEB profile).
    # Flatten/gather happen inside the program, so a device-resident
    # stack passed by a chunk loop incurs no per-chunk transfers.
    prog = _requests_program(m, key)
    return prog(stack, stack if stack_b is None else stack_b, ra, rb)


def _to_flat(req, shape):
    if req.ndim == 2:
        z, y, x = req[:, 0], req[:, 1], req[:, 2]
        return (z * shape[1] + y) * shape[2] + x
    return req


@functools.lru_cache(maxsize=64)
def _requests_program(measure, kw_items):
    # jax.jit re-traces per input shape/ndim, so request ndim (flat vs
    # (R, 3) coords) needs no explicit cache key.
    kw = dict(kw_items)

    @jax.jit
    def run(stack, stack_b, ra, rb):
        n = stack.shape[-1]
        flat = stack.reshape(-1, n)
        flat_b = stack_b.reshape(-1, stack_b.shape[-1])
        ia = _to_flat(ra, stack.shape[:3])
        ib = _to_flat(rb, stack_b.shape[:3])
        return ops.correlate(flat[ia], flat_b[ib], measure, **kw)

    return run


@register_calculator_type("correlation")
class CorrelationCalculator(Calculator):
    """Reference-point correlation field as a virtual scalar field."""

    def __init__(
        self,
        field_name: str | None = None,
        field_name_ref: str | None = None,
        measure="pearson",
        reference_point=(0, 0, 0),  # (x, y, z) voxel indices
        ensemble_mode: bool = True,
        num_bins: int = 80,
        k: int = 3,
        kraskov_estimator: int = 1,
        absolute: bool = False,
        symmetric_fields: bool = False,
        use_time_lag_correlations: bool = False,
        time_lag_time_step_idx: int = 0,
        time_lag: int = 0,
        use_render_restriction: bool = False,
        render_restriction_radius: float = 0.05,
        render_restriction_metric: str = "Euclidean",
        output_name: str | None = None,
    ):
        super().__init__(output_name)
        self.field_name = field_name
        self.field_name_ref = field_name_ref or field_name
        self.measure = measure_from_id(measure)
        self.reference_point = tuple(int(c) for c in reference_point)
        self.ensemble_mode = ensemble_mode
        self.num_bins = num_bins
        self.k = k
        self.kraskov_estimator = kraskov_estimator
        self.absolute = absolute
        self.symmetric_fields = symmetric_fields
        # Reference-compatible time-lag correlations
        # (CorrelationCalculator.cpp:805-811): in ensemble mode the
        # reference series is pulled at the ABSOLUTE timestep
        # time_lag_time_step_idx, gated by use_time_lag_correlations.
        self.use_time_lag_correlations = use_time_lag_correlations
        self.time_lag_time_step_idx = int(time_lag_time_step_idx)
        # Framework extension (no reference analogue): in TIME mode,
        # shift the reference series by a RELATIVE lag and correlate
        # over the truncated overlap window (no circular wrap).
        self.time_lag = int(time_lag)
        # Spherical render restriction around the reference point
        # (ICorrelationCalculator, CorrelationCalculator.hpp:134-137);
        # consumed by Scene.render_view.
        self.use_render_restriction = use_render_restriction
        self.render_restriction_radius = render_restriction_radius
        self.render_restriction_metric = render_restriction_metric

    def default_output_name(self):
        from correrender_tpu.ops.registry import MEASURE_NAMES

        return MEASURE_NAMES[self.measure] + " Correlation"

    def set_reference_point(self, x: int, y: int, z: int):
        self.reference_point = (x, y, z)
        if self.volume_data is not None:
            self.volume_data.mark_dirty(self.output_name)

    def _stack(self, name, time, member):
        vd = self.volume_data
        if self.ensemble_mode:
            return vd.get_member_stack(name, time)
        return vd.get_time_stack(name, member)

    def compute(self, time: int, member: int):
        vd = self.volume_data
        field = self.field_name or vd.field_names[0]
        field_ref = self.field_name_ref or field
        stack = self._stack(field, time, member)
        if self.symmetric_fields:
            ref = self._stack(field_ref, time, member)
        else:
            ref_time = time
            if self.ensemble_mode and self.use_time_lag_correlations:
                # Absolute reference timestep, matching
                # CorrelationCalculator.cpp:805-811.
                ref_time = self.time_lag_time_step_idx
            ref_stack = (
                stack
                if field_ref == field and ref_time == time
                else self._stack(field_ref, ref_time, member)
            )
            x, y, z = self.reference_point
            ref = ref_stack[z, y, x]
            if self.time_lag != 0 and not self.ensemble_mode:
                # Time-mode relative lag (framework extension):
                # correlate x_t against ref_{t+lag} over the truncated
                # overlap window — no circular wrap.
                lag = self.time_lag
                ts = stack.shape[-1]
                if abs(lag) >= ts:
                    raise ValueError(
                        f"time_lag {lag} >= series length {ts}"
                    )
                if lag > 0:
                    stack = stack[..., : ts - lag]
                    ref = ref[lag:]
                else:
                    stack = stack[..., -lag:]
                    ref = ref[: ts + lag]
        mi_bounds = None
        if is_measure_binned_mi(self.measure):
            lo, hi = vd.get_global_min_max(
                field, self.ensemble_mode, time, member
            )
            # The reference series' bounds come from ITS timestep —
            # under time-lag correlation that is the absolute lag
            # timestep, not the queried one (review finding: a field
            # whose range drifts between the two mis-normalized ref).
            ref_bounds_time = time
            if (not self.symmetric_fields and self.ensemble_mode
                    and self.use_time_lag_correlations):
                ref_bounds_time = self.time_lag_time_step_idx
            lo2, hi2 = vd.get_global_min_max(
                field_ref, self.ensemble_mode, ref_bounds_time, member
            )
            mi_bounds = ((lo2, hi2), (lo, hi))
        return correlate_field(
            stack,
            ref,
            self.measure,
            num_bins=self.num_bins,
            k=self.k,
            kraskov_estimator=self.kraskov_estimator,
            absolute=self.absolute,
            mi_bounds=mi_bounds,
        )

    # -- state-file compatibility (keys from CorrelationCalculator.cpp) --

    @classmethod
    def settings_to_kwargs(cls, s: dict) -> dict:
        from correrender_tpu.ops.registry import MEASURE_NAMES

        name_to_measure = {v: k for k, v in MEASURE_NAMES.items()}
        kwargs = {}
        if "correlation_measure_type" in s:
            v = s["correlation_measure_type"]
            kwargs["measure"] = name_to_measure.get(v) or measure_from_id(v)
        if "reference_point_x" in s:
            kwargs["reference_point"] = (
                int(s.get("reference_point_x", 0)),
                int(s.get("reference_point_y", 0)),
                int(s.get("reference_point_z", 0)),
            )
        if "correlation_mode" in s:
            kwargs["ensemble_mode"] = s["correlation_mode"] == "Ensemble"
        if "mi_bins" in s:
            kwargs["num_bins"] = int(s["mi_bins"])
        if "kmi_neighbors" in s:
            kwargs["k"] = int(s["kmi_neighbors"])
        if "kraskov_estimator_index" in s:
            kwargs["kraskov_estimator"] = int(s["kraskov_estimator_index"]) + 1
        if "calculate_absolute_value" in s:
            kwargs["absolute"] = bool(s["calculate_absolute_value"])
        if "scalar_field_name" in s:
            kwargs["field_name"] = s["scalar_field_name"]
        # SEPARATE / SEPARATE_SYMMETRIC field modes
        # (CorrelationCalculator.hpp:58-64; name-based analogue of the
        # reference's scalar_field_idx_ref/query keys).
        if "correlation_field_mode" in s:
            kwargs["symmetric_fields"] = (
                s["correlation_field_mode"] == "Separate Symmetric"
            )
        if "scalar_field_name_ref" in s:
            kwargs["field_name_ref"] = s["scalar_field_name_ref"]
        if "time_lag" in s:  # framework extension: time-mode rel. lag
            kwargs["time_lag"] = int(s["time_lag"])
        if "use_time_lag_correlations" in s:
            kwargs["use_time_lag_correlations"] = bool(
                s["use_time_lag_correlations"]
            )
        if "time_lag_time_step_idx" in s:
            kwargs["time_lag_time_step_idx"] = int(
                s["time_lag_time_step_idx"]
            )
        if "restrict_rendering" in s:
            kwargs["use_render_restriction"] = bool(s["restrict_rendering"])
        if "render_restriction_radius" in s:
            kwargs["render_restriction_radius"] = float(
                s["render_restriction_radius"]
            )
        if "distance_metric" in s:
            kwargs["render_restriction_metric"] = str(s["distance_metric"])
        return kwargs

    def get_settings(self) -> dict:
        from correrender_tpu.ops.registry import MEASURE_NAMES

        restriction = (
            {
                "render_restriction_radius": self.render_restriction_radius,
                "distance_metric": self.render_restriction_metric,
            }
            if self.use_render_restriction
            else {}
        )
        return {
            "restrict_rendering": self.use_render_restriction,
            **restriction,
            "correlation_measure_type": MEASURE_NAMES[self.measure],
            "correlation_mode": "Ensemble" if self.ensemble_mode else "Time",
            "reference_point_x": self.reference_point[0],
            "reference_point_y": self.reference_point[1],
            "reference_point_z": self.reference_point[2],
            "mi_bins": self.num_bins,
            "kmi_neighbors": self.k,
            "kraskov_estimator_index": self.kraskov_estimator - 1,
            "calculate_absolute_value": self.absolute,
            "scalar_field_name": self.field_name,
            "correlation_field_mode": (
                "Separate Symmetric" if self.symmetric_fields
                else "Separate"
                if self.field_name_ref
                and self.field_name_ref != self.field_name
                else "Single"
            ),
            **(
                {"scalar_field_name_ref": self.field_name_ref}
                if self.field_name_ref else {}
            ),
            **({"time_lag": self.time_lag} if self.time_lag else {}),
            "use_time_lag_correlations": self.use_time_lag_correlations,
            "time_lag_time_step_idx": self.time_lag_time_step_idx,
        }
