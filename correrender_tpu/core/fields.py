"""The central volume data model.

TPU-native re-design of the reference's ``VolumeData`` hub
(src/Volume/VolumeData.{hpp,cpp}): a 5D scalar-field ensemble addressed
as ``field(name, time, member) -> (Z, Y, X)`` jnp array, with

* grid metadata (dims, spacing, normalized render AABB —
  VolumeData.cpp:322-330 semantics: the box spans ±0.25·dims/maxdim);
* a named-field registry fed by loaders *and* calculators (calculator
  outputs are virtual fields pulled lazily on access, mirroring the
  reference's cache-miss dispatch VolumeData.cpp:1202-1314);
* an LRU cache with a device-memory budget (reference FieldCache.hpp).

Unlike the reference there is no host/device cache duality — arrays
live wherever XLA puts them; ``donate``/sharding hints are attached at
the parallel layer.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from correrender_tpu.core.cache import LRUFieldCache


class FieldType(enum.Enum):
    """Mirrors the reference's FieldType (scalar / vector / color)."""

    SCALAR = "scalar"
    VECTOR = "vector"
    COLOR = "color"


@dataclasses.dataclass(frozen=True)
class GridMetadata:
    """Grid dimensions, spacing and derived boxes."""

    xs: int
    ys: int
    zs: int
    ts: int = 1
    es: int = 1
    dx: float = 1.0
    dy: float = 1.0
    dz: float = 1.0
    #: Render-only y stretch (catalog heightscale; MainApp.cpp:2001-2003
    #: applies it as a model scale — physical spacing stays dx/dy/dz).
    render_height_scale: float = 1.0

    @property
    def shape_zyx(self):
        return (self.zs, self.ys, self.xs)

    @property
    def num_voxels(self):
        return self.xs * self.ys * self.zs

    def world_box(self):
        """RENDER-space AABB [(0,0,0), ((xs-1)dx, h(ys-1)dy, (zs-1)dz)]
        (h = render_height_scale; derivative math uses dx/dy/dz raw)."""
        return (
            np.zeros(3, np.float32),
            np.array(
                [
                    (self.xs - 1) * self.dx,
                    (self.ys - 1) * self.dy * self.render_height_scale,
                    (self.zs - 1) * self.dz,
                ],
                np.float32,
            ),
        )

    def render_box(self):
        """Normalized render AABB: ±0.25 · dims / max(dims).

        Reference: VolumeData.cpp:322-330.
        """
        _, wmax = self.world_box()
        dims = np.maximum(wmax, 1e-30)
        normalized = dims / dims.max()
        return (-0.25 * normalized).astype(np.float32), (
            0.25 * normalized
        ).astype(np.float32)


class VolumeData:
    """Field registry + lazy cache over a fixed grid.

    Field providers are callables ``(time, member) -> np/jnp (Z,Y,X)``;
    loaders register file-backed providers, calculators register
    compute-backed ones. Access is uniform via :meth:`get_field` — the
    caller cannot tell (and need not care) whether a field is loaded or
    derived, exactly like the reference's virtual calculator fields.
    """

    def __init__(self, grid: GridMetadata, cache_bytes: Optional[int] = None,
                 member_stack_dtype=None):
        self.grid = grid
        # name -> (FieldType, provider, units)
        self._providers: dict[str, tuple] = {}
        self._calculators: dict[str, object] = {}
        self.cache = LRUFieldCache(max_bytes=cache_bytes)
        self._dirty_epochs: dict[str, int] = {}
        self.current_time = 0
        self.current_member = 0
        # Storage dtype of resident member stacks (the correlation hot
        # input and the HBM pressure point). bfloat16 halves residency
        # like the reference's float16 format_cast (DataSetList.hpp);
        # estimators accumulate in float32 regardless.
        self.member_stack_dtype = member_stack_dtype or jnp.float32

    # -- registry ---------------------------------------------------------

    def add_field(
        self,
        name: str,
        provider: Callable[[int, int], jnp.ndarray],
        field_type: FieldType = FieldType.SCALAR,
    ):
        if name in self._providers:
            # Re-registration replaces the provider: derived render
            # state keyed on the dirty epoch must not survive it.
            self.mark_dirty(name)
        self._providers[name] = (field_type, provider)

    def add_calculator(self, calculator):
        """Register a calculator; its output becomes a virtual field.

        Mirrors ``VolumeData::addCalculator`` (VolumeData.cpp:1046).
        """
        name = calculator.output_name
        self._calculators[name] = calculator
        calculator.bind(self)
        self.add_field(
            name,
            lambda t, e, _c=calculator: _c.compute(t, e),
            calculator.output_type,
        )

    def rename_field(self, old: str, new: str):
        """Move a registered (calculator) field to a new name.

        The reference renames a calculator's output field when a
        setting changes its display name — e.g. the correlation
        measure (ICorrelationCalculator::setCorrelationMeasureType →
        VolumeData field-name update). Cached slabs and epoch-keyed
        derived state of BOTH names are invalidated; registry order is
        preserved (``mark_dirty``'s "first field" resolution depends
        on it).
        """
        if old == new:
            return
        if old not in self._providers:
            raise KeyError(
                f"field {old!r} not found; available: {self.field_names}"
            )
        if new in self._providers:
            raise ValueError(f"field {new!r} already registered")
        self._providers = {
            (new if k == old else k): v
            for k, v in self._providers.items()
        }
        if old in self._calculators:
            self._calculators = {
                (new if k == old else k): v
                for k, v in self._calculators.items()
            }
        self.mark_dirty(old)
        self.mark_dirty(new)

    def remove_calculator(self, name: str):
        self._calculators.pop(name, None)
        self._providers.pop(name, None)
        # mark_dirty (not just cache invalidation): epoch-keyed render
        # layouts would otherwise survive a remove + re-add cycle.
        self.mark_dirty(name)

    @property
    def field_names(self):
        return list(self._providers)

    @property
    def calculators(self):
        return dict(self._calculators)

    def field_exists(self, name: str) -> bool:
        return name in self._providers

    # -- access -----------------------------------------------------------

    def get_field(self, name: str, time: int = 0, member: int = 0):
        """Lazily fetch one ``(Z, Y, X)`` field slab (cached)."""
        key = (name, time, member)
        hit = self.cache.get(key)
        if hit is not None:
            return hit
        if name not in self._providers:
            raise KeyError(
                f"field {name!r} not found; available: {self.field_names}"
            )
        ftype, provider = self._providers[name]
        arr = jnp.asarray(provider(time, member), jnp.float32)
        # Vector/color fields carry a trailing component axis.
        if arr.shape[:3] != self.grid.shape_zyx:
            raise ValueError(
                f"provider for {name!r} returned {arr.shape}, expected "
                f"leading dims {self.grid.shape_zyx}"
            )
        self.cache.put(key, arr)
        return arr

    def get_member_stack(self, name: str, time: int = 0, members=None):
        """Stack the ensemble axis last: ``(Z, Y, X, E)``.

        The canonical layout for correlation reductions (member axis is
        the fastest-varying reduction axis; see ops/). Full stacks are
        cached like field slabs (they are the correlation hot input —
        re-stacking per frame would dominate interactive use).
        """
        if members is None:
            key = (name, time, "__stack__")
            hit = self.cache.get(key)
            if hit is not None:
                return hit
            slabs = [
                self.get_field(name, time, e) for e in range(self.grid.es)
            ]
            stack = jnp.stack(slabs, axis=-1).astype(
                self.member_stack_dtype
            )
            self.cache.put(key, stack)
            return stack
        slabs = [self.get_field(name, time, e) for e in members]
        return jnp.stack(slabs, axis=-1).astype(self.member_stack_dtype)

    def get_time_stack(self, name: str, member: int = 0, times=None):
        """Stack the time axis last: ``(Z, Y, X, T)`` (time-correlation
        mode). Cached + staged to ``member_stack_dtype`` exactly like
        :meth:`get_member_stack` — it is the identical hot input when
        the correlation axis is time, and per-frame re-stacking would
        dominate interactive use the same way."""
        if times is None:
            key = (name, member, "__tstack__")
            hit = self.cache.get(key)
            if hit is not None:
                return hit
            slabs = [
                self.get_field(name, t, member)
                for t in range(self.grid.ts)
            ]
            stack = jnp.stack(slabs, axis=-1).astype(
                self.member_stack_dtype
            )
            self.cache.put(key, stack)
            return stack
        slabs = [self.get_field(name, t, member) for t in times]
        return jnp.stack(slabs, axis=-1).astype(self.member_stack_dtype)

    def get_correlation_member_count(self, ensemble_mode: bool = True) -> int:
        """cs = ensemble size or time-step count (CorrelationCalculator.hpp:89)."""
        return self.grid.es if ensemble_mode else self.grid.ts

    def get_min_max(self, name: str, time: int = 0, member: int = 0):
        """Cached per-slab min/max (reference FieldMinMaxCache)."""
        key = (name, time, member)
        mm = self.cache.get_min_max(key)
        if mm is None:
            arr = self.get_field(name, time, member)
            mm = (
                float(jnp.nanmin(arr)),
                float(jnp.nanmax(arr)),
            )
            self.cache.put_min_max(key, mm)
        return mm

    def get_global_min_max(self, name: str, ensemble_mode: bool = True,
                           time: int = 0, member: int = 0):
        """Min/max across all members (or timesteps) — used to normalize
        binned-MI inputs (CorrelationCalculator.cpp:820-845).

        In time mode the sweep runs over ``member``'s series (the
        member actually being correlated), not always member 0.
        """
        cs = self.get_correlation_member_count(ensemble_mode)
        lo, hi = np.inf, -np.inf
        for c in range(cs):
            t, e = (time, c) if ensemble_mode else (c, member)
            mn, mx = self.get_min_max(name, t, e)
            lo, hi = min(lo, mn), max(hi, mx)
        return lo, hi

    def mark_dirty(self, name: str, _visited: set | None = None):
        """Invalidate cached slabs of a (calculator) field; next access
        recomputes — the functional analogue of the reference's dirty
        flag protocol (Calculator::setDirty).

        Dirtiness PROPAGATES to calculators that read ``name`` (per
        ``Calculator.input_fields``), transitively — re-registering an
        input field must not leave a dependent correlation field
        serving values of the old data (round-3 review finding).
        """
        self.cache.invalidate_field(name)
        self._dirty_epochs[name] = self._dirty_epochs.get(name, 0) + 1
        visited = _visited if _visited is not None else {name}
        first = next(iter(self._providers), None)
        for out, calc in self._calculators.items():
            if out == name or out in visited:
                continue
            deps = calc.input_fields()
            # None deps = undeclared (conservative: always dependent);
            # a None ENTRY means "the first field".
            hit = deps is None or name in deps or (
                None in deps and name == first
            )
            if hit:
                visited.add(out)
                self.mark_dirty(out, visited)

    def dirty_epoch(self, name: str) -> int:
        """Monotonic per-field version counter, bumped by mark_dirty.

        A sound cache-invalidation token for derived render state
        (prepared shear-warp layouts etc.) — unlike id(array), which
        CPython can reuse after the LRU cache frees an entry."""
        return self._dirty_epochs.get(name, 0)
