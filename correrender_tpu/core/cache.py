"""LRU field cache with a device-memory budget.

Re-provides the used subset of the reference's field caches
(src/Volume/Cache/FieldCache.hpp): LRU keyed by (name, time, member),
a byte budget defaulting to a fraction of available device memory
(reference uses 7/8 of VRAM for the device cache, FieldCache.hpp:143),
auxiliary-memory reservations so calculators can claim scratch budget,
and a min/max side cache (FieldMinMaxCache).

Simplifications vs. the reference: JAX arrays are immutable and
garbage-collected, so the eviction wait-list for still-referenced
entries (FieldCache.hpp:89-117) is unnecessary — dropping our handle
is always safe.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Hashable, Optional

import jax


def _default_budget() -> int:
    """7/8 of the first device's memory, or 4 GiB if unknown."""
    try:
        stats = jax.devices()[0].memory_stats()
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return int(limit * 7 // 8)
    except Exception:
        pass
    return 4 << 30


def _nbytes(arr) -> int:
    try:
        return int(arr.size * arr.dtype.itemsize)
    except Exception:
        return 0


class LRUFieldCache:
    """Byte-budgeted LRU over named array slabs."""

    def __init__(self, max_bytes: Optional[int] = None):
        self.max_bytes = max_bytes if max_bytes is not None else _default_budget()
        self._entries: OrderedDict[Hashable, object] = OrderedDict()
        self._sizes: dict[Hashable, int] = {}
        self._min_max: dict[Hashable, tuple] = {}
        self._aux_reserved = 0
        self.used_bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, key):
        entry = self._entries.get(key)
        if entry is None:
            self.misses += 1
            return None
        self.hits += 1
        self._entries.move_to_end(key)
        return entry

    def put(self, key, arr):
        size = _nbytes(arr)
        self.ensure_free(size)
        if key in self._entries:
            self.used_bytes -= self._sizes[key]
        self._entries[key] = arr
        self._sizes[key] = size
        self._entries.move_to_end(key)
        self.used_bytes += size

    def ensure_free(self, size: int):
        """Evict LRU entries until ``size`` bytes fit in the budget.

        Mirrors ``FieldCache::ensureSufficientMemory``; like the
        reference with ``failOnCacheExhaustion=false`` we proceed even
        if a single slab exceeds the budget (soft fail).
        """
        budget = self.max_bytes - self._aux_reserved
        while (
            self.used_bytes + size > budget and self._entries
        ):
            old_key, _ = self._entries.popitem(last=False)
            self.used_bytes -= self._sizes.pop(old_key)
            # The min/max side cache survives eviction deliberately:
            # eviction frees memory but does not change the data (two
            # floats per slab), and dropping it forced a full slab
            # reload per member on every global-min/max pass whenever
            # the ensemble exceeds the budget (round-3 review). Only
            # invalidate_field — a data change — clears it.

    def reserve_auxiliary(self, size: int) -> "AuxiliaryMemoryToken":
        """Reserve budget for calculator scratch (FieldCache.hpp:124-138)."""
        self.ensure_free(size)
        self._aux_reserved += size
        return AuxiliaryMemoryToken(self, size)

    def invalidate_field(self, name: str):
        stale = [k for k in self._entries if k[0] == name]
        for k in stale:
            del self._entries[k]
            self.used_bytes -= self._sizes.pop(k)
            self._min_max.pop(k, None)
        stale_mm = [k for k in self._min_max if k[0] == name]
        for k in stale_mm:
            del self._min_max[k]

    def clear(self):
        self._entries.clear()
        self._sizes.clear()
        self._min_max.clear()
        self.used_bytes = 0

    def get_min_max(self, key):
        return self._min_max.get(key)

    def put_min_max(self, key, mm):
        self._min_max[key] = mm

    def __len__(self):
        return len(self._entries)

    def __contains__(self, key):
        return key in self._entries


class AuxiliaryMemoryToken:
    """RAII-style budget reservation; release() or use as context manager."""

    def __init__(self, cache: LRUFieldCache, size: int):
        self._cache = cache
        self._size = size

    def release(self):
        if self._cache is not None:
            self._cache._aux_reserved -= self._size
            self._cache = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
