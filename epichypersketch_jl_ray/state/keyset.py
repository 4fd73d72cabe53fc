"""Int64Set: an EXACT mergeable set of int64 keys (sorted unique array).

The missing piece between a Bloom filter (approximate, fixed size) and a
shuffle join (exact, corpus-scale): when the key domain is bounded by a
DIMENSION table (e.g. distinct ``l_partkey`` values are a subset of the part
table's keys), the exact distinct-key set is broadcast-scale no matter how
large the fact table is. Build it with the UDAF harness (per-block unique →
tree merge → broadcast) and a semi/anti-join becomes one shuffle-free
map_batches over the dim side.

``cap`` makes the boundedness assumption explicit: a merge that would exceed
it raises instead of silently growing a "small" state to corpus scale.
"""

from __future__ import annotations

import numpy as np

from epichypersketch_jl_ray.state.base import MergeableSketch


class Int64Set(MergeableSketch):
    __slots__ = ("keys", "cap")

    def __init__(self, *, cap: int = 1 << 24) -> None:
        self.keys = np.empty(0, dtype=np.int64)
        self.cap = int(cap)

    def _check(self) -> None:
        if len(self.keys) > self.cap:
            raise ValueError(
                f"Int64Set exceeded cap={self.cap} ({len(self.keys)} keys): the "
                "key domain is not dim-bounded — use a shuffle or Bloom plan"
            )

    def update(self, values: np.ndarray) -> "Int64Set":
        v = np.asarray(values, dtype=np.int64)
        if v.size:
            self.keys = np.union1d(self.keys, v)
            self._check()
        return self

    def merge(self, other: "Int64Set") -> "Int64Set":
        if other.keys.size:
            self.keys = np.union1d(self.keys, other.keys)
            self._check()
        return self

    def merge_many(self, others: list["Int64Set"]) -> "Int64Set":
        arrays = [self.keys] + [o.keys for o in others if o.keys.size]
        self.keys = np.unique(np.concatenate(arrays)) if len(arrays) > 1 else self.keys
        self._check()
        return self

    def contains(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership test (bool array)."""
        v = np.asarray(values, dtype=np.int64)
        if self.keys.size == 0:
            return np.zeros(len(v), dtype=bool)
        pos = np.searchsorted(self.keys, v)
        pos = np.minimum(pos, len(self.keys) - 1)
        return self.keys[pos] == v

    def _state_arrays(self) -> tuple:
        return (("keys", self.keys), ("cap", self.cap))
