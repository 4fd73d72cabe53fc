"""Mergeable uniform reservoir sample (Vitter 1985; distributed merge via
priority sampling: each item gets a deterministic pseudo-random priority and
the reservoir keeps the k smallest priorities — merging reservoirs is then
just keeping the k smallest overall, which is exactly a uniform sample of
the union and is trivially associative/commutative).

Priorities derive from splitmix64(item_id ^ seed), so the sample is a pure
function of (data, seed): any partitioning, batch size or merge order yields
the SAME sample — stronger than classic reservoir merging, and exactly what
resumable distributed sampling needs.
"""

from __future__ import annotations

import numpy as np

from epichypersketch_jl_ray.state.base import MergeableSketch
from epichypersketch_jl_ray.functions.hashing import splitmix64


class ReservoirSample(MergeableSketch):
    __slots__ = ("k", "seed", "priorities", "items", "n")

    def __init__(self, k: int = 1000, *, seed: int = 1234) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.seed = int(seed)
        self.priorities = np.empty(0, dtype=np.uint64)  # sorted ascending
        self.items = np.empty(0, dtype=np.int64)
        self.n = 0

    def _absorb(self, prio: np.ndarray, ids: np.ndarray) -> None:
        """Keep the k smallest-priority DISTINCT items (a duplicate item id
        has an identical priority, so np.unique dedupes it exactly)."""
        allp = np.concatenate([self.priorities, prio])
        alli = np.concatenate([self.items, ids])
        uniq, idx = np.unique(allp, return_index=True)  # sorted ascending
        self.priorities = uniq[: self.k]
        self.items = alli[idx[: self.k]]

    def update(self, item_ids: np.ndarray) -> "ReservoirSample":
        ids = np.asarray(item_ids, dtype=np.int64)
        if ids.size == 0:
            return self
        self.n += int(ids.size)
        prio = splitmix64(ids.astype(np.uint64) ^ splitmix64(np.uint64(self.seed)))
        self._absorb(prio, ids)
        return self

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("cannot merge reservoirs with different k/seed")
        self.n += other.n
        self._absorb(other.priorities, other.items)
        return self

    def sample(self) -> np.ndarray:
        return np.sort(self.items)

    def _state_arrays(self) -> tuple:
        return (("k", self.k), ("seed", self.seed), ("items", np.sort(self.items)), ("n", self.n))
