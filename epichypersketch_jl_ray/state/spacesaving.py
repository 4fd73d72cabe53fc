"""SpaceSaving / Misra-Gries heavy-hitter sketch (Metwally, Agrawal,
El Abbadi 2005; merge per Agarwal et al. "Mergeable Summaries", PODS 2012 —
see also PAPERS.md "Together is Better: Heavy Hitters Quantile Estimation").

Tracks the top-k keys with counts and per-key overestimation error:
- update: counters for present keys increment; a new key evicts the minimum
  counter, inheriting its count as error bound.
- merge: sum counts/errors for shared keys, offset absent keys by the other
  sketch's min-counter, keep the top ``capacity`` (mergeable-summaries
  construction; the deterministic guarantee est-err <= true <= est is
  preserved).
- query: estimated count with error bound; guaranteed heavy hitters are
  those with est - err above threshold.

Complements the CMS: CMS answers point queries for ANY key, SpaceSaving
enumerates the heavy keys without a second pass over the data.
"""

from __future__ import annotations

import numpy as np

from epichypersketch_jl_ray.state.base import MergeableSketch


class SpaceSaving(MergeableSketch):
    __slots__ = ("capacity", "keys", "counts", "errors", "n")

    def __init__(self, capacity: int = 1024) -> None:
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        self.keys = np.empty(0, dtype=np.uint64)  # sorted by key
        self.counts = np.empty(0, dtype=np.int64)
        self.errors = np.empty(0, dtype=np.int64)
        self.n = 0  # total stream length

    def _prune(self) -> None:
        if len(self.keys) <= self.capacity:
            return
        # keep the capacity largest counts; evicted mass raises survivors'
        # floor implicitly via the standard min-counter semantics: evicted
        # keys' counts become the new entries' base next time (approximated
        # here by dropping — their counts are <= the kept minimum, so the
        # deterministic bound est - err <= true <= est still holds for kept
        # keys; the bound for future inserts uses min_count()).
        order = np.argsort(-self.counts, kind="stable")[: self.capacity]
        keep = np.sort(order)
        self.keys = self.keys[keep]
        self.counts = self.counts[keep]
        self.errors = self.errors[keep]

    def min_count(self) -> int:
        if len(self.counts) < self.capacity:
            return 0
        return int(self.counts.min())

    def update_hashed(self, keys: np.ndarray, weights: np.ndarray | None = None) -> "SpaceSaving":
        k = np.asarray(keys, dtype=np.uint64)
        if k.size == 0:
            return self
        uniq, counts = np.unique(k, return_counts=True)
        w = counts.astype(np.int64)
        if weights is not None:
            w = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(w, np.searchsorted(uniq, k), np.asarray(weights, dtype=np.int64))
        self.n += int(w.sum())
        pos = np.searchsorted(self.keys, uniq)
        pos_c = np.minimum(pos, max(len(self.keys) - 1, 0))
        present = (
            (self.keys[pos_c] == uniq) if len(self.keys) else np.zeros(len(uniq), dtype=bool)
        )
        if present.any():
            np.add.at(self.counts, pos_c[present], w[present])
        new = ~present
        if new.any():
            base = self.min_count()
            self.keys = np.concatenate([self.keys, uniq[new]])
            self.counts = np.concatenate([self.counts, w[new] + base])
            self.errors = np.concatenate(
                [self.errors, np.full(int(new.sum()), base, dtype=np.int64)]
            )
            order = np.argsort(self.keys, kind="stable")
            self.keys, self.counts, self.errors = (
                self.keys[order],
                self.counts[order],
                self.errors[order],
            )
            self._prune()
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if self.capacity != other.capacity:
            raise ValueError("cannot merge SpaceSaving sketches with different capacity")
        mo, ms = other.min_count(), self.min_count()
        allk = np.union1d(self.keys, other.keys)
        c = np.zeros(len(allk), dtype=np.int64)
        e = np.zeros(len(allk), dtype=np.int64)
        ps = np.searchsorted(allk, self.keys)
        po = np.searchsorted(allk, other.keys)
        c[ps] += self.counts
        e[ps] += self.errors
        in_self = np.zeros(len(allk), dtype=bool)
        in_self[ps] = True
        c[po] += other.counts
        e[po] += other.errors
        in_other = np.zeros(len(allk), dtype=bool)
        in_other[po] = True
        # keys absent from one side get that side's min-counter as offset
        c[~in_other] += mo
        e[~in_other] += mo
        c[~in_self] += ms
        e[~in_self] += ms
        self.keys, self.counts, self.errors = allk, c, e
        self.n += other.n
        self._prune()
        return self

    def heavy_hitters(self, min_count: int) -> list[tuple[int, int, int]]:
        """(key, estimate, error) for keys whose GUARANTEED count
        (est - err) >= min_count — no false positives."""
        mask = (self.counts - self.errors) >= min_count
        order = np.argsort(-self.counts[mask], kind="stable")
        ks, cs, es = self.keys[mask][order], self.counts[mask][order], self.errors[mask][order]
        return [(int(k), int(c), int(e)) for k, c, e in zip(ks, cs, es)]

    def _state_arrays(self) -> tuple:
        return (
            ("capacity", self.capacity),
            ("keys", self.keys),
            ("counts", self.counts),
            ("errors", self.errors),
            ("n", self.n),
        )
