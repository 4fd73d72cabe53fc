"""DDSketch — mergeable quantile sketch with RELATIVE error guarantees
(Masson, Rim, Lee, "DDSketch: a fast and fully-mergeable quantile sketch
with relative-error guarantees", VLDB 2019).

Values bucket by log-gamma index i = ceil(log_gamma(x)) with
gamma = (1 + alpha) / (1 - alpha); any value reported for a rank is within
relative error alpha of the true value. Merging is bucket-wise counter
addition — exact, associative, commutative — so it plugs into the same
UDAF harness as the other sketches. Complements KLL/t-digest (rank-error
bounds) with a value-error bound: quantiles of heavy-tailed size
distributions keep alpha accuracy at every magnitude.

Positive values only here (lengths/sizes/latencies — the documented use);
zeros track in a dedicated counter, negatives are rejected.
"""

from __future__ import annotations

import math

import numpy as np

from epichypersketch_jl_ray.state.base import MergeableSketch


class DDSketch(MergeableSketch):
    __slots__ = ("alpha", "gamma", "_log_gamma", "buckets", "zero_count", "count")

    def __init__(self, alpha: float = 0.01) -> None:
        if not (0.0 < alpha < 1.0):
            raise ValueError(f"alpha must be in (0,1), got {alpha}")
        self.alpha = float(alpha)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        # scalar libm log, NOT np.log: bit-identical to DuckDB ln(gamma), so
        # the register-level SQL oracle's ceil(ln(x)/ln(gamma)) bucket index
        # reproduces update()'s exactly (pinned exhaustively over the integer
        # value domain in tests — the state/hll.py linear-counting lesson)
        self._log_gamma = math.log(self.gamma)
        self.buckets: dict[int, int] = {}
        self.zero_count = 0
        self.count = 0

    def update(self, values: np.ndarray) -> "DDSketch":
        v = np.asarray(values, dtype=np.float64)
        if v.size == 0:
            return self
        if not np.isfinite(v).all() or (v < 0).any():
            # NaN would pass both the <0 check and the ==0/>0 selections,
            # incrementing count with no bucket mass and skewing ranks
            raise ValueError("DDSketch accepts finite non-negative values only")
        zeros = int((v == 0).sum())
        self.zero_count += zeros
        pos = v[v > 0]
        if pos.size:
            idx = np.ceil(np.log(pos) / self._log_gamma).astype(np.int64)
            uniq, cnt = np.unique(idx, return_counts=True)
            for i, c in zip(uniq.tolist(), cnt.tolist()):
                self.buckets[i] = self.buckets.get(i, 0) + int(c)
        self.count += int(v.size)
        return self

    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(other.alpha - self.alpha) > 1e-12:
            raise ValueError("cannot merge DDSketches with different alpha")
        for i, c in other.buckets.items():
            self.buckets[i] = self.buckets.get(i, 0) + c
        self.zero_count += other.zero_count
        self.count += other.count
        return self

    def quantile(self, q: float) -> float:
        """Value at rank q with relative error <= alpha."""
        if not (0.0 <= q <= 1.0):
            raise ValueError("q must be in [0,1]")
        if self.count == 0:
            return float("nan")
        rank = q * (self.count - 1)
        if rank < self.zero_count:
            return 0.0
        seen = self.zero_count
        for i in sorted(self.buckets):
            seen += self.buckets[i]
            if seen > rank:
                # midpoint of bucket (gamma^{i-1}, gamma^i]: gamma^i·2/(gamma+1)
                return float(self.gamma**i * 2.0 / (self.gamma + 1.0))
        i = max(self.buckets)
        return float(self.gamma**i * 2.0 / (self.gamma + 1.0))

    def _state_arrays(self) -> tuple:
        keys = np.array(sorted(self.buckets), dtype=np.int64)
        vals = np.array([self.buckets[k] for k in keys.tolist()], dtype=np.int64)
        return (
            ("alpha", self.alpha),
            ("keys", keys),
            ("vals", vals),
            ("zero_count", self.zero_count),
            ("count", self.count),
        )
