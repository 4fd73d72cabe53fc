"""Theta (KMV / k-minimum-values) sketch — mergeable distinct counting WITH
set algebra (union / intersection estimates), after the KMV estimator
(Bar-Yossef et al. 2002) and the theta-sketch framework popularized by
Apache DataSketches (Dasgupta, Lang, Rhodes, Thaler, "A framework for
estimating stream expression cardinalities", EDBT 2016 — public papers;
this is an independent numpy implementation).

State: the k smallest distinct uint64 hash values, kept as INTEGERS
(sort/unique/intersect all happen in the uint64 domain — a float64 mapping
would lose the low 11 mantissa bits for large hashes and could merge
distinct values); they map to (0, 1] only when computing theta/estimates.
Union is concat + unique + keep-k-smallest — associative and commutative.
Cardinality: (k - 1) / theta with theta = the k-th smallest value (or
exact |retained| when fewer than k seen). Intersection of sketches A, B:
theta = min(theta_A, theta_B); retained common values below theta scaled
by 1/theta. RSE ~ 1/sqrt(k - 1). HLL cannot answer intersections — this is
the set-expression counterpart in the suite.
"""

from __future__ import annotations

import numpy as np

from epichypersketch_jl_ray.state.base import MergeableSketch

_SCALE = 1.0 / 2.0**64


class ThetaSketch(MergeableSketch):
    __slots__ = ("k", "values")

    def __init__(self, k: int = 4096) -> None:
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = int(k)
        self.values = np.empty(0, dtype=np.uint64)  # sorted, distinct hashes

    def update_hashed(self, hashes: np.ndarray) -> "ThetaSketch":
        """Ingest pre-hashed uint64 keys (hashing.hash_int64 / fnv1a64)."""
        if len(hashes) == 0:
            return self
        v = np.asarray(hashes, dtype=np.uint64)
        self.values = np.unique(np.concatenate([self.values, v]))[: self.k]
        return self

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError("cannot merge ThetaSketches with different k")
        self.values = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        return self

    @property
    def _theta_u(self) -> int | None:
        """k-th smallest retained hash, or None below capacity (theta = 1)."""
        return int(self.values[-1]) if len(self.values) >= self.k else None

    @property
    def theta(self) -> float:
        tu = self._theta_u
        return 1.0 if tu is None else (tu + 1.0) * _SCALE

    def estimate(self) -> float:
        if len(self.values) < self.k:
            return float(len(self.values))  # exact below capacity
        return (self.k - 1) / self.theta

    @staticmethod
    def intersection_estimate(a: "ThetaSketch", b: "ThetaSketch") -> float:
        thetas_u = [t for t in (a._theta_u, b._theta_u) if t is not None]
        if thetas_u:
            tu = np.uint64(min(thetas_u))
            av = a.values[a.values < tu]
            bv = b.values[b.values < tu]
            theta = (float(tu) + 1.0) * _SCALE
        else:
            av, bv, theta = a.values, b.values, 1.0
        common = np.intersect1d(av, bv, assume_unique=True)
        return len(common) / theta

    @staticmethod
    def union_estimate(a: "ThetaSketch", b: "ThetaSketch") -> float:
        u = ThetaSketch(a.k)
        u.values = a.values.copy()
        return u.merge(b).estimate()

    def _state_arrays(self) -> tuple:
        return (("k", self.k), ("values", self.values))
