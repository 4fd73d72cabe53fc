"""Theta (KMV / k-minimum-values) sketch — mergeable distinct counting WITH
set algebra (union / intersection estimates), after the KMV estimator
(Bar-Yossef et al. 2002) and the theta-sketch framework popularized by
Apache DataSketches (Dasgupta, Lang, Rhodes, Thaler, "A framework for
estimating stream expression cardinalities", EDBT 2016 — public papers;
this is an independent numpy implementation).

State: the k smallest distinct hash values mapped to (0, 1). Union is
concat + unique + keep-k-smallest — associative and commutative.
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
        self.values = np.empty(0, dtype=np.float64)  # sorted, distinct, in (0,1]

    def update_hashed(self, hashes: np.ndarray) -> "ThetaSketch":
        """Ingest pre-hashed uint64 keys (hashing.hash_int64 / fnv1a64)."""
        if len(hashes) == 0:
            return self
        v = (np.asarray(hashes, dtype=np.uint64).astype(np.float64) + 1.0) * _SCALE
        self.values = np.unique(np.concatenate([self.values, v]))[: self.k]
        return self

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if other.k != self.k:
            raise ValueError("cannot merge ThetaSketches with different k")
        self.values = np.unique(np.concatenate([self.values, other.values]))[: self.k]
        return self

    @property
    def theta(self) -> float:
        return float(self.values[-1]) if len(self.values) >= self.k else 1.0

    def estimate(self) -> float:
        if len(self.values) < self.k:
            return float(len(self.values))  # exact below capacity
        return (self.k - 1) / self.theta

    @staticmethod
    def intersection_estimate(a: "ThetaSketch", b: "ThetaSketch") -> float:
        theta = min(a.theta, b.theta)
        av = a.values[a.values < theta] if theta < 1.0 else a.values
        bv = b.values[b.values < theta] if theta < 1.0 else b.values
        common = np.intersect1d(av, bv, assume_unique=True)
        return len(common) / theta

    @staticmethod
    def union_estimate(a: "ThetaSketch", b: "ThetaSketch") -> float:
        u = ThetaSketch(a.k)
        u.values = a.values.copy()
        return u.merge(b).estimate()

    def _state_arrays(self) -> tuple:
        return (("k", self.k), ("values", self.values))
