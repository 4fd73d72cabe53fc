"""Count-Sketch (AMS sketch) — mergeable UNBIASED frequency estimation
(Charikar, Chen, Farach-Colton, "Finding frequent items in data streams",
ICALP 2002; Alon, Matias, Szegedy 1996 for the signed-sum estimator — public
papers, independent numpy implementation).

The signed counterpart to CountMin (state/countmin.py): each row r hashes a
key to a column AND to a sign in {-1, +1}; update adds sign * weight, the
estimate is the MEDIAN over rows of sign * counter. Per row the estimate is
unbiased (colliding keys cancel in expectation instead of always adding),
with variance ||f||_2^2 / cols — so the error bound is eps * ||f||_2 (L2)
versus CountMin's eps * ||f||_1 (L1): much tighter on skewed streams, at
the price of losing the never-undercounts guarantee the motif pipeline
relies on. The sketch is LINEAR, so merge is element-wise addition —
associative, commutative, and it also estimates inner products of two
streams (median over rows of the row dot product), which CMS cannot do
without bias.

Geometry: rows = ceil(ln 1/delta) (median concentration), cols = ceil(3 /
eps^2) (Chebyshev at variance/cols <= (eps ||f||_2)^2 / 3 per row).
"""

from __future__ import annotations

import math

import numpy as np

from epichypersketch_jl_ray.state.base import MergeableSketch
from epichypersketch_jl_ray.functions.hashing import splitmix64


class CountSketch(MergeableSketch):
    __slots__ = ("rows", "cols", "seed", "counts", "row_seeds", "sign_seeds", "n_items")

    def __init__(self, *, epsilon: float = 0.005, delta: float = 1e-3, seed: int = 97) -> None:
        if not (0 < epsilon < 1) or not (0 < delta < 1):
            raise ValueError("epsilon and delta must be in (0, 1)")
        self.rows = max(1, math.ceil(math.log(1.0 / delta)))
        self.cols = max(8, math.ceil(3.0 / epsilon**2))
        self.seed = int(seed)
        self.counts = np.zeros((self.rows, self.cols), dtype=np.int64)
        base = np.uint64(self.seed)
        self.row_seeds = splitmix64(base ^ np.arange(1, self.rows + 1, dtype=np.uint64))
        self.sign_seeds = splitmix64(~base ^ np.arange(1, self.rows + 1, dtype=np.uint64))
        self.n_items = 0

    def _cols_signs(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        k = np.asarray(keys, dtype=np.uint64)
        cols = np.empty((len(k), self.rows), dtype=np.int64)
        signs = np.empty((len(k), self.rows), dtype=np.int64)
        for r in range(self.rows):
            cols[:, r] = (splitmix64(k ^ self.row_seeds[r]) % np.uint64(self.cols)).astype(
                np.int64
            )
            # an independent mix's top bit: unbiased +/-1
            signs[:, r] = 1 - 2 * (
                (splitmix64(k ^ self.sign_seeds[r]) >> np.uint64(63)).astype(np.int64)
            )
        return cols, signs

    def add_keys(self, keys: np.ndarray, weights: np.ndarray | None = None) -> "CountSketch":
        """Vectorized signed scatter-add of pre-hashed uint64 keys."""
        if len(keys) == 0:
            return self
        cols, signs = self._cols_signs(keys)
        w = (
            np.ones(len(keys), dtype=np.int64)
            if weights is None
            else np.asarray(weights, dtype=np.int64)
        )
        for r in range(self.rows):
            np.add.at(self.counts[r], cols[:, r], signs[:, r] * w)
        self.n_items += int(w.sum())
        return self

    def estimate_keys(self, keys: np.ndarray) -> np.ndarray:
        """Median-of-rows signed estimates — unbiased, error <= eps*||f||_2
        w.p. >= 1 - delta per key."""
        if len(keys) == 0:
            return np.empty(0, dtype=np.float64)
        cols, signs = self._cols_signs(keys)
        per_row = np.empty((len(keys), self.rows), dtype=np.float64)
        for r in range(self.rows):
            per_row[:, r] = signs[:, r] * self.counts[r, cols[:, r]]
        return np.median(per_row, axis=1)

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (other.rows, other.cols, other.seed) != (self.rows, self.cols, self.seed):
            raise ValueError("cannot merge CountSketches with different geometry/seed")
        self.counts += other.counts
        self.n_items += other.n_items
        return self

    @staticmethod
    def inner_product(a: "CountSketch", b: "CountSketch") -> float:
        """Median-of-rows estimate of the inner product <f_a, f_b> of the two
        sketched frequency vectors (linear-sketch property; CMS's analogue
        is biased upward)."""
        if (a.rows, a.cols, a.seed) != (b.rows, b.cols, b.seed):
            raise ValueError("cannot compare CountSketches with different geometry/seed")
        return float(np.median(np.einsum("rc,rc->r", a.counts.astype(np.float64), b.counts)))

    def _state_arrays(self) -> tuple:
        return (
            ("rows", self.rows),
            ("cols", self.cols),
            ("seed", self.seed),
            ("counts", self.counts),
            ("n_items", self.n_items),
        )
