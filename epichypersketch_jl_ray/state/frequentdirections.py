"""Frequent Directions — mergeable MATRIX sketch (Liberty, KDD 2013;
mergeability per Ghashami & Phillips, SODA 2014): a deterministic l x d
shadow matrix B with the covariance guarantee

    0 <= x'(A'A - B'B)x <= ||A||_F^2 / l   for every unit x.

Rows stream in; when the buffer reaches 2l rows an SVD shrinks every
singular value by the l-th one and keeps the top l rows. MERGE is "stack
the two shadow matrices and shrink" — the bound composes, so per-block
partials run through the same UDAF harness as the scalar sketches. This
extends the engine's mergeable-state pattern beyond scalars to linear
algebra: approximate PCA / covariance of an embedding column in one pass,
O(l·d) state per partial, no N x N or N x d materialization anywhere.

Like KLL/t-digest, merged STATES are order-dependent but every answer
carries the published bound (asserted in tests); CMS/HLL/Bloom remain the
byte-stable family.
"""

from __future__ import annotations

import numpy as np

from epichypersketch_jl_ray.state.base import MergeableSketch


class FrequentDirections(MergeableSketch):
    __slots__ = ("dim", "ell", "B", "frob_sq", "rows_seen")

    def __init__(self, dim: int, ell: int = 64) -> None:
        if ell < 2:
            raise ValueError("ell must be >= 2")
        self.dim = int(dim)
        self.ell = int(ell)
        self.B = np.zeros((0, dim), dtype=np.float64)
        self.frob_sq = 0.0  # running ||A||_F^2 (for the bound / shares)
        self.rows_seen = 0

    def update(self, rows: np.ndarray) -> "FrequentDirections":
        rows = np.asarray(rows, dtype=np.float64)
        if rows.ndim != 2 or rows.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) rows, got {rows.shape}")
        self.frob_sq += float((rows * rows).sum())
        self.rows_seen += len(rows)
        self.B = np.vstack([self.B, rows])
        self._compact()
        return self

    def _compact(self) -> None:
        while len(self.B) >= 2 * self.ell:
            _, s, vt = np.linalg.svd(self.B, full_matrices=False)
            shrink = np.sqrt(np.maximum(s**2 - s[min(self.ell, len(s)) - 1] ** 2, 0.0))
            keep = shrink > 0
            self.B = shrink[keep, None] * vt[keep]
            if len(self.B) >= 2 * self.ell:  # degenerate: cannot shrink further
                self.B = self.B[: self.ell]
                break

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if other.dim != self.dim or other.ell != self.ell:
            raise ValueError("cannot merge FrequentDirections with different geometry")
        self.B = np.vstack([self.B, other.B])
        self.frob_sq += other.frob_sq
        self.rows_seen += other.rows_seen
        self._compact()
        return self

    def cov_estimate(self) -> np.ndarray:
        """B'B ≈ A'A (within frob_sq / ell in spectral norm, one-sided)."""
        return self.B.T @ self.B

    def top_directions(self, k: int) -> tuple[np.ndarray, np.ndarray]:
        """(k singular values of B, k right singular vectors) — approximate
        principal directions of the streamed rows."""
        _, s, vt = np.linalg.svd(self.B, full_matrices=False)
        k = min(k, len(s))
        return s[:k], vt[:k]

    def error_bound(self) -> float:
        """Guaranteed spectral-norm bound on A'A - B'B."""
        return self.frob_sq / self.ell

    def _state_arrays(self) -> tuple:
        return (
            ("dim", self.dim),
            ("ell", self.ell),
            ("B", self.B),
            ("frob_sq", self.frob_sq),
            ("rows_seen", self.rows_seen),
        )
