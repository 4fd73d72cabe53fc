"""MergeableSketch protocol.

The reference's only cross-partition state is one shared, additively-updated
CountMinSketch (/root/reference/src/partition.jl:148,204-214). We generalize
that into an explicit protocol so every sketch (CMS, HLL, KLL, t-digest,
Bloom) plugs into the same Ray Data UDAF harness (stages/udaf.py):

    per-block partial state via map_batches  →  tree merge  →  query.

Requirements on implementations:
- ``merge`` must be associative and commutative (verified by randomized
  merge-order tests, tests/test_merge_associativity.py) so Ray's
  nondeterministic block order cannot change results.
- construction from (seed, geometry) must be deterministic so all workers
  agree on hash functions without coordination.
- ``to_bytes``/``from_bytes`` round-trip exactly; ``digest()`` is a canonical
  content hash used by checkpoint/resume equality tests.
"""

from __future__ import annotations

import hashlib
import io
import pickle
from abc import ABC, abstractmethod

import numpy as np


class MergeableSketch(ABC):
    """Base class for serializable, associatively-mergeable sketch states."""

    @abstractmethod
    def merge(self, other: "MergeableSketch") -> "MergeableSketch":
        """Merge ``other`` into ``self`` (in place) and return ``self``."""

    def merge_many(self, others: list["MergeableSketch"]) -> "MergeableSketch":
        """k-way merge. Default is sequential pairwise; implementations with
        concat-and-sort state (CountMin COO) override with a single-pass
        merge — pairwise merging of B partials is O(B·N log N), one k-way
        pass is O(ΣN log ΣN)."""
        for o in others:
            self.merge(o)
        return self

    @abstractmethod
    def _state_arrays(self) -> tuple:
        """Canonical tuple of (name, ndarray-or-scalar) pairs defining state.

        Used for digest() and default serialization. Must be order-stable.
        """

    # --- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump(self, buf, protocol=pickle.HIGHEST_PROTOCOL)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "MergeableSketch":
        obj = pickle.loads(data)
        if not isinstance(obj, cls):
            raise TypeError(f"expected {cls.__name__}, got {type(obj).__name__}")
        return obj

    def digest(self) -> str:
        """Canonical content hash of the sketch state (merge-order invariant)."""
        h = hashlib.sha256()
        for name, arr in self._state_arrays():
            h.update(name.encode())
            if isinstance(arr, np.ndarray):
                h.update(str(arr.dtype).encode())
                h.update(str(arr.shape).encode())
                h.update(np.ascontiguousarray(arr).tobytes())
            else:
                h.update(repr(arr).encode())
        return h.hexdigest()
