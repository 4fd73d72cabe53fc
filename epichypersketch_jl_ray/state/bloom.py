"""Bloom filter (Bloom 1970) over pre-hashed uint64 keys.

Absent from the reference; mandated by the north_rule (SURVEY.md §2.4 A4).
Sized from (capacity n, target false-positive rate p):
    m = ceil(-n ln p / (ln 2)^2) bits,  k = max(1, round(m/n * ln 2)).
The k probe positions use Kirsch–Mitzenmacher double hashing
(h1 + i*h2 mod m) over two independent 64-bit mixes of the input hash, so
only one upstream hash per key is needed. Merge = bitwise OR (associative,
commutative). Zero false negatives by construction.
"""

from __future__ import annotations

import math

import numpy as np

from epichypersketch_jl_ray.state.base import MergeableSketch
from epichypersketch_jl_ray.functions.hashing import splitmix64


class BloomFilter(MergeableSketch):
    __slots__ = ("m", "k", "capacity", "p", "seed", "bits", "n_added")

    def __init__(self, capacity: int, p: float = 1e-6, *, seed: int = 1234) -> None:
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        if not (0.0 < p < 1.0):
            raise ValueError("p must be in (0,1)")
        self.capacity = int(capacity)
        self.p = float(p)
        self.seed = int(seed)
        self.m = int(math.ceil(-capacity * math.log(p) / (math.log(2.0) ** 2)))
        self.k = max(1, round(self.m / capacity * math.log(2.0)))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)
        self.n_added = 0

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        h1 = splitmix64(h ^ np.uint64(self.seed))
        h2 = splitmix64(h1) | np.uint64(1)  # odd => full-period stepping
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def add_hashed(self, hashes: np.ndarray) -> "BloomFilter":
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return self
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.n_added += int(h.size)
        return self

    def contains_hashed(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        bit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return bit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k, self.seed) != (other.m, other.k, other.seed):
            raise ValueError("cannot merge Bloom filters with different geometry/seed")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).sum()) / self.m

    def _state_arrays(self) -> tuple:
        return (("geom", (self.m, self.k, self.seed)), ("bits", self.bits))
