"""Planted-ground-truth activation fixtures translated from the reference's
test generators (FIXTURES.md F3/F4):

- ordinary: /root/reference/test/test_large_example_ordinary.jl:23-113 —
  motifs [7,19,42]x25, [13,28,55]x15, [22,8,39]x12, [3,41,67]x8 planted in
  750 sequences with noise features in disjoint ID ranges, plus empty /
  length-1 / length-2 edge sequences.
- convolution: /root/reference/test/test_large_example_convolution.jl:28-135 —
  the same motifs at fixed positions with known gaps, filter_len=8.

Plus the exact brute-force counter the reference uses as its oracle
(verify_ground_truth, /root/reference/test/test_large_example_ordinary.jl:118-169).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

ORDINARY_PLANTS = [
    ((7, 19, 42), 25),
    ((13, 28, 55), 15),
    ((22, 8, 39), 12),
    ((3, 41, 67), 8),
]
CONV_PLANTS = [
    ((7, 19, 42), (10, 20, 32), 25),
    ((13, 28, 55), (5, 18, 29), 15),
    ((3, 41, 67), (15, 25, 40), 8),
    ((22, 8, 39), (8, 20, 35), 12),
]
FILTER_LEN = 8


def make_ordinary_dict(seed: int = 123) -> dict[int, list[tuple[int, float]]]:
    """750 sequences; planted motifs + disjoint-range noise + edge rows."""
    rng = np.random.default_rng(seed)
    d: dict[int, list[tuple[int, float]]] = {}
    idx = 1
    for motif, count in ORDINARY_PLANTS:
        for _ in range(count):
            noise = rng.integers(100, 151, size=rng.integers(2, 6))
            feats = list(motif) + noise.tolist()
            d[idx] = [(int(f), float(rng.uniform(0.5, 2.0))) for f in feats]
            idx += 1
    while idx <= 700:
        base = 200 + 50 * (idx % 5)
        noise = rng.integers(base, base + 40, size=rng.integers(3, 9))
        d[idx] = [(int(f), float(rng.uniform(0.5, 2.0))) for f in noise]
        idx += 1
    for i in range(701, 711):
        d[i] = []  # empty (filtered, /root/reference/src/record.jl:248-252)
    for i in range(711, 721):
        d[i] = [(int(rng.integers(300, 340)), 1.0)]
    for i in range(721, 731):
        d[i] = [(int(rng.integers(340, 380)), 1.0), (int(rng.integers(380, 420)), 1.0)]
    return d


def make_conv_dict(seed: int = 456) -> dict[int, list[tuple[int, float, int]]]:
    rng = np.random.default_rng(seed)
    d: dict[int, list[tuple[int, float, int]]] = {}
    idx = 1
    for motif, positions, count in CONV_PLANTS:
        for _ in range(count):
            seq = [
                (int(f), float(rng.uniform(0.5, 2.0)), int(p))
                for f, p in zip(motif, positions)
            ]
            # extra noise filters at far positions (never overlapping plants)
            extra = rng.integers(1, 4)
            for e in range(int(extra)):
                seq.append(
                    (int(rng.integers(100, 150)), 1.0, int(60 + 10 * e + rng.integers(0, 5)))
                )
            d[idx] = seq
            idx += 1
    while idx <= 200:
        n = int(rng.integers(2, 5))
        pos = np.sort(rng.choice(np.arange(0, 120, FILTER_LEN + 1), size=n, replace=False))
        d[idx] = [
            (int(rng.integers(200, 260)), 1.0, int(p)) for p in pos
        ]
        idx += 1
    return d


def brute_force_subset_counts(d: dict, k: int) -> dict[tuple, int]:
    """Exact number of sequences-slot-combinations per sorted k-subset
    (reference verify_ground_truth)."""
    counts: dict[tuple, int] = {}
    for v in d.values():
        feats = sorted((t[0], t[1]) for t in v)
        ids = [f for f, _ in feats]
        if len(ids) < k:
            continue
        for comb in combinations(ids, k):
            counts[comb] = counts.get(comb, 0) + 1
    return counts


def brute_force_conv_counts(d: dict, k: int, filter_len: int) -> dict[tuple, int]:
    """Exact counts per (filters..., gaps...) identity with overlap rejection
    (/root/reference/src/count_cpu.jl:27-57)."""
    counts: dict[tuple, int] = {}
    for v in d.values():
        seq = sorted(v, key=lambda t: t[2])
        if len(seq) < k:
            continue
        for comb in combinations(range(len(seq)), k):
            fs = tuple(seq[i][0] for i in comb)
            ps = [seq[i][2] for i in comb]
            gaps = tuple(ps[j + 1] - ps[j] - filter_len for j in range(k - 1))
            if any(g < 0 for g in gaps):
                continue
            key = fs + gaps
            counts[key] = counts.get(key, 0) + 1
    return counts
