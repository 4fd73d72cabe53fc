"""Property-based sketch tests (hypothesis): the invariants hold for
ARBITRARY inputs, not just the fixtures — CMS never undercounts, Bloom never
false-negatives, HLL/KLL merge = whole, quantiles within rank bounds."""

import numpy as np
from hypothesis import given, settings, strategies as st

from epichypersketch_jl_ray.functions.hashing import hash_int64
from epichypersketch_jl_ray.state import BloomFilter, CountMin, HyperLogLog, KLL

ints = st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=300)
floats = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=300
)


@settings(max_examples=30, deadline=None)
@given(ints)
def test_cms_never_undercounts(xs):
    arr = np.array(xs, dtype=np.int64)[:, None]
    cm = CountMin(1, delta=0.01, epsilon=0.005, seed=1).add(arr)
    uniq, counts = np.unique(arr, return_counts=True)
    est = cm.estimate(uniq[:, None])
    assert (est >= counts).all()


@settings(max_examples=30, deadline=None)
@given(ints, st.integers(min_value=2, max_value=5))
def test_cms_split_merge_equals_whole(xs, k):
    arr = np.array(xs, dtype=np.int64)[:, None]
    whole = CountMin(1, delta=0.01, epsilon=0.01, seed=2).add(arr)
    parts = [CountMin(1, delta=0.01, epsilon=0.01, seed=2).add(c) for c in np.array_split(arr, k)]
    merged = parts[0].merge_many(parts[1:])
    assert merged.digest() == whole.digest()


@settings(max_examples=30, deadline=None)
@given(ints)
def test_bloom_no_false_negatives(xs):
    keys = hash_int64(np.array(xs, dtype=np.int64), seed=5)
    bf = BloomFilter(capacity=max(len(xs), 16), p=0.01, seed=5).add_hashed(keys)
    assert bf.contains_hashed(keys).all()


@settings(max_examples=30, deadline=None)
@given(ints, st.integers(min_value=2, max_value=4))
def test_hll_split_merge_equals_whole(xs, k):
    keys = hash_int64(np.array(xs, dtype=np.int64), seed=6)
    whole = HyperLogLog(p=8).update_hashed(keys)
    parts = [HyperLogLog(p=8).update_hashed(c) for c in np.array_split(keys, k)]
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    assert m.digest() == whole.digest()


@settings(max_examples=20, deadline=None)
@given(floats, st.floats(min_value=0.05, max_value=0.95))
def test_kll_quantile_within_rank_bound(xs, q):
    vals = np.array(xs, dtype=np.float64)
    k = KLL(k=128, seed=3).update(vals)
    est = k.quantile(q)
    s = np.sort(vals)
    lo = np.searchsorted(s, est, side="left") / len(s)
    hi = np.searchsorted(s, est, side="right") / len(s)
    # returned value's rank interval must be within the KLL bound of q
    eps = 0.25 if len(s) > 128 else 1.0 / max(len(s), 1) + 0.25
    assert lo - eps <= q <= hi + eps


@settings(max_examples=20, deadline=None)
@given(floats)
def test_tdigest_quantiles_monotone_and_bounded(xs):
    from epichypersketch_jl_ray.state import TDigest

    vals = np.array(xs, dtype=np.float64)
    td = TDigest(compression=50).update(vals)
    qs = [td.quantile(q) for q in (0.1, 0.3, 0.5, 0.7, 0.9)]
    assert all(a <= b + 1e-9 for a, b in zip(qs, qs[1:]))  # monotone
    assert vals.min() - 1e-9 <= qs[0] and qs[-1] <= vals.max() + 1e-9


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=100), min_size=5, max_size=400))
def test_spacesaving_no_false_positives(xs):
    from epichypersketch_jl_ray.state import SpaceSaving

    keys = np.array(xs, dtype=np.uint64)
    ss = SpaceSaving(capacity=16)
    for c in np.array_split(keys, 4):
        ss.update_hashed(c)
    true = {int(k): int(c) for k, c in zip(*np.unique(keys, return_counts=True))}
    for k, est, err in ss.heavy_hitters(min_count=3):
        assert true[k] >= 3
        assert est - err <= true[k] <= est


@settings(max_examples=30, deadline=None)
@given(ints, st.integers(min_value=2, max_value=5))
def test_int64set_split_merge_equals_whole(xs, k):
    from epichypersketch_jl_ray.state.keyset import Int64Set

    arr = np.array(xs, dtype=np.int64)
    whole = Int64Set().update(arr)
    parts = [Int64Set().update(c) for c in np.array_split(arr, k)]
    merged = parts[0].merge_many(parts[1:])
    assert merged.digest() == whole.digest()
    assert merged.contains(arr).all()
    assert not merged.contains(arr.max() + 1 + np.arange(3)).any()


def test_int64set_cap_raises():
    from epichypersketch_jl_ray.state.keyset import Int64Set
    import pytest

    s = Int64Set(cap=10)
    with pytest.raises(ValueError, match="exceeded cap"):
        s.update(np.arange(11, dtype=np.int64))
