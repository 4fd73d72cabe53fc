"""CountSketch (signed AMS sketch): unbiasedness, L2 error bound, merge
associativity, inner products, and the SpaceSaving+CountSketch refined
heavy-hitter pipeline vs the exact oracle."""

import numpy as np
import pytest

from epichypersketch_jl_ray.state.countsketch import CountSketch


def _zipf_stream(rng, n=20000, n_keys=500):
    keys = rng.zipf(1.5, size=n).astype(np.uint64) % n_keys
    return keys


def test_countsketch_unbiased_over_seeds():
    rng = np.random.default_rng(0)
    keys = _zipf_stream(rng)
    true = int((keys == 7).sum())
    # single-row sketches (delta -> rows=1: the raw signed estimator) are
    # unbiased; average over independent seeds converges to the true count
    ests = []
    for seed in range(40):
        cs = CountSketch(epsilon=0.05, delta=0.5, seed=seed)
        cs.add_keys(keys)
        ests.append(cs.estimate_keys(np.array([7], dtype=np.uint64))[0])
    err = abs(np.mean(ests) - true)
    assert err < 0.2 * true + 20, (np.mean(ests), true)


def test_countsketch_l2_bound():
    rng = np.random.default_rng(1)
    keys = _zipf_stream(rng)
    uniq, counts = np.unique(keys, return_counts=True)
    l2 = float(np.sqrt((counts.astype(np.float64) ** 2).sum()))
    eps = 0.05
    cs = CountSketch(epsilon=eps, delta=1e-3, seed=3)
    cs.add_keys(keys)
    est = cs.estimate_keys(uniq)
    # per-key: |est - true| <= eps * ||f||_2 w.p. >= 1 - delta; allow a few
    # of the 500 keys to exceed (union bound slack)
    viol = (np.abs(est - counts) > eps * l2).sum()
    assert viol <= 5, viol


def test_countsketch_merge_associativity():
    rng = np.random.default_rng(2)
    keys = _zipf_stream(rng)
    chunks = np.array_split(keys, 8)
    import random

    digests = set()
    for trial in range(3):
        parts = [CountSketch(epsilon=0.02, seed=9).add_keys(c) for c in chunks]
        random.Random(trial).shuffle(parts)
        m = parts[0]
        for p in parts[1:]:
            m.merge(p)
        digests.add(m.digest())
    assert len(digests) == 1
    whole = CountSketch(epsilon=0.02, seed=9).add_keys(keys)
    assert whole.digest() in digests  # split+merge == single pass (linear)


def test_countsketch_weighted_and_geometry_mismatch():
    cs = CountSketch(epsilon=0.02, seed=5)
    cs.add_keys(np.array([3, 3, 4], dtype=np.uint64), weights=np.array([10, 5, 2]))
    est = cs.estimate_keys(np.array([3, 4], dtype=np.uint64))
    assert abs(est[0] - 15) < 1e-9 and abs(est[1] - 2) < 1e-9  # no collisions at this size
    with pytest.raises(ValueError):
        cs.merge(CountSketch(epsilon=0.05, seed=5))
    with pytest.raises(ValueError):
        cs.merge(CountSketch(epsilon=0.02, seed=6))


def test_countsketch_inner_product():
    rng = np.random.default_rng(4)
    a_keys = rng.integers(0, 200, size=30000).astype(np.uint64)
    b_keys = rng.integers(0, 200, size=30000).astype(np.uint64)
    ua, ca = np.unique(a_keys, return_counts=True)
    ub, cb = np.unique(b_keys, return_counts=True)
    fa = np.zeros(200)
    fa[ua.astype(int)] = ca
    fb = np.zeros(200)
    fb[ub.astype(int)] = cb
    true = float(fa @ fb)
    cs_a = CountSketch(epsilon=0.01, seed=11).add_keys(a_keys)
    cs_b = CountSketch(epsilon=0.01, seed=11).add_keys(b_keys)
    est = CountSketch.inner_product(cs_a, cs_b)
    assert abs(est - true) <= 0.05 * true


def test_tuplestate_merge_and_mismatch():
    from epichypersketch_jl_ray.state.tuplestate import TupleState

    a = TupleState((CountSketch(epsilon=0.02, seed=5),))
    b = TupleState((CountSketch(epsilon=0.02, seed=5),))
    a.parts[0].add_keys(np.array([1], dtype=np.uint64))
    b.parts[0].add_keys(np.array([1], dtype=np.uint64))
    a.merge(b)
    assert a.parts[0].estimate_keys(np.array([1], dtype=np.uint64))[0] == 2
    with pytest.raises(ValueError):
        a.merge(TupleState(()))


def test_top_suppliers_countsketch_vs_exact(ray_session, sf_dir):
    """The refined pipeline's candidate set and estimates vs the exact
    groupby answer: same keys, estimates within the L2 bound (exact here —
    supplier cardinality is far below the column count)."""
    from epichypersketch_jl_ray.pipelines.relational import top_suppliers
    from epichypersketch_jl_ray.pipelines.sketches import top_suppliers_countsketch

    got = top_suppliers_countsketch(sf_dir)
    want = top_suppliers(sf_dir).to_pandas()
    assert list(got["l_suppkey"]) == list(want["l_suppkey"])
    assert np.array_equal(
        got["revenue_cents_est"].to_numpy(), want["revenue_cents"].to_numpy()
    )
