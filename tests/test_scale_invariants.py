"""Scale-critical invariants: int64 counter headroom (the reference's Int32
counters overflow at 10^12 rows, SURVEY.md §7.4), and bit-identical results
across batch sizes / parallelism (the N-vs-4N reproducibility argument)."""

import numpy as np
import pandas as pd

from epichypersketch_jl_ray.state.countmin import CountMin
from epichypersketch_jl_ray.state.hll import HyperLogLog


def test_countmin_counters_beyond_int32():
    """Weighted inserts past 2^31 — the exact point where the reference's
    Int32 sketch (/root/reference/src/sketch.jl:59) would wrap negative."""
    cm = CountMin(1, delta=0.01, epsilon=0.01, seed=3)
    big = np.int64(3_000_000_000)  # > 2^31 - 1
    cm.add(np.array([[7]]), weights=np.array([big]))
    cm.add(np.array([[7]]), weights=np.array([big]))
    assert cm.estimate(np.array([[7]]))[0] == 2 * big
    assert cm.n_inserts == 2 * big
    # survives serialization and merge
    other = CountMin.from_bytes(cm.to_bytes())
    cm.merge(other)
    assert cm.estimate(np.array([[7]]))[0] == 4 * big


def test_motif_results_invariant_to_batch_size(ray_session):
    """Same activation input, different map_batches batch sizes -> identical
    output rows and estimates (batching must never leak into results)."""
    from epichypersketch_jl_ray.pipelines.motifs import motif_pipeline
    from epichypersketch_jl_ray.api import activation_table_from_dict
    from epichypersketch_jl_ray.sources.reference_fixtures import make_ordinary_dict
    import ray.data

    tbl, _ = activation_table_from_dict(make_ordinary_dict())
    outs = []
    for bs in (64, 2048):
        ds = ray.data.from_arrow(tbl)
        df = motif_pipeline(ds, motif_size=3, min_count=8, batch_size=bs).to_pandas()
        cols = sorted(df.columns)
        outs.append(df[cols].sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_hll_register_merge_is_max_not_add():
    """Merging the same data twice must NOT inflate the estimate."""
    from epichypersketch_jl_ray.functions.hashing import hash_int64

    keys = hash_int64(np.arange(5000), seed=2)
    a = HyperLogLog(p=12).update_hashed(keys)
    b = HyperLogLog(p=12).update_hashed(keys)
    est_before = a.estimate()
    a.merge(b)
    assert a.estimate() == est_before


def test_tree_merge_levels_equivalent(ray_session):
    """The scale path (levels>0 lazy merge stages) must produce the same
    state as the driver-only k-way merge."""
    import pyarrow as pa
    import ray.data

    from epichypersketch_jl_ray.stages.udaf import make_partial_fn, tree_merge
    from epichypersketch_jl_ray.state.hll import HyperLogLog
    from epichypersketch_jl_ray.functions.hashing import hash_int64

    ds = ray.data.range(50_000, override_num_blocks=40)

    def update(h, batch: pa.Table):
        h.update_hashed(hash_int64(batch["id"].to_numpy(), seed=3))

    partial = make_partial_fn(lambda: HyperLogLog(p=10), update)
    digests = set()
    for levels, fanout in ((0, 8), (1, 8), (2, 4), (None, 8)):
        states = ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        merged = tree_merge(states, HyperLogLog, fanout=fanout, levels=levels)
        digests.add(merged.digest())
    assert len(digests) == 1


def test_tree_merge_auto_bounds_driver_states(ray_session, monkeypatch):
    """AUTO tree_merge (levels=None, the default) with a forced 10k-partial
    run: the driver must deserialize at most fanout**2 states — everything
    else is pre-merged by remote tasks over object-store block refs. The
    counter is a driver-process monkeypatch; remote workers import the
    library fresh, so only driver-side from_bytes calls are counted."""
    import pyarrow as pa
    import ray.data

    from epichypersketch_jl_ray.functions.hashing import hash_int64
    from epichypersketch_jl_ray.stages.udaf import tree_merge

    n_partials, per_block, fanout = 10_000, 10, 8
    partial_bytes = []
    reference = HyperLogLog(p=4)
    for i in range(n_partials):
        h = HyperLogLog(p=4)
        keys = hash_int64(np.arange(i * 3, i * 3 + 3), seed=9)
        h.update_hashed(keys)
        reference.update_hashed(keys)
        partial_bytes.append(h.to_bytes())
    tables = [
        pa.table({"state": pa.array(partial_bytes[i : i + per_block], pa.large_binary())})
        for i in range(0, n_partials, per_block)
    ]
    states = ray.data.from_arrow(tables)  # 1000 blocks x 10 states

    calls = {"n": 0}
    orig = HyperLogLog.from_bytes.__func__

    def counting_from_bytes(cls, data):
        calls["n"] += 1
        return orig(cls, data)

    monkeypatch.setattr(HyperLogLog, "from_bytes", classmethod(counting_from_bytes))
    merged = tree_merge(states, HyperLogLog, fanout=fanout)
    assert calls["n"] <= fanout * fanout, calls["n"]
    assert merged.digest() == reference.digest()


def test_motif_k2(ray_session):
    """motif_size=2 (pairs) works end-to-end, ordinary and conv."""
    from epichypersketch_jl_ray.api import obtain_enriched_configurations

    d = {i: [(5, 1.0), (9, 2.0), (100 + i, 1.0)] for i in range(1, 11)}
    out = obtain_enriched_configurations(d, motif_size=2, min_count=10)
    pair = out[(out.m1 == 5) & (out.m2 == 9)]
    assert len(pair) == 10
    assert (pair["estimate"] == 10).all()
    assert np.allclose(pair["contribution"], 3.0)

    dc = {i: [(5, 1.0, 0), (9, 1.0, 12)] for i in range(1, 11)}
    outc = obtain_enriched_configurations(dc, motif_size=2, min_count=10, filter_len=8)
    assert len(outc) == 10
    assert (outc["d12"] == 4).all()
    assert (outc["end"] == 19).all()


def test_motif_spill_dir_equals_materialized(ray_session, tmp_path):
    """The parquet-spill two-pass variant must equal the materialized one."""
    import pandas as pd
    import ray.data

    from epichypersketch_jl_ray.api import activation_table_from_dict
    from epichypersketch_jl_ray.pipelines.motifs import motif_pipeline
    from epichypersketch_jl_ray.sources.reference_fixtures import make_ordinary_dict

    tbl, _ = activation_table_from_dict(make_ordinary_dict())
    a = motif_pipeline(ray.data.from_arrow(tbl), motif_size=3, min_count=8).to_pandas()
    b = motif_pipeline(
        ray.data.from_arrow(tbl), motif_size=3, min_count=8, spill_dir=str(tmp_path / "act")
    ).to_pandas()
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_tree_merge_auto_equals_levels_for_coo_countmin(ray_session):
    """The COO CountMin regression guard: the auto path's k-way merge_many
    must produce byte-identical state to the levels path (round-4 found the
    pairwise fold was quadratic AND order-sensitive flushes could diverge;
    this pins both semantics and determinism, sparse and densified)."""
    import pyarrow as pa
    import ray.data

    from epichypersketch_jl_ray.functions.hashing import hash_int64
    from epichypersketch_jl_ray.stages.udaf import make_partial_fn, tree_merge
    from epichypersketch_jl_ray.state.countmin import CountMin

    def update(cm, batch: pa.Table):
        ids = batch["id"].to_numpy()
        cm.add_keys(hash_int64(ids % 997, seed=4))

    for eps, n in ((1e-5, 30_000), (1e-2, 30_000)):  # sparse regime, dense regime
        ds = ray.data.range(n, override_num_blocks=32)
        partial = make_partial_fn(lambda: CountMin(1, delta=0.01, epsilon=eps, seed=5), update)
        digests = set()
        for levels, fanout in ((0, 8), (None, 8), (None, 3)):
            states = ds.map_batches(partial, batch_format="pyarrow", batch_size=1024)
            merged = tree_merge(states, CountMin, fanout=fanout, levels=levels)
            digests.add(merged.digest())
        assert len(digests) == 1, f"eps={eps}: {digests}"


def test_motif_exact_verify_survives_coarse_sketch(ray_session):
    """A deliberately under-sized CMS (55 columns — massive collisions) must
    still produce EXACTLY the collision-free output: the exact-verify tail
    (pipelines/motifs._exact_support_correct) drops CMS false survivors and
    replaces inflated estimates with exact counts. Guards the round-4
    sf0.1 finding that no fixed geometry stays collision-free as the
    distinct-combination count grows."""
    import pandas as pd
    import ray.data

    from epichypersketch_jl_ray.api import activation_table_from_dict
    from epichypersketch_jl_ray.pipelines.motifs import motif_pipeline
    from epichypersketch_jl_ray.sources.reference_fixtures import make_ordinary_dict

    tbl, _ = activation_table_from_dict(make_ordinary_dict())
    outs = []
    for delta, eps in ((9e-3, 3.24e-7), (0.5, 0.05)):  # exact regime vs 1x55 sketch
        ds = ray.data.from_arrow(tbl)
        df = motif_pipeline(ds, motif_size=3, min_count=8, delta=delta, epsilon=eps).to_pandas()
        cols = sorted(df.columns)
        outs.append(df[cols].sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_heavy_ngrams_exact_verify_survives_coarse_sketch(ray_session, sf_dir):
    """Same guard as the motifs one, for the n-gram heavy hitters: a 55-column
    CMS (massive collisions) must produce exactly the collision-free output —
    _dedupe_selected sums true per-batch counts and drops CMS false
    survivors."""
    import pandas as pd

    from epichypersketch_jl_ray.pipelines.ngrams import heavy_ngrams

    outs = []
    for delta, eps in ((1e-4, 6.5e-7), (0.5, 0.05)):
        df = heavy_ngrams(sf_dir, delta=delta, epsilon=eps).to_pandas()
        cols = sorted(df.columns)
        outs.append(df[cols].sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_broadcast_cache_is_bounded_lru(ray_session):
    """The per-worker broadcast memo must not grow with the number of
    broadcasts in a session: iterative engines put one node-scale vector
    per iteration, so the cache is a bounded LRU with explicit eviction
    for superseded refs."""
    import ray

    from epichypersketch_jl_ray.stages import udaf

    udaf._BROADCAST_CACHE.clear()
    refs = [ray.put(i) for i in range(udaf._BROADCAST_CACHE_MAX + 10)]
    for i, r in enumerate(refs):
        assert udaf.broadcast_get(r) == i
    assert len(udaf._BROADCAST_CACHE) == udaf._BROADCAST_CACHE_MAX
    # oldest entries evicted, newest retained (and still readable via ray.get)
    assert udaf.broadcast_get(refs[-1]) == len(refs) - 1
    assert udaf.broadcast_get(refs[0]) == 0  # re-fetch after eviction works
    # explicit eviction of a superseded ref drops it immediately
    udaf.broadcast_evict(refs[-1])
    key = refs[-1].hex()
    assert key not in udaf._BROADCAST_CACHE
    udaf._BROADCAST_CACHE.clear()
