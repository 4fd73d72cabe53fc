"""Fixed-point PageRank: hand-checkable tiny graph, byte-exact SQL-oracle
parity, partition invariance, and mass bounds."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from epichypersketch_jl_ray.pipelines.graph import (
    BASE,
    DAMP_DEN,
    DAMP_NUM,
    FP_ONE,
    copurchase_pagerank,
    copurchase_pagerank_sql,
    pagerank_fixedpoint,
)


def _local_pagerank(edges: list[tuple[int, int]], n_iters: int) -> dict[int, int]:
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    rank = {n: FP_ONE for n in nodes}
    for _ in range(n_iters):
        s_in = {n: 0 for n in nodes}
        for s, d in edges:
            s_in[d] += rank[s] // deg[s]
        rank = {n: BASE + (DAMP_NUM * s_in[n]) // DAMP_DEN for n in nodes}
    return rank


def test_tiny_graph_hand_checked(ray_session):
    import ray

    # triangle + pendant: 1<->2, 2<->3, 3<->1, 3<->4
    und = [(1, 2), (2, 3), (3, 1), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges])
    nodes, rank = pagerank_fixedpoint(ds, n_iters=6)
    want = _local_pagerank(edges, 6)
    assert {int(n): int(r) for n, r in zip(nodes, rank)} == want
    # the 3-degree hub must outrank the pendant
    got = dict(zip(nodes.tolist(), rank.tolist()))
    assert got[3] > got[4]
    # partition invariance: byte-identical under a different block split
    nodes2, rank2 = pagerank_fixedpoint(ds.repartition(7), n_iters=6)
    assert np.array_equal(nodes, nodes2) and np.array_equal(rank, rank2)


def test_copurchase_pagerank_matches_sql(ray_session, sf_dir):
    import sys

    sys.path.insert(0, "tests")
    from oracle_util import compare, duck_con, to_pandas

    for iters in (1, 10):
        got = to_pandas(copurchase_pagerank(sf_dir, n_iters=iters))
        exp = duck_con(sf_dir).execute(copurchase_pagerank_sql(iters)).df()
        assert compare(f"pagerank_{iters}", got, exp) == []


def test_mass_bound(ray_session, sf_dir):
    """Total fixed-point mass stays within n*FP_ONE (floor divisions only
    ever LOSE mass, never create it)."""
    t = copurchase_pagerank(sf_dir, n_iters=4)
    total = int(pa.compute.sum(t["rank_fp"]).as_py())
    n = len(t)
    assert n * BASE <= total <= n * FP_ONE


def test_driver_combine_equals_groupby_path(ray_session):
    """Size-gated combine paths are byte-identical (integer sums)."""
    import ray

    und = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1)]
    edges = und + [(b, a) for a, b in und]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(4)
    n1, r1 = pagerank_fixedpoint(ds, n_iters=8, driver_combine=True)
    n2, r2 = pagerank_fixedpoint(ds, n_iters=8, driver_combine=False)
    assert np.array_equal(n1, n2) and np.array_equal(r1, r2)


def test_actor_engine_equals_dataset_engine(ray_session):
    """The edge-shard actor engine (default) is byte-identical to the
    Dataset engine on the same edges."""
    import ray

    und = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1), (2, 5)]
    edges = und + [(b, a) for a, b in und]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(5)
    n1, r1 = pagerank_fixedpoint(ds, n_iters=9, engine="actors")
    n2, r2 = pagerank_fixedpoint(ds, n_iters=9, engine="dataset")
    assert np.array_equal(n1, n2) and np.array_equal(r1, r2)


def test_empty_edge_set(ray_session):
    import pyarrow as pa
    import ray

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    for engine in ("actors", "dataset"):
        nodes, rank = pagerank_fixedpoint(empty, n_iters=3, engine=engine)
        assert len(nodes) == 0 and len(rank) == 0


def test_actor_engine_survives_shard_kill(ray_session):
    """Kill an _EdgeShard actor mid-run: the engine re-ingests the shard
    from the pinned edge blocks and the result is byte-identical to an
    undisturbed run (and to the Dataset engine)."""
    import ray
    from ray.data.aggregate import Count

    from epichypersketch_jl_ray.pipelines.graph import (
        _iterate_actor_shards,
        pagerank_fixedpoint,
    )

    und = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1), (2, 5), (4, 1)]
    edges = und + [(b, a) for a, b in und]
    ds = ray.data.from_items([{"src": s, "dst": d} for s, d in edges]).repartition(4)

    nodes_ref, rank_ref = pagerank_fixedpoint(ds, n_iters=7, engine="dataset")

    mat = ds.materialize()
    deg_rows = mat.groupby("src").aggregate(Count(alias_name="d")).take_all()
    nodes = np.array(sorted(r["src"] for r in deg_rows), dtype=np.int64)
    deg = np.array(
        [d for _, d in sorted((r["src"], r["d"]) for r in deg_rows)], dtype=np.int64
    )
    assert np.array_equal(nodes, nodes_ref)

    killed = []

    def kill_one(it, shards):
        if it == 3 and shards:
            ray.kill(shards[0], no_restart=True)
            killed.append(True)

    rank = _iterate_actor_shards(mat, nodes, deg, n_iters=7, _iteration_hook=kill_one)
    assert killed, "hook never fired"
    assert np.array_equal(rank, rank_ref)
