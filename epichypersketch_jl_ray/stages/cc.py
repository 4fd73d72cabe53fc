"""Distributed connected components over an edge/pair Dataset.

Two-phase star contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public paper;
independent numpy/Ray implementation):

  large-star(u): for every neighbor v > u, emit (v, m) with
                 m = min(N(u) | {u})
  small-star(u): for every v in {u} | {neighbors <= u}, emit (v, m)

Alternating the two passes preserves connectivity and monotonically shrinks
the graph until every component is a star rooted at its minimum node —
O(log^2 n) rounds in the worst case, 2-4 rounds for the shallow clusters
real near-dup graphs produce. Each pass is ONE bucketed groupby (bucket =
hash(center) % B) whose per-bucket body is fully vectorized (one lexsort +
run-length segment mins) — no joins, no per-node Python, no driver-side
edge materialization. The driver only sees three scalars per round (edge
count + two independent 40-bit hash sums) for the fixpoint test, so the
pair volume a 100 TB near-dup scan produces streams through the same
groupby machinery as any other table.

This is the transitive-closure step real corpus dedup needs: pair-wise
removal (drop doc_b of every verified pair) misses nodes that are only
transitively duplicated — components drop everything but the cluster
minimum (pipelines/curate.py curate_corpus_cc). The reference has no dedup
at all; this extends the mandate's curation chain.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Count, Min, Sum

from epichypersketch_jl_ray.functions.hashing import hash_int64


def _empty_components() -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
    )


def _star_pass(
    edges: ray.data.Dataset, *, large: bool, num_buckets: int, dedupe: bool = True
) -> ray.data.Dataset:
    """One large-star or small-star pass: symmetrize, bucket by center node,
    vectorized per-bucket segment-min emit, canonical (u < v) dedupe.

    ``dedupe=False`` skips the output's (u, v) dedupe groupby. Safe when
    the NEXT consumer is another star pass: min over a neighbor MULTISET
    equals min over the set, so duplicate edges (<= 2x volume) cannot
    change any emitted label — the round loop dedupes once per round
    (after small-star) instead of twice, 3 shuffles per round instead
    of 4. The fingerprint/fixpoint test always runs on DEDUPED output."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        c = np.concatenate([u, v])
        n = np.concatenate([v, u])
        b = (hash_int64(c, seed=13) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "c": pa.array(c, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "b": pa.array(b, pa.int64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        c = group["c"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, c))
        c, n = c[order], n[order]
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        counts = np.diff(np.append(starts, len(c)))
        # n is sorted within each center segment, so n[starts] is the min
        # neighbor; m = min(N(u) | {u})
        m = np.minimum(c[starts], n[starts])
        mrep = np.repeat(m, counts)
        if large:
            mask = n > c
            src, dst = n[mask], mrep[mask]
        else:
            mask = n <= c
            # {neighbors <= u} plus u itself
            src = np.concatenate([n[mask], c[starts]])
            dst = np.concatenate([mrep[mask], m])
        keep = src != dst
        src, dst = src[keep], dst[keep]
        return pa.table(
            {
                "u": pa.array(np.minimum(src, dst), pa.int64()),
                "v": pa.array(np.maximum(src, dst), pa.int64()),
            }
        )

    out = (
        edges.map_batches(symmetrize, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    if not dedupe:
        return out
    return (
        out.groupby(["u", "v"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )


# 40-bit terms: up to 2^23 edges sum within int64 (2^63); beyond that the
# sum wraps mod 2^64 — deterministic and order-insensitive, so fingerprint
# EQUALITY (the only use) stays sound at any edge count.
_FP_MOD = np.uint64(1 << 40)


def _fingerprint(edges: ray.data.Dataset) -> tuple[int, int, int]:
    """(count, hashsum, hashsum') — an order-insensitive edge-multiset
    fingerprint computed distributed; the driver sees three scalars."""

    def sums(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        key = hash_int64(u, seed=101) ^ hash_int64(v, seed=202)
        h1 = (hash_int64(key.view(np.int64), seed=7) % _FP_MOD).astype(np.int64)
        h2 = (hash_int64(key.view(np.int64), seed=8) % _FP_MOD).astype(np.int64)
        return pa.table(
            {
                "cnt": pa.array([len(u)], pa.int64()),
                "h1": pa.array([int(h1.sum())], pa.int64()),
                "h2": pa.array([int(h2.sum())], pa.int64()),
            }
        )

    agg = edges.map_batches(sums, batch_format="pyarrow").aggregate(
        Sum("cnt", alias_name="cnt"), Sum("h1", alias_name="h1"), Sum("h2", alias_name="h2")
    )
    return (agg["cnt"] or 0, agg["h1"] or 0, agg["h2"] or 0)


def _single_task_components(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Union-find over the whole (small) edge set inside ONE Ray task —
    the size-aware shortcut: each alternating star round costs ~4 shuffle
    stages of fixed overhead, which dwarfs the work when the verified pair
    set is thousands of rows (the common case: near-dups are rare)."""

    def whole(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(inv[: len(u)].tolist(), inv[len(u) :].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min NODE id, so every root is its component min
                if nodes[ra] < nodes[rb]:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        roots = np.array([find(i) for i in range(len(nodes))], dtype=np.int64)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "component": pa.array(nodes[roots], pa.int64()),
            }
        )

    return edges.repartition(1).map_batches(whole, batch_format="pyarrow", batch_size=None)


def connected_components(
    pairs: ray.data.Dataset,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    num_buckets: int = 16,
    max_rounds: int = 64,
    single_task_threshold: int = 1_000_000,
) -> ray.data.Dataset:
    """(node, component) for every node appearing in ``pairs``; component is
    the minimum node id of the node's connected component.

    Size-aware (same strategy as the adaptive joins): an edge set at or
    below ``single_task_threshold`` rows runs as one union-find Ray task;
    larger sets run the distributed star rounds. Both paths are equal by
    construction and pinned together by tests (threshold=0 forces the star
    path)."""

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch[src].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = batch[dst].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table(
            {
                "u": pa.array(np.minimum(a, b), pa.int64()),
                "v": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty_components()
    if n_edges <= single_task_threshold:
        return _single_task_components(edges)

    fp = _fingerprint(edges)
    for _ in range(max_rounds):
        edges = _star_pass(edges, large=True, num_buckets=num_buckets, dedupe=False)
        edges = _star_pass(edges, large=False, num_buckets=num_buckets).materialize()
        new_fp = _fingerprint(edges)
        # probabilistic fixpoint test: equal count + two independent 40-bit
        # hash sums. A collision (different edge multisets, same triple;
        # ~2^-80 per round) would stop early and emit wrong components —
        # accepted trade for never shipping the edge set to the driver.
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    # fixpoint: every component is a star (root=u=min, child=v); labels are
    # the star edges plus each root labeling itself
    def to_labels(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([v, u]), pa.int64()),
                "component": pa.array(np.concatenate([u, u]), pa.int64()),
            }
        )

    return (
        edges.map_batches(to_labels, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("component", alias_name="component"))
    )
