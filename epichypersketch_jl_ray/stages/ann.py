"""Approximate-nearest-neighbour stages over an embedding column.

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
broadcast query matrix (ray.put once, fetched once per actor), per-batch
partial top-k, tiny driver-side final merge. Scale path: LSH bucketing via
random hyperplane signs (SimHash over embeddings) to prune candidates —
same harness, bucket column + groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(len(arr), dim)


class BruteForceTopK:
    """Actor stage: per-batch cosine top-k against the broadcast queries."""

    def __init__(self, query_ref, *, k: int = 10, id_col: str = "vec_id", col: str = "embedding"):
        q_ids, q = ray.get(query_ref) if not isinstance(query_ref, tuple) else query_ref
        self.q_ids = np.asarray(q_ids, dtype=np.int64)
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        self.q = q / np.where(qn == 0, 1, qn)
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _embedding_matrix(batch, self.col)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        norms = np.linalg.norm(e, axis=1, keepdims=True)
        e = e / np.where(norms == 0, 1, norms)
        sims = self.q @ e.T  # (nq, nb)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        nq = len(self.q_ids)
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.q_ids, k), pa.int64()),
                "neighbor_id": pa.array(ids[part].ravel(), pa.int64()),
                "sim": pa.array(np.take_along_axis(sims, part, axis=1).ravel(), pa.float64()),
            }
        )


class LSHBuckets:
    """Random-hyperplane LSH bucketing (the scale path: prune candidates to
    matching sign-signature buckets before the exact matmul). Hyperplanes are
    seeded so every worker derives identical buckets."""

    def __init__(self, dim: int, *, bits: int = 8, seed: int = 31) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))
        self.bits = bits

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (mat @ self.planes) > 0
        out = np.zeros(len(mat), dtype=np.int64)
        for b in range(self.bits):
            out |= signs[:, b].astype(np.int64) << b
        return out


def distributed_topk(candidates: ray.data.Dataset, *, k: int = 10) -> ray.data.Dataset:
    """DISTRIBUTED final top-k reduce: groupby(query_id) co-locates each
    query's per-block partial top-ks, one vectorized per-group merge emits
    exactly k (query_id, neighbor_id, rank) rows. The candidate stream
    (blocks × queries × k rows) never touches the driver — at 100 TB that
    stream is millions of rows while the result stays queries × k."""

    def topk_group(group: pa.Table) -> pa.Table:
        sims = group["sim"].to_numpy(zero_copy_only=False)
        ids = group["neighbor_id"].to_numpy(zero_copy_only=False)
        qid = group["query_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -sims))[:k]  # sim desc, neighbor_id asc
        return pa.table(
            {
                "query_id": pa.array(qid[order], pa.int64()),
                "neighbor_id": pa.array(ids[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64), pa.int64()),
            }
        )

    return candidates.groupby("query_id").map_groups(topk_group, batch_format="pyarrow")


