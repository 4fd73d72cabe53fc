"""Deduplication stages: exact, MinHash-LSH, SimHash.

Training-data dedup operators (absent from the reference, SURVEY.md §2.7).
Partitioning strategy (documented per the north_rule):

- exact: hash-partition on content hash (a groupby shuffle), keep
  min-id per group — one all-to-all, no driver loop.
- MinHash-LSH: signatures per doc (map_batches, stateless) → explode one row
  per (band_key, doc) → groupby(band_key) emits candidate pairs — the shuffle
  key is the band bucket, so co-occurrence is locality, not luck. Candidates
  are then EXACT-verified so banding can only lose pairs, never invent them;
  band parameters are chosen so P(miss | J >= tau) < 1e-7.
- SimHash: 64-bit fingerprint split into 4 16-bit chunks; pigeonhole
  guarantees any pair within hamming distance 3 shares >= 1 chunk, so a
  groupby on (chunk_idx, chunk_value) finds ALL such pairs exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from epichypersketch_jl_ray.functions.text import word_shingle_hashes
from epichypersketch_jl_ray.state.minhash import MinHasher, hamming_distance64, simhash64_batch


def md5_hex(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """md5 hex digest per row (matches DuckDB md5()); per-row C calls —
    acceptable off the hot path, exact-dedup key parity with SQL."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pa.array([hashlib.md5(t.encode()).hexdigest() for t in texts.to_pylist()], pa.string())


class SignatureStage:
    """Actor stage: doc text -> minhash signature + band keys (stateful:
    permutations built once per actor)."""

    def __init__(self, *, num_perms: int = 128, bands: int = 64, shingle_n: int = 3, seed: int = 99):
        self.mh = MinHasher(num_perms=num_perms, seed=seed)
        self.bands = bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh, off = word_shingle_hashes(batch["text"], n=self.shingle_n)
        sigs = self.mh.signatures(sh, off)
        keys = self.mh.band_keys(sigs, self.bands)  # (n, bands)
        n = len(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # explode: one row per (band, doc)
        return pa.table(
            {
                "band_key": pa.array(keys.ravel().view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(doc_ids, self.bands), pa.int64()),
            }
        )


def candidate_pairs_from_band(batch: pa.Table) -> pa.Table:
    """map_groups fn: all (a<b) doc pairs sharing a band bucket."""
    docs = np.unique(batch["doc_id"].to_numpy(zero_copy_only=False))
    if len(docs) < 2:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    ii, jj = np.triu_indices(len(docs), k=1)
    return pa.table(
        {"doc_a": pa.array(docs[ii], pa.int64()), "doc_b": pa.array(docs[jj], pa.int64())}
    )


def exact_jaccard(
    pairs: np.ndarray, shingle_sets: dict[int, np.ndarray]
) -> np.ndarray:
    """Exact Jaccard for candidate pairs given doc_id -> sorted distinct
    shingle-hash arrays."""
    out = np.empty(len(pairs), dtype=np.float64)
    for i, (a, b) in enumerate(pairs):
        sa, sb = shingle_sets[int(a)], shingle_sets[int(b)]
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        out[i] = inter / union if union else 0.0
    return out


def simhash_stage(batch: pa.Table) -> pa.Table:
    """doc text -> 64-bit simhash + 4 chunk rows for pigeonhole banding."""
    from epichypersketch_jl_ray.functions.text import token_hashes

    flat, off = token_hashes(batch["text"])
    sh = simhash64_batch(flat, off)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    chunks = np.empty((len(sh), 4), dtype=np.int64)
    for c in range(4):
        chunks[:, c] = ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
    return pa.table(
        {
            "chunk_key": pa.array(
                (chunks + (np.arange(4, dtype=np.int64) * 65536)[None, :]).ravel(), pa.int64()
            ),
            "doc_id": pa.array(np.repeat(doc_ids, 4), pa.int64()),
            "simhash": pa.array(np.repeat(sh.view(np.int64), 4), pa.int64()),
        }
    )


def simhash_candidates_from_chunk(batch: pa.Table) -> pa.Table:
    docs = batch["doc_id"].to_numpy(zero_copy_only=False)
    sh = batch["simhash"].to_numpy(zero_copy_only=False)
    uniq, idx = np.unique(docs, return_index=True)
    if len(uniq) < 2:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "sim_a": pa.array([], pa.int64()),
                "sim_b": pa.array([], pa.int64()),
            }
        )
    sh = sh[idx]
    ii, jj = np.triu_indices(len(uniq), k=1)
    return pa.table(
        {
            "doc_a": pa.array(uniq[ii], pa.int64()),
            "doc_b": pa.array(uniq[jj], pa.int64()),
            "sim_a": pa.array(sh[ii], pa.int64()),
            "sim_b": pa.array(sh[jj], pa.int64()),
        }
    )
