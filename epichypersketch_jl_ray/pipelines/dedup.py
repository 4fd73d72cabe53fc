"""Dedup pipelines over the documents table (exact / MinHash-LSH / SimHash /
exact n-gram Jaccard)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data.aggregate import Count, Min

from epichypersketch_jl_ray.functions.text import word_shingle_hashes
from epichypersketch_jl_ray.sources.tables import read_table
from epichypersketch_jl_ray.stages.dedup import (
    SignatureStage,
    candidate_pairs_from_band,
    exact_jaccard,
    md5_hex,
    simhash_candidates_from_chunk,
    simhash_stage,
)
from epichypersketch_jl_ray.state.minhash import hamming_distance64

SHINGLE_N = 3


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: md5(text) groups, keep min doc_id (hash-partition +
    per-group first — the standard exact-dedup shuffle)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def key(batch: pa.Table) -> pa.Table:
        return pa.table({"text_hash": md5_hex(batch["text"]), "doc_id": batch["doc_id"]})

    return (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="dup_count"))
    )


def dedup_exact_sql() -> str:
    return """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents GROUP BY 1
"""


def dedup_minhash_lsh(
    sf_dir: str, *, threshold: float = 0.5, num_perms: int = 128, bands: int = 64
) -> pd.DataFrame:
    """Near-dup pairs via MinHash-LSH banding + exact Jaccard verification.

    bands=64 x rows=2: P(candidate | J) = 1-(1-J^2)^64 — for J>=0.5 the miss
    probability is (3/4)^64 ~ 1e-8, so at fixture scale the verified output
    equals the exact-Jaccard oracle.

    ONE read of the corpus: the shingle-hash table is computed once,
    materialized (hashes only — tiny relative to the text), and reused by
    both the banding branch and the candidate verification branch.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def shingle_table(batch: pa.Table) -> pa.Table:
        sh, off = word_shingle_hashes(batch["text"], n=SHINGLE_N)
        lists = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32), pa.int32()), pa.array(sh.view(np.int64), pa.int64())
        )
        return pa.table({"doc_id": batch["doc_id"], "shingles": lists})

    shingles = ds.map_batches(shingle_table, batch_format="pyarrow").materialize()

    sig = SignatureStage(num_perms=num_perms, bands=bands, shingle_n=SHINGLE_N)

    def band_rows(batch: pa.Table) -> pa.Table:
        return sig.from_shingle_table(batch)

    exploded = shingles.map_batches(band_rows, batch_format="pyarrow", batch_size=2048)
    cand = (
        exploded.groupby("band_bucket")
        .map_groups(candidate_pairs_from_band, batch_format="pyarrow")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
        )
    pairs = cand.drop_duplicates().to_numpy()
    wanted = np.unique(pairs.ravel())

    def pick(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch["doc_id"].to_numpy(zero_copy_only=False), wanted)
        return batch.filter(pa.array(mask))

    sets = {}
    for row in shingles.map_batches(pick, batch_format="pyarrow").take_all():
        sets[int(row["doc_id"])] = np.sort(
            np.asarray(row["shingles"], dtype=np.int64).view(np.uint64)
        )
    jac = exact_jaccard(pairs, sets)
    keep = jac >= threshold
    out = pd.DataFrame(
        {"doc_a": pairs[keep, 0], "doc_b": pairs[keep, 1], "jaccard": jac[keep]}
    ).sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)


def dedup_minhash_lsh_sql(threshold: float = 0.5) -> str:
    """Exact n-gram Jaccard oracle (all pairs >= threshold)."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text,' ') toks FROM documents),
s AS (SELECT DISTINCT doc_id, toks[i]||' '||toks[i+1]||' '||toks[i+2] sh
      FROM t, LATERAL unnest(range(1, len(toks)-1)) r(i)),
sz AS (SELECT doc_id, count(*) n FROM s GROUP BY 1),
inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i
          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
j AS (SELECT da, db, i::DOUBLE / (x.n + y.n - i) jac FROM inter
      JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db)
SELECT da AS doc_a, db AS doc_b, jac AS jaccard FROM j WHERE jac >= {threshold}
"""


def dedup_embedding(sf_dir: str, *, threshold: float = 0.45) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs over the embeddings table.

    Brute-force blocked float64 matmul (one block vs the broadcast full
    matrix per batch) — exact, so the DuckDB list_cosine_similarity oracle
    hash-matches. At cluster scale the same stage runs after LSH bucketing
    (random hyperplane signs) to prune candidate blocks.
    """
    import ray as _ray

    from epichypersketch_jl_ray.stages.ann import _embedding_matrix

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # broadcast the full (normalized) matrix once
    full = ds.materialize()
    rows = full.take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat_n = mat / np.where(norms == 0, 1, norms)
    ref = _ray.put((ids, mat_n))

    def block_pairs(batch: pa.Table) -> pa.Table:
        bid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = _embedding_matrix(batch, "embedding")
        n = np.linalg.norm(e, axis=1, keepdims=True)
        e = e / np.where(n == 0, 1, n)
        aids, amat = _ray.get(ref)
        sims = e @ amat.T  # (nb, N)
        ii, jj = np.nonzero(sims >= threshold)
        keep = bid[ii] < aids[jj]  # each unordered pair once
        return pa.table(
            {
                "vec_a": pa.array(bid[ii][keep], pa.int64()),
                "vec_b": pa.array(aids[jj][keep], pa.int64()),
                "cosine": pa.array(np.round(sims[ii, jj][keep], 12), pa.float64()),
            }
        )

    out = full.map_batches(block_pairs, batch_format="pyarrow", batch_size=1024).to_pandas()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def dedup_embedding_sql(threshold: float = 0.45) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 12) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {threshold}
"""


def dedup_simhash(sf_dir: str, *, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs via SimHash 4x16-bit pigeonhole banding — exact for
    hamming <= 3*16/..: any pair within hamming 3 shares a chunk. Rows-only
    check (simhash not SQL-expressible)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cand = (
        ds.map_batches(simhash_stage, batch_format="pyarrow")
        .groupby("chunk_bucket")
        .map_groups(simhash_candidates_from_chunk, batch_format="pyarrow")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []}).astype("int64")
    cand = cand.drop_duplicates(subset=["doc_a", "doc_b"])
    ham = hamming_distance64(
        cand["sim_a"].to_numpy().view(np.uint64), cand["sim_b"].to_numpy().view(np.uint64)
    )
    keep = ham <= max_hamming
    out = pd.DataFrame(
        {
            "doc_a": cand["doc_a"].to_numpy()[keep],
            "doc_b": cand["doc_b"].to_numpy()[keep],
            "hamming": ham[keep].astype(np.int64),
        }
    ).sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)
