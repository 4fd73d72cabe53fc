"""Dedup pipeline correctness beyond the oracle harness: SimHash pigeonhole
completeness vs brute force; MinHash-LSH no-miss at fixture scale."""

import numpy as np
import pytest


def test_simhash_pipeline_complete_vs_bruteforce(ray_session, sf_dir):
    import pyarrow.parquet as pq

    from epichypersketch_jl_ray.functions.text import token_hashes
    from epichypersketch_jl_ray.pipelines.dedup import dedup_simhash
    from epichypersketch_jl_ray.state.minhash import hamming_distance64, simhash64_batch

    out = dedup_simhash(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    flat, off = token_hashes(tbl["text"].combine_chunks())
    sh = simhash64_batch(flat, off)
    ids = tbl["doc_id"].to_numpy()
    # brute force: all pairs hamming <= 3
    expected = set()
    for i in range(len(ids)):
        d = hamming_distance64(np.full(len(ids) - i - 1, sh[i]), sh[i + 1 :])
        for j in np.flatnonzero(d <= 3):
            a, b = int(ids[i]), int(ids[i + 1 + j])
            expected.add((min(a, b), max(a, b)))
    got = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    assert got == expected  # pigeonhole banding is exact for hamming <= 3


def test_minhash_lsh_matches_exact_jaccard(ray_session, sf_dir):
    import duckdb

    from epichypersketch_jl_ray.pipelines.dedup import dedup_minhash_lsh, dedup_minhash_lsh_sql

    out = dedup_minhash_lsh(sf_dir)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    truth = con.sql(dedup_minhash_lsh_sql()).df()
    got = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    want = set(zip(truth["doc_a"].astype(int), truth["doc_b"].astype(int)))
    assert got == want
