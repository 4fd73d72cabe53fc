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

    out = dedup_minhash_lsh(sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    truth = con.sql(dedup_minhash_lsh_sql()).df()
    got = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    want = set(zip(truth["doc_a"].astype(int), truth["doc_b"].astype(int)))
    assert got == want


def test_minhash_lsh_distributed_verification_at_10x_candidates(ray_session, tmp_path):
    """The distributed verification path (bucketed attach + vectorized
    Jaccard) at ~10x the sf-fixture candidate-pair count: 40 near-dup
    families x 8 docs each -> >1000 candidate pairs, all verified exactly."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from epichypersketch_jl_ray.pipelines.dedup import dedup_minhash_lsh, dedup_minhash_lsh_sql

    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(500)]
    docs, ids = [], []
    doc_id = 0
    for fam in range(40):
        base = list(rng.choice(vocab, size=30))
        for member in range(8):
            words = list(base)
            # light mutation keeps Jaccard mostly >= 0.5
            for _ in range(int(rng.integers(0, 4))):
                words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
            docs.append(" ".join(words))
            ids.append(doc_id)
            doc_id += 1
    for _ in range(100):  # noise docs
        docs.append(" ".join(rng.choice(vocab, size=25)))
        ids.append(doc_id)
        doc_id += 1
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs, pa.string())}),
        sf / "documents.parquet",
    )
    out = dedup_minhash_lsh(str(sf)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    truth = con.sql(dedup_minhash_lsh_sql()).df()
    assert len(truth) > 250  # the fixture really is ~10x the sf candidate count
    got = set(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)))
    want = set(zip(truth["doc_a"].astype(int), truth["doc_b"].astype(int)))
    assert got == want
    jac = dict(zip(zip(out["doc_a"].astype(int), out["doc_b"].astype(int)), out["jaccard"]))
    tru = dict(zip(zip(truth["doc_a"].astype(int), truth["doc_b"].astype(int)), truth["jaccard"]))
    assert all(abs(jac[k] - tru[k]) < 1e-12 for k in want)


def test_embedding_lsh_recall_vs_exact(ray_session, sf_dir):
    """The LSH-bucketed approximate variant: precision 1 (every emitted
    cosine is exact and >= threshold) and high recall on the fixture's
    qualifying pairs vs the exact block-pair pipeline."""
    from epichypersketch_jl_ray.pipelines.dedup import dedup_embedding, dedup_embedding_lsh

    exact = dedup_embedding(sf_dir).to_pandas()
    approx = dedup_embedding_lsh(sf_dir).to_pandas()
    want = set(zip(exact["vec_a"].astype(int), exact["vec_b"].astype(int)))
    got = set(zip(approx["vec_a"].astype(int), approx["vec_b"].astype(int)))
    assert got <= want  # precision 1: no pair below threshold can appear
    if want:
        recall = len(got & want) / len(want)
        assert recall >= 0.5, f"recall {recall:.2f} over {len(want)} pairs"
