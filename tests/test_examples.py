"""The end-to-end WARC→corpus example must run and do the arithmetic it
claims (quality drops + exact dedup + partitioned parquet out)."""

import sys

import ray


def test_warc_to_corpus_example(ray_session, tmp_path):
    sys.path.insert(0, "/root/repo/examples")
    from warc_to_corpus import curate_warc, make_fixture_warc

    plan = make_fixture_warc(str(tmp_path / "warc"), n_docs=60, n_shards=3)
    out = curate_warc(str(tmp_path / "warc"), str(tmp_path / "corpus"))
    got = ray.data.read_parquet(out)
    expect = plan["n_docs"] - plan["n_dup"] - plan["n_short"] - plan["n_spam"]
    rows = got.take_all()
    assert len(rows) == expect
    assert set(rows[0].keys()) == {"url", "text", "n_chars", "n_tokens"}
    # dedup kept the min-url copy of each duplicated body
    urls = {r["url"] for r in rows}
    assert "https://ex.com/doc0015" in urls  # original of the first planted dup
    assert "https://ex.com/doc0059" not in urls  # its duplicate
    # deterministic: a second run over the same shards produces the same set
    out2 = curate_warc(str(tmp_path / "warc"), str(tmp_path / "corpus2"))
    urls2 = {r["url"] for r in ray.data.read_parquet(out2).take_all()}
    assert urls2 == urls


def test_corpus_to_training_data_example(ray_session, tmp_path):
    """quality-classifier filter -> packed sequences -> sharded parquet;
    the packed slices must partition the survivor token stream exactly."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    import duckdb
    from corpus_to_training_data import build_training_data

    stats = build_training_data(
        "/root/testdata/sf0.001", str(tmp_path), seq_len=128, seqs_per_shard=16
    )
    assert 0 < stats["n_kept"] <= stats["n_docs"]
    assert stats["n_sequences"] >= 1

    con = duckdb.connect()
    # total packed tokens == total survivor tokens (nothing lost or doubled)
    total_sliced = con.sql(
        f"SELECT SUM(tok_end - tok_start) FROM read_parquet('{stats['out_dir']}/**/*.parquet')"
    ).fetchone()[0]
    total_tokens = con.sql(
        "SELECT SUM(len(string_split(text, ' ')))"
        f" FROM read_parquet('{tmp_path}/survivors.parquet/*.parquet')"
    ).fetchone()[0]
    assert total_sliced == total_tokens
    # every sequence but the last is exactly seq_len
    full = con.sql(
        "SELECT COUNT(*) FROM (SELECT seq_id, SUM(tok_end - tok_start) n"
        f" FROM read_parquet('{stats['out_dir']}/**/*.parquet') GROUP BY seq_id)"
        " WHERE n = 128"
    ).fetchone()[0]
    assert full >= stats["n_sequences"] - 1


def test_warc_to_training_shards_example(ray_session, tmp_path):
    """The full crawl->training-shards chain: curation arithmetic holds AND
    every survivor token lands in exactly one packed slice (the function
    raises on conservation violation or doc-id collision)."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from warc_to_corpus import make_fixture_warc
    from warc_to_training_shards import warc_to_training_shards

    plan = make_fixture_warc(str(tmp_path / "warc"), n_docs=120, n_shards=4)
    stats = warc_to_training_shards(
        str(tmp_path / "warc"), str(tmp_path / "out"), seq_len=64, seqs_per_shard=8
    )
    expect = plan["n_docs"] - plan["n_dup"] - plan["n_short"] - plan["n_spam"]
    assert stats["n_curated"] == expect
    assert stats["total_sliced"] == stats["total_tokens"] > 0
    assert stats["n_slices"] >= stats["total_tokens"] // 64
    # resumable layout: shard dirs on disk
    import os

    assert any(d.startswith("shard=") for d in os.listdir(stats["out_dir"]))
