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
