"""JSONL corpus source (sources/jsonl.py): schema normalization, gzip,
content-hash ids, and chaining into the standard documents pipelines."""

from __future__ import annotations

import numpy as np
import pytest

from epichypersketch_jl_ray.sources.jsonl import read_jsonl_corpus, write_jsonl


ROWS = [
    {"text": "the quick brown fox jumps over the lazy dog", "id": 7, "lang": "en"},
    {"text": "pack my box with five dozen liquor jugs", "id": 8, "lang": "en"},
    {"text": "the quick brown fox jumps over the lazy dog", "id": 9, "lang": "en"},
    {"text": "über älter naïve — unicode façade 日本語", "id": 10, "lang": "de"},
]


def test_read_plain_and_gz_with_explicit_ids(ray_session, tmp_path):
    for name in ("corpus.jsonl", "corpus.jsonl.gz", "corpus.jsonl.zst"):
        p = write_jsonl(ROWS, str(tmp_path / name))
        df = (
            read_jsonl_corpus(p, id_field="id", keep_fields=("lang",))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(df.columns) == ["doc_id", "text", "n_chars", "lang"]
        assert list(df["doc_id"]) == [7, 8, 9, 10]
        # n_chars is CHARACTER count (utf8_length), not bytes
        assert df["n_chars"][3] == len(ROWS[3]["text"])
        assert df["text"][3] == ROWS[3]["text"]


def test_content_hash_ids_are_stable_and_dedup_compatible(ray_session, tmp_path):
    p = write_jsonl(ROWS, str(tmp_path / "c.jsonl"))
    df = read_jsonl_corpus(p).to_pandas()
    by_text = dict(zip(df["text"], df["doc_id"]))
    # identical texts (rows 0 and 2) collapse to one id; others distinct
    assert len(df) == 4 and len(by_text) == 3 and len(set(by_text.values())) == 3
    # stable across re-reads (block order may differ — compare by text)
    df2 = read_jsonl_corpus(p).to_pandas()
    assert dict(zip(df2["text"], df2["doc_id"])) == by_text


def test_missing_text_field_raises(ray_session, tmp_path):
    p = write_jsonl([{"body": "x"}], str(tmp_path / "bad.jsonl"))
    with pytest.raises(Exception, match="missing the 'text' field"):
        read_jsonl_corpus(p).to_pandas()


def test_chains_into_documents_pipelines(ray_session, tmp_path):
    # the normalized dataset drives the same vectorized text ops the
    # documents-table pipelines use
    from epichypersketch_jl_ray.functions.text import quality_features

    p = write_jsonl(ROWS, str(tmp_path / "c.jsonl"))
    ds = read_jsonl_corpus(p, id_field="id")

    def stats(batch):
        feats = quality_features(batch["text"])
        import pyarrow as pa

        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(feats["n_tokens"], pa.int64())}
        )

    out = ds.map_batches(stats, batch_format="pyarrow").to_pandas().sort_values("doc_id")
    assert list(out["n_tokens"])[:2] == [9, 8]
    assert (np.asarray(out["n_tokens"]) > 0).all()
