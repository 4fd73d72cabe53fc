"""End-to-end production-shaped ingestion: Common-Crawl-layout WARC shards →
parse → html→text → quality filter → exact dedup → partitioned parquet.

This is the composition a reference user runs at 100 TB, wired from the
library's proven pieces (each individually oracled/tested elsewhere):

    read_warc (one task per .warc.gz shard, sources/warc.py)
      → html→text + quality features (stateless map_batches, compiled-regex
        extractor + vectorized Gopher-style signals, functions/)
      → quality filter (Arrow-native, no row loop)
      → exact dedup (128-bit content key → hash-partitioned groupby →
        keep-min-url per group, stages/dedup.content_key_table)
      → write_partitioned parquet (resumable output layout, sources/sinks)

Every stage streams: nothing materializes the corpus on the driver, the only
all-to-all exchange is the dedup groupby (keyed on the content hash, so it
is uniform by construction — no skew salting needed), and the output is a
directory of part files a failed run can diff against.

Run standalone:  python examples/warc_to_corpus.py
(owns its Ray session via the is_initialized() guard; the library never
calls ray.init).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def make_fixture_warc(
    out_dir: str, *, n_docs: int = 60, n_shards: int = 3, seed: int = 5
) -> dict[str, int]:
    """Deterministic WARC corpus with planted exact duplicates and
    low-quality (too-short / one-token-spam) pages; returns the plant
    counts so callers can assert the pipeline's arithmetic."""
    from epichypersketch_jl_ray.sources.warc import encode_warc

    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "carbon", "delta", "ember", "falcon", "granite", "helix"]
    os.makedirs(out_dir, exist_ok=True)
    n_dup = n_docs // 6
    n_short = n_docs // 6
    n_spam = n_docs // 12
    bodies: list[str] = []
    for i in range(n_docs):
        if i < n_short:
            body = "tiny page"
        elif i < n_short + n_spam:
            body = " ".join(["spam"] * 40)
        else:
            body = " ".join(rng.choice(words, size=30)) + f" unique marker {i}"
        bodies.append(body)
    # exact duplicates: the LAST n_dup docs repeat the first good bodies
    first_good = n_short + n_spam
    for j in range(n_dup):
        bodies[n_docs - 1 - j] = bodies[first_good + j]
    per_shard = (n_docs + n_shards - 1) // n_shards
    for s in range(n_shards):
        recs = []
        for i in range(s * per_shard, min((s + 1) * per_shard, n_docs)):
            html = (
                f"<html><head><script>var x = {i};</script></head>"
                f"<body><p>{bodies[i]}</p></body></html>"
            )
            recs.append(
                {"url": f"https://ex.com/doc{i:04d}", "payload": html.encode()}
            )
        if s % 3 == 2:
            # every third shard ships zstd-compressed — real archives mix
            # layouts across crawls; the reader dispatches per file
            with open(f"{out_dir}/part-{s:03d}.warc.zst", "wb") as f:
                f.write(encode_warc(recs, zstd_per_record=True))
        else:
            with open(f"{out_dir}/part-{s:03d}.warc.gz", "wb") as f:
                f.write(encode_warc(recs, gzip_per_record=True))
    return {"n_docs": n_docs, "n_dup": n_dup, "n_short": n_short, "n_spam": n_spam}


def curate_warc(
    warc_dir: str,
    out_dir: str,
    *,
    min_chars: int = 40,
    max_top_token_share: float = 0.5,
) -> str:
    """The pipeline. Returns ``out_dir`` (a directory of parquet parts with
    columns url, text, n_chars, n_tokens)."""
    from epichypersketch_jl_ray.functions.html import extract_text_generic
    from epichypersketch_jl_ray.functions.text import quality_features
    from epichypersketch_jl_ray.sources.sinks import write_partitioned
    from epichypersketch_jl_ray.sources.warc import read_warc
    from epichypersketch_jl_ray.stages.dedup import content_key_table

    def to_scored_text(batch: pa.Table) -> pa.Table:
        html = pa.array(
            [p.decode("utf-8", "replace") for p in batch["payload"].to_pylist()],
            pa.string(),
        )
        text = extract_text_generic(html)
        q = quality_features(text)
        keep = (q["n_chars"] >= min_chars) & (q["top_token_share"] <= max_top_token_share)
        return pa.table(
            {
                "url": batch["url"],
                "text": text,
                "n_chars": pa.array(q["n_chars"], pa.int64()),
                "n_tokens": pa.array(q["n_tokens"], pa.int64()),
            }
        ).filter(pa.array(keep))

    def first_per_group(group: pa.Table) -> pa.Table:
        keep = pc.min(group["url"])
        return group.filter(pc.equal(group["url"], keep)).drop_columns(["h1", "h2"])

    ds = read_warc(warc_dir)
    scored = ds.map_batches(to_scored_text, batch_format="pyarrow")
    keyed = scored.map_batches(
        lambda b: content_key_table(
            b, id_col="url", keep=("text", "n_chars", "n_tokens")
        ),
        batch_format="pyarrow",
    )
    unique = keyed.groupby(["h1", "h2"]).map_groups(
        first_per_group, batch_format="pyarrow"
    )
    return write_partitioned(unique, out_dir)


def main() -> None:
    import shutil
    import tempfile

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    work = tempfile.mkdtemp(prefix="warc_corpus_")
    try:
        plan = make_fixture_warc(f"{work}/warc")
        out = curate_warc(f"{work}/warc", f"{work}/corpus")
        got = ray.data.read_parquet(out)
        n = got.count()
        expect = plan["n_docs"] - plan["n_dup"] - plan["n_short"] - plan["n_spam"]
        print(f"docs in: {plan['n_docs']}  surviving: {n}  expected: {expect}")
        assert n == expect, (n, expect)
        print("sample:", got.take(2))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
