"""The full "crawl to training shards" chain, one measured run:

    Common-Crawl-layout WARC shards (mixed .warc.gz / .warc.zst)
      → parse + html→text + vectorized quality filter + exact dedup
        (examples/warc_to_corpus.curate_warc — each stage individually
        oracled/tested elsewhere)
      → deterministic int64 doc ids (hash of url; uniqueness asserted
        with one distinct-count aggregate)
      → GPT-style sequence packing (pipelines/packing.pack_sequences —
        exact distributed prefix-sum, bounded driver state)
      → shard-partitioned parquet (resumable output layout)

and the conservation check a training pipeline lives or dies by:
**every survivor token lands in exactly one packed slice** —
sum(tok_end - tok_start) over the written shards equals the survivor
corpus' total token count (same tokenizer on both sides).

Prints one JSON line with wall time and docs/s over the crawl→shards
chain (fixture generation excluded). Scale with GRAFT_WARC_DOCS /
RAY_GRAFT_CPUS.

Run standalone:  python examples/warc_to_training_shards.py
(owns its Ray session via the is_initialized() guard; the library never
calls ray.init).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pyarrow as pa

import ray


def warc_to_training_shards(
    warc_dir: str,
    out_dir: str,
    *,
    seq_len: int = 256,
    seqs_per_shard: int = 256,
) -> dict:
    """Returns {'n_curated', 'n_slices', 'total_tokens', 'total_sliced',
    'out_dir'}; raises if any token is lost or doubled."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from epichypersketch_jl_ray.functions.hashing import hash_strings_fast
    from epichypersketch_jl_ray.pipelines.packing import pack_sequences
    from warc_to_corpus import curate_warc

    corpus_dir = curate_warc(warc_dir, os.path.join(out_dir, "corpus"))
    corpus = ray.data.read_parquet(corpus_dir)

    def with_doc_id(batch: pa.Table) -> pa.Table:
        ids = hash_strings_fast(batch["url"].combine_chunks()).view(np.int64)
        return batch.append_column("doc_id", pa.array(ids, pa.int64()))

    survivors_dir = os.path.join(out_dir, "survivors.parquet")
    corpus.map_batches(with_doc_id, batch_format="pyarrow").write_parquet(survivors_dir)

    surv = ray.data.read_parquet(survivors_dir, columns=["doc_id", "n_tokens"])
    stats = surv.aggregate(
        Count(alias_name="n"), Sum("n_tokens", alias_name="total_tokens")
    )
    n_distinct = surv.groupby("doc_id").count().count()
    if n_distinct != stats["n"]:  # 64-bit url-hash collision: fail loudly
        raise RuntimeError(f"doc_id collision: {n_distinct} ids for {stats['n']} docs")

    slices = pack_sequences(out_dir, seq_len=seq_len, table="survivors")

    def shard(batch: pa.Table) -> pa.Table:
        return batch.append_column("shard", pc.divide(batch["seq_id"], seqs_per_shard))

    seq_dir = os.path.join(out_dir, "sequences")
    slices.map_batches(shard, batch_format="pyarrow").write_parquet(
        seq_dir, partition_cols=["shard"]
    )

    packed = ray.data.read_parquet(seq_dir)
    agg = packed.map_batches(
        lambda b: pa.table(
            {"len": pc.subtract(b["tok_end"], b["tok_start"]), "one": pa.array([1] * len(b))}
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("len", alias_name="total_sliced"), Sum("one", alias_name="n_slices"))

    result = {
        "n_curated": int(stats["n"]),
        "n_slices": int(agg["n_slices"]),
        "total_tokens": int(stats["total_tokens"]),
        "total_sliced": int(agg["total_sliced"]),
        "out_dir": seq_dir,
    }
    if result["total_sliced"] != result["total_tokens"]:
        raise RuntimeError(
            f"packed-token conservation violated: {result['total_sliced']} sliced"
            f" vs {result['total_tokens']} survivor tokens"
        )
    return result


def main() -> None:
    import json
    import shutil
    import tempfile

    from warc_to_corpus import make_fixture_warc

    n_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("GRAFT_WARC_DOCS", "24000"))
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=n_cpus,
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )
    work = tempfile.mkdtemp(prefix="warc_training_")
    try:
        plan = make_fixture_warc(
            f"{work}/warc", n_docs=n_docs, n_shards=max(8, n_cpus)
        )
        t0 = time.perf_counter()
        stats = warc_to_training_shards(f"{work}/warc", f"{work}/out")
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "warc_to_training_shards",
                    "value": round(wall, 3),
                    "unit": "sec",
                    "docs_in": plan["n_docs"],
                    "docs_per_sec": round(plan["n_docs"] / wall, 1),
                    "n_curated": stats["n_curated"],
                    "n_slices": stats["n_slices"],
                    "total_tokens": stats["total_tokens"],
                    "conservation_ok": stats["total_sliced"] == stats["total_tokens"],
                    "num_cpus": n_cpus,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
