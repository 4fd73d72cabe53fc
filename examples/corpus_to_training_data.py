"""End-to-end training-data preparation: curated corpus → model-based
quality scores → filtered survivors → GPT-style packed sequences →
partitioned parquet. The layout step a reference user runs AFTER the
curation chain (examples/warc_to_corpus.py covers ingestion→curation).

Composition, wired from the library's proven pieces:

    documents parquet (column-pruned read)
      → quality_scores (pipelines/classifier.py — the CCNet-style
        reference-vs-crawl LR, trained distributedly inside the call with
        byte-deterministic fixed-point GD)
      → keep docs the classifier scores reference-like (Arrow filter)
      → pack_sequences over the SURVIVOR table (pipelines/packing.py —
        exact distributed prefix-sum; the survivor set is written to its
        own parquet dir first so packing's two passes read the pruned
        survivor table, not the full corpus)
      → write partitioned parquet keyed on seq_id // seqs_per_shard
        (resumable output: a failed run diffs finished shard dirs)

Every stage streams. The only driver state is the classifier weight vector
and the packing range-offset table (both bounded, both broadcast).

Run standalone:  python examples/corpus_to_training_data.py
(owns its Ray session via the is_initialized() guard; the library never
calls ray.init).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc

import ray


def build_training_data(
    sf_dir: str,
    out_dir: str,
    *,
    keep_threshold: float = 0.45,
    seq_len: int = 256,
    seqs_per_shard: int = 64,
) -> dict:
    """Returns {'n_docs', 'n_kept', 'n_slices', 'n_sequences', 'out_dir'}."""
    from epichypersketch_jl_ray.pipelines.classifier import quality_scores
    from epichypersketch_jl_ray.pipelines.packing import pack_sequences
    from epichypersketch_jl_ray.sources.tables import read_table
    from epichypersketch_jl_ray.stages.join import bucketed_hash_join

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    scored = quality_scores(sf_dir)

    kept = bucketed_hash_join(docs, scored, left_on="doc_id", right_on="doc_id")

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch["quality_prob"], keep_threshold)
        ).select(["doc_id", "text"])

    # survivor table on disk (dir named survivors.parquet, the read_table
    # layout) -> packing's two passes read the pruned survivor set only
    survivors_dir = os.path.join(out_dir, "survivors.parquet")
    kept.map_batches(keep, batch_format="pyarrow").write_parquet(survivors_dir)

    slices = pack_sequences(out_dir, seq_len=seq_len, table="survivors")

    def shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "shard", pc.divide(batch["seq_id"], seqs_per_shard)
        )

    seq_dir = os.path.join(out_dir, "sequences")
    slices.map_batches(shard, batch_format="pyarrow").write_parquet(
        seq_dir, partition_cols=["shard"]
    )

    out = ray.data.read_parquet(seq_dir)
    n_slices = out.count()
    n_seqs = out.groupby("seq_id").count().count()
    n_docs = docs.count()
    kept_n = ray.data.read_parquet(survivors_dir).count()
    return {
        "n_docs": n_docs,
        "n_kept": kept_n,
        "n_slices": n_slices,
        "n_sequences": n_seqs,
        "out_dir": seq_dir,
    }


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import tempfile

    stats = build_training_data(
        os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        tempfile.mkdtemp(prefix="training_data_"),
    )
    print(stats)
    ray.shutdown()
