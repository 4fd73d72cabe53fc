"""JSONL corpus source — the interchange format most published LLM corpora
ship in (one JSON object per line: {"text": ..., "id": ..., "meta": ...}).

Read shape: ``ray.data.read_json`` (pyarrow's streaming JSONL reader, one
task per file / block, gzip inferred from the ``.gz`` extension) followed by
ONE vectorized normalization ``map_batches`` that projects the fields the
engine's documents schema needs (doc_id, text, n_chars). Everything
downstream — dedup, curation, text stats, heavy hitters — runs unchanged on
the result, so a user can point any documents-table pipeline at a JSONL dump
instead of parquet.

A writer exists so tests are self-contained (and as the inverse sink for
small exports); production output stays partitioned parquet (sinks.py).
"""

from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pyarrow as pa

import ray.data


def read_jsonl_corpus(
    path: str,
    *,
    text_field: str = "text",
    id_field: str | None = None,
    keep_fields: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """JSONL file/dir -> Dataset with the engine's documents schema
    (doc_id, text, n_chars[, keep_fields...]).

    ``id_field`` uses the corpus's own integer id; otherwise doc_id is the
    64-bit content hash of the text (stable across re-reads and shards —
    exact-dedup semantics: identical texts get identical ids, which is the
    id contract the dedup/curation pipelines key on anyway).
    """
    ds = ray.data.read_json(path)

    def normalize(batch: pa.Table) -> pa.Table:
        if text_field not in batch.column_names:
            raise ValueError(
                f"JSONL corpus is missing the {text_field!r} field; "
                f"present: {batch.column_names}"
            )
        text = batch[text_field].cast(pa.string())
        if id_field is not None:
            doc_id = batch[id_field].cast(pa.int64())
        else:
            from epichypersketch_jl_ray.functions.hashing import content_hash128

            h1, _h2 = content_hash128(text)
            doc_id = pa.array(h1.view(np.int64), pa.int64())
        import pyarrow.compute as pc

        cols = {
            "doc_id": doc_id,
            "text": text,
            "n_chars": pc.utf8_length(text).cast(pa.int64()),
        }
        for f in keep_fields:
            cols[f] = batch[f]
        return pa.table(cols)

    return ds.map_batches(normalize, batch_format="pyarrow")


def write_jsonl(rows: list[dict], path: str) -> str:
    """Test/export helper: rows -> JSONL file (compressed when path ends
    .gz or .zst — both of which ``ray.data.read_json`` auto-detects)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = "".join(json.dumps(r, ensure_ascii=False) + "\n" for r in rows).encode()
    if path.endswith(".gz"):
        # fixed mtime so identical content gives identical bytes
        with open(path, "wb") as f:
            f.write(gzip.compress(payload, mtime=0))
    elif path.endswith(".zst"):
        import pyarrow as pa

        with pa.output_stream(path, compression="zstd") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)
    return path
