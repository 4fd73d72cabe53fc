"""Similarity search over the embeddings table."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from epichypersketch_jl_ray.sources.tables import read_table
from epichypersketch_jl_ray.stages.ann import BruteForceTopK, _embedding_matrix, final_topk

N_QUERIES = 5
TOP_K = 10


def ann_cosine_topk(sf_dir: str, *, k: int = TOP_K) -> pd.DataFrame:
    """Brute-force cosine top-k for the first N_QUERIES vectors against the
    whole table (self included — deterministic rank 1). Query matrix is
    broadcast once via ray.put; each batch does one float64 matmul."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    probe_tbl = pa.Table.from_pylist(
        [r for r in ds.filter(expr=f"vec_id < {N_QUERIES}").take_all()]
    )
    q = _embedding_matrix(probe_tbl, "embedding")
    q_ids = probe_tbl["vec_id"].to_numpy().astype(np.int64)
    query_ref = ray.put((q_ids, q))
    cands = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
    ).to_pandas()
    return final_topk(cands, k=k)


def ann_cosine_topk_sql(k: int = TOP_K) -> str:
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
s AS (SELECT q.qid, e.vec_id,
             list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS sim
      FROM q CROSS JOIN embeddings e),
r AS (SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
      FROM s)
SELECT qid AS query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank
FROM r WHERE rn <= {k}
"""
