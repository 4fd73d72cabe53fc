"""End-to-end corpus curation: the composite pipeline a training-data user
actually runs — quality filter → exact dedup → near-dup removal — expressed
as one chained Ray Data flow, each stage the scale-shaped operator proven
individually elsewhere (pipelines/dedup.py), and the WHOLE chain checked
against a single DuckDB oracle.

Stage shapes (all distributed, no driver materialization of corpus-scale
data):
1. quality filter — vectorized predicate pushpast the read (only doc_id,
   text, n_chars columns leave storage).
2. exact dedup — groupby on the 128-bit content hash, keep min doc_id.
3. near-dup removal — MinHash-LSH banding + distributed exact-Jaccard
   verification (minhash_pairs) among the exact-dedup keepers; for each
   verified pair (a < b) the higher doc_id drops. Pair-wise (not
   transitive-closure) removal, matching the oracle's NOT IN semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Max, Min

from epichypersketch_jl_ray.pipelines.dedup import SHINGLE_N, minhash_pairs
from epichypersketch_jl_ray.stages.dedup import content_key_table
from epichypersketch_jl_ray.sources.tables import read_table


# session-level cache of the chain head shared by curate_corpus and
# curate_corpus_cc: both run in one driver/bench session over the same
# sf_dir, and the quality->exact-dedup->minhash-verify head is ~80% of
# either pipeline's wall. MATERIALIZED datasets pin blocks in the object
# store (spillable), not driver memory — same pattern as the motif
# activation cache (pipelines/motifs.py).
_CHAIN_CACHE: dict = {}


def _keepers_and_pairs(
    sf_dir: str, *, min_chars: int, threshold: float, num_partitions: int
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Shared head of the curation chain: quality filter -> exact-dedup
    keepers -> verified near-dup pairs among the keepers. Cached per
    (sf_dir, params) for the session."""
    key = (sf_dir, min_chars, threshold, num_partitions)
    if key in _CHAIN_CACHE:
        return _CHAIN_CACHE[key]
    keepers, pairs = _keepers_and_pairs_uncached(
        sf_dir, min_chars=min_chars, threshold=threshold, num_partitions=num_partitions
    )
    keepers, pairs = keepers.materialize(), pairs.materialize()
    _CHAIN_CACHE[key] = (keepers, pairs)
    return keepers, pairs


def _keepers_and_pairs_uncached(
    sf_dir: str, *, min_chars: int, threshold: float, num_partitions: int
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def quality(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch["n_chars"], min_chars)
        return batch.filter(keep).select(["doc_id", "text"])

    filtered = docs.map_batches(quality, batch_format="pyarrow")

    # ONE groupby carries the text through the exact-dedup shuffle: all rows
    # of a (h1, h2) group share the same text by construction (content
    # hash), so Max("text") is just "pick it" — this replaces the earlier
    # groupby + rejoin-on-doc_id, which shuffled the text a second time
    keeper_docs = (
        filtered.map_batches(
            lambda b: content_key_table(b, keep=("text",)), batch_format="pyarrow"
        )
        .groupby(["h1", "h2"])
        .aggregate(Min("doc_id", alias_name="doc_id"), Max("text", alias_name="text"))
        .drop_columns(["h1", "h2"])
        .materialize()
    )
    keepers = keeper_docs.select_columns(["doc_id"])

    pairs = minhash_pairs(keeper_docs, threshold=threshold, num_partitions=num_partitions)
    return keepers, pairs


def curate_corpus(
    sf_dir: str,
    *,
    min_chars: int = 120,
    threshold: float = 0.5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Surviving doc_ids after quality filter + exact dedup + near-dup drop."""
    keepers, pairs = _keepers_and_pairs(
        sf_dir, min_chars=min_chars, threshold=threshold, num_partitions=num_partitions
    )

    # drop the higher doc_id of every verified pair: union keepers (flag 0)
    # with pair doc_b's (flag 1), one groupby, keep max-flag 0 — the
    # distributed anti-join shape without a second join machinery
    def drops(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_b"].cast(pa.int64()),
                "dropped": pa.array(np.ones(len(batch), np.int64), pa.int64()),
            }
        )

    def keeps(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "dropped": pa.array(np.zeros(len(batch), np.int64), pa.int64()),
            }
        )

    flagged = keepers.map_batches(keeps, batch_format="pyarrow").union(
        pairs.map_batches(drops, batch_format="pyarrow")
    )
    agg = flagged.groupby("doc_id").aggregate(Max("dropped", alias_name="dropped"))

    def survivors(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["dropped"], 0)).select(["doc_id"])

    return agg.map_batches(survivors, batch_format="pyarrow")


def curate_corpus_cc(
    sf_dir: str,
    *,
    min_chars: int = 120,
    threshold: float = 0.5,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Cluster-aware curation: like curate_corpus, but near-dup removal drops
    whole duplicate CLUSTERS (connected components of the verified pair
    graph, stages/cc.py) keeping only each cluster's minimum doc_id — the
    transitive closure pair-wise removal misses on chains a~b~c with a!~c.
    """
    from epichypersketch_jl_ray.stages.cc import connected_components

    keepers, pairs = _keepers_and_pairs(
        sf_dir, min_chars=min_chars, threshold=threshold, num_partitions=num_partitions
    )

    comps = connected_components(pairs, num_buckets=2 * num_partitions)

    # drop every clustered node except its component minimum, via the same
    # union + groupby anti-join shape as curate_corpus
    def drops(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["node"], batch["component"])
        dropped_nodes = batch.filter(keep)
        return pa.table(
            {
                "doc_id": dropped_nodes["node"].cast(pa.int64()),
                "dropped": pa.array(np.ones(len(dropped_nodes), np.int64), pa.int64()),
            }
        )

    def keeps(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "dropped": pa.array(np.zeros(len(batch), np.int64), pa.int64()),
            }
        )

    flagged = keepers.map_batches(keeps, batch_format="pyarrow").union(
        comps.map_batches(drops, batch_format="pyarrow")
    )
    agg = flagged.groupby("doc_id").aggregate(Max("dropped", alias_name="dropped"))

    def survivors(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["dropped"], 0)).select(["doc_id"])

    return agg.map_batches(survivors, batch_format="pyarrow")


def curate_corpus_cc_sql(min_chars: int = 120, threshold: float = 0.5) -> str:
    """Recursive-CTE oracle: transitive closure of the exact-Jaccard pair
    graph, keep each component's minimum doc_id."""
    assert SHINGLE_N == 3
    return f"""
WITH RECURSIVE
f AS (SELECT doc_id, text FROM documents WHERE n_chars >= {min_chars}),
k AS MATERIALIZED (SELECT MIN(doc_id) AS doc_id, text FROM f GROUP BY text),
t AS (SELECT doc_id, string_split(text,' ') toks FROM k),
s AS MATERIALIZED (SELECT DISTINCT doc_id, toks[i]||' '||toks[i+1]||' '||toks[i+2] sh
      FROM t, LATERAL unnest(range(1, len(toks)-1)) r(i)),
sz AS (SELECT doc_id, count(*) n FROM s GROUP BY 1),
inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i
          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
j AS (SELECT da, db, i::DOUBLE / (x.n + y.n - i) jac FROM inter
      JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db),
e AS MATERIALIZED (SELECT da u, db v FROM j WHERE jac >= {threshold}
      UNION SELECT db, da FROM j WHERE jac >= {threshold}),
reach(u, v) AS (SELECT u, v FROM e
      UNION SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u),
comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u)
SELECT doc_id FROM k
WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
"""


def curate_corpus_sql(min_chars: int = 120, threshold: float = 0.5) -> str:
    assert SHINGLE_N == 3
    return f"""
WITH f AS (SELECT doc_id, text FROM documents WHERE n_chars >= {min_chars}),
k AS (SELECT MIN(doc_id) AS doc_id, text FROM f GROUP BY text),
t AS (SELECT doc_id, string_split(text,' ') toks FROM k),
s AS (SELECT DISTINCT doc_id, toks[i]||' '||toks[i+1]||' '||toks[i+2] sh
      FROM t, LATERAL unnest(range(1, len(toks)-1)) r(i)),
sz AS (SELECT doc_id, count(*) n FROM s GROUP BY 1),
inter AS (SELECT a.doc_id da, b.doc_id db, count(*) i
          FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
j AS (SELECT da, db, i::DOUBLE / (x.n + y.n - i) jac FROM inter
      JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db),
drops AS (SELECT DISTINCT db FROM j WHERE jac >= {threshold})
SELECT doc_id FROM k WHERE doc_id NOT IN (SELECT db FROM drops)
"""
