"""Motif enumeration pipelines (reference obtain_enriched_configurations,
/root/reference/src/count_cpu_extract.jl:143-189) over lineitem-derived
activation sequences.

Sequence model: one sequence per order (data_index = l_orderkey), features =
supplier keys, contribution = quantity, position = line number (conv case).
This is the faithful translation of the reference's ActivationDict semantics
onto a normalized relational input — every C(len, k) slot combination of every
sequence is CMS-counted, then combinations whose estimate >= min_count are
re-emitted one row per occurrence with summed contribution
(/root/reference/src/count_cpu_extract.jl:3-37).

Exactness at ANY scale (round-4 change): CMS never underestimates, so the
selected set is always a SUPERSET of the true min_count survivors; a final
survivor-scale exact-verify (one groupby over the pass-2 OUTPUT — hundreds
to tens of thousands of rows, never the corpus) recounts each selected
combination, drops false survivors and replaces the estimate with the exact
count. This "sketch-prune + exact-verify" shape (the same pattern as the
dedup verify tails) makes the pipeline exact regardless of corpus size: a
10x-gate-scale sweep caught the pure-CMS version emitting 6/227/91 inflated
rows at sf0.1 — the birthday-collision probability (N/cols)^rows grows with
the distinct-combination count N, so no fixed geometry stays collision-free.
The CMS still does all the pruning work (the verify pass touches only what
the sketch let through); at 100 TB the reference's default delta/epsilon
(/root/reference/src/EpicHyperSketch.jl:14-16) sizes the sketch and the
verify tail still guarantees exact output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from epichypersketch_jl_ray.sources.activation import activation_from_table
from epichypersketch_jl_ray.sources.tables import read_table
from epichypersketch_jl_ray.stages.motifs import MotifCounter, MotifSelector
from epichypersketch_jl_ray.stages.udaf import tree_merge

# collision-free-at-test-scale sketch geometry (see module docstring)
ORACLE_DELTA = 9e-3  # 5 rows
ORACLE_EPSILON = 3.24e-7  # 8,389,040 cols
MOTIF_SEED = 20260817


def motif_pipeline(
    activation: ray.data.Dataset,
    *,
    motif_size: int = 3,
    min_count: int = 3,
    conv: bool = False,
    filter_len: int = 0,
    delta: float = ORACLE_DELTA,
    epsilon: float = ORACLE_EPSILON,
    seed: int = MOTIF_SEED,
    max_active_len: int = 64,
    batch_size: int | str = 2048,
    concurrency: int = 4,
    spill_dir: str | None = None,
) -> ray.data.Dataset:
    """count (pass 1) → tree merge → broadcast → select+extract (pass 2).

    ``batch_size=":auto"`` sizes the batch from the enumeration working set
    — C(max_active_len, motif_size) per-row cost against the reference's
    4 GB × 0.8 budget and [10, 10000] clamps
    (memory.calculate_optimal_batch_size, mirroring
    /root/reference/src/record.jl:58-62 → /root/reference/src/memory.jl:97-148)
    — so long sequences automatically get small batches.

    Both passes read the activation dataset. Default: materialize in the
    object store (Ray spills to disk under pressure) — the streaming analogue
    of the reference keeping its Records alive across count!/make_selection!
    (/root/reference/src/count_gpu_extract.jl:37-53). With ``spill_dir`` the
    activation is written once to partitioned parquet and re-read per pass —
    the cluster-robust variant: pass 2 survives driver/object-store loss and
    can be re-run against the spilled files.
    """
    from epichypersketch_jl_ray.stages.motifs import MotifCountState

    if spill_dir is not None:
        from epichypersketch_jl_ray.sources.sinks import write_partitioned

        write_partitioned(activation, spill_dir)
        act = ray.data.read_parquet(spill_dir)
    else:
        act = activation.materialize()

    if batch_size == ":auto":
        from epichypersketch_jl_ray.memory import calculate_optimal_batch_size

        # size from the OBSERVED max sequence length, not the worst-case cap
        # — exactly the reference's get_max_active_len -> batch-size chain
        # (/root/reference/src/record.jl:58-62). The cap is a TRUNCATION
        # bound; sizing C(cap, k) when real rows are ~7 long makes k=4/5
        # batches of 10-67 rows, i.e. thousands of tasks and thousands of
        # CMS partials per query. One cheap scan of the materialized
        # activation (list lengths only) fixes the fan-in.
        def _row_lens(batch: pa.Table) -> pa.Table:
            arr = batch["features"]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            lens = np.asarray(arr.value_lengths(), dtype=np.int64)
            m = int(lens.max()) if len(lens) else 0
            return pa.table({"m": pa.array([m], pa.int64())})

        observed = act.map_batches(_row_lens, batch_format="pyarrow").max("m")
        eff_len = max(1, min(int(observed or 1), max_active_len))
        batch_size = calculate_optimal_batch_size(
            eff_len, motif_size, conv=conv, delta=delta, epsilon=epsilon
        )
    kwargs = dict(
        motif_size=motif_size,
        conv=conv,
        filter_len=filter_len,
        max_active_len=max_active_len,
    )
    counter = MotifCounter(**kwargs, delta=delta, epsilon=epsilon, seed=seed)
    states = act.map_batches(counter, batch_format="pyarrow", batch_size=batch_size)
    merged = tree_merge(states, MotifCountState)
    if merged.truncated:
        import logging

        logging.getLogger(__name__).warning(
            "motif_pipeline: %d sequences truncated to max_active_len=%d",
            merged.truncated,
            max_active_len,
        )
    cms_ref = ray.put(merged.cms)
    selector = MotifSelector(cms_ref, min_count=min_count, **kwargs)
    out = act.map_batches(selector, batch_format="pyarrow", batch_size=batch_size)
    key_cols = [f"m{i + 1}" for i in range(motif_size)]
    schema_fields: list[tuple[str, pa.DataType]] = [(c, pa.int32()) for c in key_cols]
    if conv:
        d_cols = [f"d{i + 1}{i + 2}" for i in range(motif_size - 1)]
        key_cols += d_cols
        schema_fields += [(c, pa.int32()) for c in d_cols]
        schema_fields += [("start", pa.int32()), ("end", pa.int32())]
    schema_fields += [
        ("data_index", pa.int64()),
        ("contribution", pa.float64()),
        ("estimate", pa.int64()),
    ]
    return _exact_support_correct(out, key_cols, min_count, schema_fields=schema_fields)


def _exact_support_correct(
    out: ray.data.Dataset,
    key_cols: list[str],
    min_count: int,
    *,
    schema_fields: list[tuple[str, pa.DataType]],
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Sketch-prune + exact-verify tail (module docstring): recount each
    CMS-selected combination over the pass-2 output, drop combinations whose
    exact support < min_count (CMS false survivors) and set ``estimate`` to
    the exact count. Runs at OUTPUT scale — the bucket groupby shuffles only
    rows the sketch already let through, never the corpus.

    One null-keyed SENTINEL row (typed from ``schema_fields``, bucket -1) is
    unioned in before the groupby: Ray skips UDF calls on empty blocks and a
    groupby of a fully-empty dataset drops the schema entirely, so the
    sentinel guarantees the tail always flows at least one typed row through
    map_groups and the final filter — the result keeps its schema even when
    the sketch selected nothing."""
    import pyarrow.compute as pc

    from epichypersketch_jl_ray.functions.hashing import hash_combine, hash_int64

    sentinel_tbl = pa.table(
        {name: pa.array([None], type=t) for name, t in schema_fields}
    )
    out = out.union(ray.data.from_arrow(sentinel_tbl))

    def add_bucket(batch: pa.Table) -> pa.Table:
        valid = pc.is_valid(batch[key_cols[0]]).to_numpy(zero_copy_only=False)
        hs = [
            hash_int64(
                pc.fill_null(batch[c], 0).to_numpy(zero_copy_only=False).astype(np.int64),
                seed=11,
            )
            for c in key_cols
        ]
        h = hs[0] if len(hs) == 1 else hash_combine(*hs)
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        bucket = np.where(valid, bucket, -1)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def per_bucket(batch: pa.Table) -> pa.Table:
        batch = batch.drop_columns(["bucket"])
        if not pc.any(pc.is_valid(batch[key_cols[0]])).as_py():
            return batch  # sentinel group passes through; dropped after the groupby
        keys = np.stack(
            [batch[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in key_cols],
            axis=1,
        )
        _, inv, cnt = np.unique(keys, axis=0, return_inverse=True, return_counts=True)
        exact = cnt[inv]
        fixed = batch.set_column(
            batch.schema.get_field_index("estimate"),
            "estimate",
            pa.array(exact.astype(np.int64), pa.int64()),
        )
        return fixed.filter(pa.array(exact >= min_count))

    def drop_sentinels(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[key_cols[0]]))

    return (
        out.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .map_batches(drop_sentinels, batch_format="pyarrow")
    )


# session-level cache of MATERIALIZED activation datasets: the driver and
# bench call several motif queries in one Ray session; the groupby shuffle
# that builds the sequences is the dominant fixed cost, so building it once
# per (sf_dir, conv) amortizes it (a MaterializedDataset pins its blocks in
# the object store for the session — small relative to the store).
_ACTIVATION_CACHE: dict = {}


def lineitem_activation(sf_dir: str, *, conv: bool) -> ray.data.Dataset:
    key = (sf_dir, conv)
    if key in _ACTIVATION_CACHE:
        return _ACTIVATION_CACHE[key]
    cols = ["l_orderkey", "l_suppkey", "l_quantity"] + (["l_linenumber"] if conv else [])
    li = read_table(sf_dir, "lineitem", columns=cols)
    from epichypersketch_jl_ray.sources.tables import table_rows

    act = activation_from_table(
        li,
        key_col="l_orderkey",
        feature_col="l_suppkey",
        contribution_col="l_quantity",
        position_col="l_linenumber" if conv else None,
        size_hint_rows=table_rows(sf_dir, "lineitem"),
    ).materialize()
    _ACTIVATION_CACHE[key] = act
    return act


def motifs_ordinary(sf_dir: str, *, motif_size: int = 3, min_count: int = 3) -> ray.data.Dataset:
    """Ordinary-features case (reference OrdinaryFeatures,
    /root/reference/src/types.jl:10): which supplier k-sets recur across
    orders at least min_count times, one output row per occurrence."""
    return motif_pipeline(
        lineitem_activation(sf_dir, conv=False),
        motif_size=motif_size,
        min_count=min_count,
        conv=False,
    )


def motifs_conv(
    sf_dir: str, *, motif_size: int = 3, min_count: int = 2, filter_len: int = 2
) -> ray.data.Dataset:
    """Convolution case (reference ConvolutionFeature,
    /root/reference/src/types.jl:11): position-aware motifs with inter-feature
    gaps; gap = pos2-pos1-filter_len, overlaps rejected
    (/root/reference/src/count_cpu.jl:47-53)."""
    return motif_pipeline(
        lineitem_activation(sf_dir, conv=True),
        motif_size=motif_size,
        min_count=min_count,
        conv=True,
        filter_len=filter_len,
    )


def motifs_ordinary_k4(sf_dir: str, *, min_count: int = 2) -> ray.data.Dataset:
    """Higher-order (k=4) motif enumeration — the reference supports any
    motif_size (/root/reference/test/test_higher_order_motifs.jl); this
    exercises the generic C(len,k) path under the driver oracle, not just
    pytest."""
    return motif_pipeline(
        lineitem_activation(sf_dir, conv=False),
        motif_size=4,
        min_count=min_count,
        conv=False,
        # C(len,4) is ~15x the k=3 working set per row: let the reference's
        # budget formula size the batch instead of the fixed default
        batch_size=":auto",
    )


def motifs_ordinary_k4_sql(min_count: int = 2) -> str:
    return motifs_ordinary_sql(motif_size=4, min_count=min_count)


def motifs_ordinary_k5(sf_dir: str, *, min_count: int = 2) -> ray.data.Dataset:
    """k=5 motifs — closes the reference's higher-order test surface
    (/root/reference/test/test_higher_order_motifs.jl covers k=4 AND k=5)
    under the driver oracle, same generic C(len,k) path."""
    return motif_pipeline(
        lineitem_activation(sf_dir, conv=False),
        motif_size=5,
        min_count=min_count,
        conv=False,
        batch_size=":auto",
    )


def motifs_ordinary_k5_sql(min_count: int = 2) -> str:
    return motifs_ordinary_sql(motif_size=5, min_count=min_count)


def motifs_ordinary_sql(motif_size: int = 3, min_count: int = 3) -> str:
    """DuckDB oracle: exact brute-force slot-combination enumeration for ANY
    motif_size — the SQL analogue of the reference's verify_ground_truth
    (/root/reference/test/test_large_example_ordinary.jl:118-169). The
    k-way self-join chain is generated; CTEs are MATERIALIZED because
    DuckDB inlines plain CTEs into every join side (re-evaluating the
    window per side — 100x slower at k=4)."""
    assert motif_size >= 2
    aliases = [f"t{i}" for i in range(motif_size)]
    m_cols = ", ".join(
        f"{a}.feature AS m{i + 1}" for i, a in enumerate(aliases)
    )
    contribution = " + ".join(f"{a}.contribution" for a in aliases)
    joins = "".join(
        f"\n       JOIN f {aliases[i]} ON {aliases[i]}.data_index = t0.data_index"
        f" AND {aliases[i]}.rn > {aliases[i - 1]}.rn"
        for i in range(1, motif_size)
    )
    m_list = ", ".join(f"m{i + 1}" for i in range(motif_size))
    c_m_list = ", ".join(f"c.m{i + 1}" for i in range(motif_size))
    group_nums = ", ".join(str(i + 1) for i in range(motif_size))
    return f"""
WITH f AS MATERIALIZED (
  SELECT l_orderkey AS data_index, CAST(l_suppkey AS INTEGER) AS feature,
         l_quantity AS contribution,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_suppkey, l_quantity) AS rn
  FROM lineitem),
c AS MATERIALIZED (
  SELECT t0.data_index, {m_cols},
         {contribution} AS contribution
  FROM f t0{joins}),
g AS (SELECT {m_list}, COUNT(*) AS cnt FROM c GROUP BY {group_nums})
SELECT {c_m_list}, c.data_index, c.contribution, g.cnt AS estimate
FROM c JOIN g USING ({m_list})
WHERE g.cnt >= {min_count}
"""


def motifs_conv_sql(motif_size: int = 3, min_count: int = 2, filter_len: int = 2) -> str:
    """Generated k-way conv oracle (any motif_size): m1..mk, d12..d(k-1)k,
    start/end, with the CPU gap semantics (d = p2-p1-filter_len, reject
    negative gaps)."""
    assert motif_size >= 2
    k = motif_size
    aliases = [f"t{i}" for i in range(k)]
    m_cols = ", ".join(f"{a}.feature AS m{i + 1}" for i, a in enumerate(aliases))
    d_cols = ", ".join(
        f"CAST({aliases[i + 1]}.position - {aliases[i]}.position - {filter_len} AS INTEGER)"
        f" AS d{i + 1}{i + 2}"
        for i in range(k - 1)
    )
    contribution = " + ".join(f"{a}.contribution" for a in aliases)
    joins = "".join(
        f"\n       JOIN f {aliases[i]} ON {aliases[i]}.data_index = t0.data_index"
        f" AND {aliases[i]}.rn > {aliases[i - 1]}.rn"
        for i in range(1, k)
    )
    overlap = " AND ".join(
        f"{aliases[i + 1]}.position - {aliases[i]}.position - {filter_len} >= 0"
        for i in range(k - 1)
    )
    key_list = ", ".join([f"m{i + 1}" for i in range(k)] + [f"d{i + 1}{i + 2}" for i in range(k - 1)])
    c_key_list = ", ".join(
        [f"c.m{i + 1}" for i in range(k)] + [f"c.d{i + 1}{i + 2}" for i in range(k - 1)]
    )
    group_nums = ", ".join(str(i + 1) for i in range(2 * k - 1))
    return f"""
WITH f AS MATERIALIZED (
  SELECT l_orderkey AS data_index, CAST(l_suppkey AS INTEGER) AS feature,
         l_quantity AS contribution, CAST(l_linenumber AS INTEGER) AS position,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
  FROM lineitem),
c AS MATERIALIZED (
  SELECT t0.data_index, {m_cols},
         {d_cols},
         t0.position AS start,
         CAST({aliases[-1]}.position + {filter_len} - 1 AS INTEGER) AS "end",
         {contribution} AS contribution
  FROM f t0{joins}
  WHERE {overlap}),
g AS (SELECT {key_list}, COUNT(*) AS cnt FROM c GROUP BY {group_nums})
SELECT {c_key_list}, c.start, c."end", c.data_index,
       c.contribution, g.cnt AS estimate
FROM c JOIN g USING ({key_list})
WHERE g.cnt >= {min_count}
"""


def motifs_conv_k4(sf_dir: str, *, min_count: int = 2, filter_len: int = 1) -> ray.data.Dataset:
    """Higher-order (k=4) convolution motifs — position-aware enumeration
    with three inter-feature gaps, under the driver oracle (reference
    higher-order conv tests, /root/reference/test/test_higher_order_motifs.jl)."""
    return motif_pipeline(
        lineitem_activation(sf_dir, conv=True),
        motif_size=4,
        min_count=min_count,
        conv=True,
        filter_len=filter_len,
        batch_size=":auto",
    )


def motifs_conv_k4_sql(min_count: int = 2, filter_len: int = 1) -> str:
    return motifs_conv_sql(motif_size=4, min_count=min_count, filter_len=filter_len)
