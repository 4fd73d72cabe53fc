"""Local mirror of the driver's Ray-vs-DuckDB compare (row count + schema +
order-insensitive value match)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def compare(name: str, ours, theirs: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = exact match)."""
    ours = to_pandas(ours)
    problems = []
    a_cols, b_cols = sorted(ours.columns), sorted(theirs.columns)
    if a_cols != b_cols:
        return [f"{name}: column mismatch {a_cols} vs {b_cols}"]
    if len(ours) != len(theirs):
        problems.append(f"{name}: row count {len(ours)} vs {len(theirs)}")
        return problems
    a = ours[a_cols].sort_values(a_cols).reset_index(drop=True)
    b = theirs[a_cols].sort_values(a_cols).reset_index(drop=True)
    for c in a_cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # the driver's value-hash is representation-sensitive: an un-cast
        # DuckDB SUM(BIGINT) comes back HUGEINT (object/float dtype) and
        # fails even when the values agree — so dtype kinds must match too
        if av.dtype.kind != bv.dtype.kind:
            problems.append(
                f"{name}: dtype mismatch in column {c}: {av.dtype} vs {bv.dtype}"
                " (cast the oracle aggregate to BIGINT/DOUBLE)"
            )
            continue
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.array_equal(av.astype(np.float64), bv.astype(np.float64))
        elif av.dtype.kind in "OUS" or bv.dtype.kind in "OUS":
            ok = (av.astype(str) == bv.astype(str)).all()
        else:
            ok = np.array_equal(av.astype(np.int64), bv.astype(np.int64))
        if not ok:
            problems.append(f"{name}: value mismatch in column {c}")
    return problems
