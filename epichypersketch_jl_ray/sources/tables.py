"""Pruned parquet readers.

Reference has no file sources at all (in-memory dict only, SURVEY.md §2.1 S1);
here every read goes through ``ray.data.read_parquet`` with an explicit column
list so only needed columns leave storage — a hard requirement at 100 TB.
"""

from __future__ import annotations

import os

import ray.data


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    filter=None,
) -> ray.data.Dataset:
    """``filter`` is a pyarrow.dataset Expression pushed into the scan:
    parquet row-group statistics skip whole groups and the fragment reader
    drops non-matching rows before they ever enter the object store — the
    row-level counterpart of the column pruning. Callers keep their
    in-batch filter as documentation-of-predicate; after pushdown it
    removes nothing."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if filter is not None:
        return ray.data.read_parquet(path, columns=columns, filter=filter)
    return ray.data.read_parquet(path, columns=columns)


def table_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet FOOTERS only (no column data read) — the cheap
    pre-pass that sizes buckets/Blooms before a pipeline is built."""
    import glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        files = glob.glob(f"{path}/**/*.parquet", recursive=True)
    else:
        files = [path]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
