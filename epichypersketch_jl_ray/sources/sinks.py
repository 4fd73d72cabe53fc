"""Output sinks.

The reference assembles its result as one driver-memory DataFrame
(SURVEY.md §2.1 S2, /root/reference/src/count_cpu_extract.jl:3-37). At scale
the sink is partitioned Parquet: a directory of part files so downstream
reads parallelize and a failed writer can be rerun per-partition — never one
giant file (resumable-output requirement)."""

from __future__ import annotations

import os

import ray.data


def write_partitioned(
    ds: ray.data.Dataset, out_dir: str, *, num_rows_per_file: int | None = None
) -> str:
    """Write a Dataset as a directory of parquet part files."""
    os.makedirs(out_dir, exist_ok=True)
    kwargs = {}
    if num_rows_per_file:
        kwargs["num_rows_per_file"] = num_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
    return out_dir
