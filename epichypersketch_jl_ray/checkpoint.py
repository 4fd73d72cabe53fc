"""Per-partition checkpoint / resume / lineage for sketch builds
(north_rule requirement; absent from the reference, SURVEY.md §4
checkpoint row).

Unit of work = one input parquet file ("partition"). Each partition's partial
sketch is computed by a raw Ray task (the one place the Dataset API genuinely
can't express the semantics: skip-finished-partitions resume needs explicit
per-partition identity), written to ``<ckpt>/part-<name>.bin`` with a JSONL
manifest line:

    {"file": ..., "rows": n, "wall_s": t, "digest": sha, "attempt": k}

Blob writes are atomic (tmp + os.replace) and the manifest line is appended
only after the blob is durable, so a killed run resumes exactly: finished
partitions are skipped, their blobs merged with the fresh ones. Merge order
is the sorted file list — deterministic — so an interrupted+resumed run's
final state is byte-identical to an uninterrupted one for the exactly-
mergeable sketches (CMS/HLL/Bloom) and answer-equivalent for KLL/t-digest.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import ray

from epichypersketch_jl_ray.state.base import MergeableSketch


@ray.remote
def _partition_task(path: str, make_partial: Callable, batch_size: int) -> tuple[bytes, int, float]:
    import pyarrow.parquet as pq

    t0 = time.monotonic()
    pf = pq.ParquetFile(path)
    state = None
    rows = 0
    for batch in pf.iter_batches(batch_size=batch_size):
        import pyarrow as pa

        tbl = pa.Table.from_batches([batch])
        part = make_partial(tbl)
        rows += len(tbl)
        state = part if state is None else state.merge(part)
    if state is None:
        raise ValueError(f"empty partition {path}")
    return state.to_bytes(), rows, time.monotonic() - t0


def _manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.jsonl")


def read_manifest(ckpt_dir: str) -> dict[str, dict]:
    path = _manifest_path(ckpt_dir)
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    done[rec["file"]] = rec
    return done


def build_checkpointed(
    input_files: list[str],
    make_partial: Callable[["object"], MergeableSketch],
    cls: type[MergeableSketch],
    ckpt_dir: str,
    *,
    batch_size: int = 2048,
    max_in_flight: int = 32,
) -> tuple[MergeableSketch, dict]:
    """Build (or resume) a sketch over parquet files with per-file checkpoints.

    Returns (merged_state, metrics) where metrics carries throughput and
    per-partition lineage.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    files = sorted(input_files)
    done = read_manifest(ckpt_dir)
    todo = [f for f in files if f not in done]
    t0 = time.monotonic()
    fn_ref = ray.put(make_partial)

    pending: dict = {}
    results: dict[str, tuple[str, int, float, int]] = {}
    it = iter(todo)

    def launch_next():
        try:
            f = next(it)
        except StopIteration:
            return False
        pending[_partition_task.remote(f, fn_ref, batch_size)] = f
        return True

    for _ in range(max_in_flight):
        if not launch_next():
            break
    while pending:
        ready, _ = ray.wait(list(pending), num_returns=1)
        ref = ready[0]
        f = pending.pop(ref)
        blob, rows, wall = ray.get(ref)
        blob_path = os.path.join(ckpt_dir, f"part-{os.path.basename(f)}.bin")
        tmp = blob_path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, blob_path)
        attempt = done.get(f, {}).get("attempt", 0) + 1
        rec = {
            "file": f,
            "blob": blob_path,
            "rows": rows,
            "wall_s": round(wall, 4),
            "digest": cls.from_bytes(blob).digest(),
            "attempt": attempt,
        }
        with open(_manifest_path(ckpt_dir), "a") as fh:
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        done[f] = rec
        launch_next()

    # deterministic merge order: sorted file list; single k-way merge
    parts: list[MergeableSketch] = []
    total_rows = 0
    for f in files:
        rec = done[f]
        with open(rec["blob"], "rb") as fh:
            parts.append(cls.from_bytes(fh.read()))
        total_rows += rec["rows"]
    merged = parts[0].merge_many(parts[1:]) if parts else None
    wall = time.monotonic() - t0
    metrics = {
        "partitions": len(files),
        "resumed_partitions": len(files) - len(todo),
        "rows": total_rows,
        "wall_s": round(wall, 4),
        "rows_per_s": round(total_rows / wall, 2) if wall > 0 else None,
        "lineage": [done[f] for f in files],
    }
    with open(os.path.join(ckpt_dir, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=1)
    return merged, metrics
