"""Per-partition checkpoint / resume / lineage for sketch builds
(north_rule requirement; absent from the reference, SURVEY.md §4
checkpoint row).

Unit of work = one input parquet file ("partition"). Each partition's partial
sketch is computed AND written by a raw Ray task (the one place the Dataset
API genuinely can't express the semantics: skip-finished-partitions resume
needs explicit per-partition identity), as ``<ckpt>/part-<name>.bin`` via an
atomic tmp+rename; the driver appends a JSONL manifest line per finished
partition:

    {"file": ..., "blob": ..., "rows": n, "wall_s": t, "digest": sha, "attempt": k}

Crash safety without per-blob fsync: on resume every manifest entry's blob is
re-validated against its recorded content digest — a torn or missing blob
just means that partition is recomputed. Merge order is the sorted file list
(deterministic), executed as a parallel tree (Ray merge tasks over blob
groups, then one k-way merge_many on the driver), so an interrupted+resumed
run's final state is byte-identical to an uninterrupted one for the exactly-
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
def _partition_task(
    path: str, make_partial: Callable, batch_size: int, blob_path: str
) -> tuple[int, float, str]:
    """Compute one partition's partial sketch and write its blob atomically.
    Returns (rows, wall_s, digest)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.monotonic()
    pf = pq.ParquetFile(path)
    state = None
    rows = 0
    for batch in pf.iter_batches(batch_size=batch_size):
        tbl = pa.Table.from_batches([batch])
        part = make_partial(tbl)
        rows += len(tbl)
        state = part if state is None else state.merge(part)
    if state is None:
        # a legitimately empty input shard contributes an empty partial
        # (rows=0 recorded in the manifest) instead of aborting the build
        state = make_partial(pf.schema_arrow.empty_table())
    tmp = blob_path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(state.to_bytes())
    os.replace(tmp, blob_path)
    return rows, time.monotonic() - t0, state.digest()


def _read_blob(cls: type[MergeableSketch], path: str) -> MergeableSketch:
    with open(path, "rb") as fh:
        return cls.from_bytes(fh.read())


@ray.remote
def _merge_blobs_task(cls: type[MergeableSketch], paths: list[str]) -> bytes:
    parts = [_read_blob(cls, p) for p in paths]
    return parts[0].merge_many(parts[1:]).to_bytes()


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


def _validate(cls: type[MergeableSketch], rec: dict) -> bool:
    """A manifest entry is usable iff its blob exists and matches the digest
    recorded at write time (crash-safety without fsync)."""
    try:
        return _read_blob(cls, rec["blob"]).digest() == rec["digest"]
    except Exception:
        return False


@ray.remote
def _validate_blobs_task(cls: type[MergeableSketch], recs: list[dict]) -> list[bool]:
    return [_validate(cls, r) for r in recs]


def _validate_parallel(cls: type[MergeableSketch], recs: list[dict], chunk: int = 16) -> list[bool]:
    """Digest-validate manifest entries with parallel Ray tasks — a resumed
    512-partition run validates in seconds instead of reading every blob
    serially on the driver."""
    if len(recs) <= chunk:
        return [_validate(cls, r) for r in recs]
    groups = [recs[i : i + chunk] for i in range(0, len(recs), chunk)]
    results = ray.get([_validate_blobs_task.remote(cls, g) for g in groups])
    return [ok for grp in results for ok in grp]


def build_checkpointed(
    input_files: list[str],
    make_partial: Callable[["object"], MergeableSketch],
    cls: type[MergeableSketch],
    ckpt_dir: str,
    *,
    batch_size: int = 8192,
    max_in_flight: int = 64,
    merge_fanout: int = 16,
) -> tuple[MergeableSketch, dict]:
    """Build (or resume) a sketch over parquet files with per-file checkpoints.

    Returns (merged_state, metrics) where metrics carries throughput and
    per-partition lineage.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    files = sorted(input_files)
    raw_manifest = read_manifest(ckpt_dir)
    prev_attempts = {f: r.get("attempt", 0) for f, r in raw_manifest.items()}
    recs = list(raw_manifest.values())
    valid = _validate_parallel(cls, recs)
    done = {r["file"]: r for r, ok in zip(recs, valid) if ok}
    todo = [f for f in files if f not in done]
    t0 = time.monotonic()
    fn_ref = ray.put(make_partial)

    pending: dict = {}
    it = iter(todo)

    def launch_next() -> bool:
        try:
            f = next(it)
        except StopIteration:
            return False
        blob = os.path.join(ckpt_dir, f"part-{os.path.basename(f)}.bin")
        pending[_partition_task.remote(f, fn_ref, batch_size, blob)] = (f, blob)
        return True

    for _ in range(max_in_flight):
        if not launch_next():
            break
    manifest_fh = open(_manifest_path(ckpt_dir), "a")
    try:
        while pending:
            ready, _ = ray.wait(
                list(pending), num_returns=min(8, len(pending)), timeout=None
            )
            results = ray.get(ready)
            lines = []
            for ref, (rows, wall, digest) in zip(ready, results):
                f, blob = pending.pop(ref)
                rec = {
                    "file": f,
                    "blob": blob,
                    "rows": rows,
                    "wall_s": round(wall, 4),
                    "digest": digest,
                    "attempt": prev_attempts.get(f, 0) + 1,
                }
                lines.append(json.dumps(rec))
                done[f] = rec
                launch_next()
            manifest_fh.write("\n".join(lines) + "\n")
            manifest_fh.flush()
    finally:
        manifest_fh.close()

    # deterministic merge order: sorted file list; parallel tree merge of
    # blob groups via Ray tasks, then one k-way merge_many on the driver
    total_rows = sum(done[f]["rows"] for f in files)
    blob_paths = [done[f]["blob"] for f in files]
    if len(blob_paths) > merge_fanout:
        groups = [
            blob_paths[i : i + merge_fanout] for i in range(0, len(blob_paths), merge_fanout)
        ]
        refs = [_merge_blobs_task.remote(cls, g) for g in groups]
        parts = [cls.from_bytes(b) for b in ray.get(refs)]
    else:
        parts = [_read_blob(cls, p) for p in blob_paths]
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
