"""Generic Ray Data UDAF harness for mergeable sketches.

The reference's only distribution mechanism is ONE shared mutable
CountMinSketch accumulated across sequentially-processed partitions
(/root/reference/src/partition.jl:148,204-214,307-336). Here that becomes the
idiomatic Ray Data pattern (SURVEY.md §2.4 A2):

    map_batches(update → per-batch partial state)   # parallel, order-free
      → tree merge (map_batches levels over state rows, then driver)
      → one merged sketch, broadcast via ray.put for any later pass

Because every sketch's ``merge`` is associative + commutative, Ray's
nondeterministic block order cannot change the merged state (asserted by
randomized merge-order tests). No shuffle is needed at any point — partial
states are small (sparse COO / registers / compactors), which is the whole
point of sketching 100 TB.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

from epichypersketch_jl_ray.state.base import MergeableSketch

STATE_SCHEMA = pa.schema([("state", pa.large_binary())])


def make_partial_fn(
    factory: Callable[[], MergeableSketch],
    update: Callable[[MergeableSketch, pa.Table], None],
):
    """Build a map_batches fn: Arrow batch -> one-row table holding the
    serialized partial sketch for that batch."""

    def partial(batch: pa.Table) -> pa.Table:
        sk = factory()
        update(sk, batch)
        return pa.table({"state": pa.array([sk.to_bytes()], type=pa.large_binary())})

    return partial


def make_merge_fn(cls: type[MergeableSketch]):
    """map_batches fn merging a batch of serialized states into one."""

    def merge_states(batch: pa.Table) -> pa.Table:
        col = batch["state"]
        acc = cls.from_bytes(col[0].as_py())
        for i in range(1, len(col)):
            acc.merge(cls.from_bytes(col[i].as_py()))
        return pa.table({"state": pa.array([acc.to_bytes()], type=pa.large_binary())})

    return merge_states


def tree_merge(
    states_ds,
    cls: type[MergeableSketch],
    *,
    fanout: int = 8,
    driver_threshold: int = 64,
) -> MergeableSketch:
    """Merge a Dataset of serialized partial states into one sketch.

    Runs log_fanout levels of map_batches merges while the state count
    exceeds ``driver_threshold``; the final (small) remainder merges on the
    driver. Each level materializes — legitimate, the states are small.
    """
    states = states_ds.materialize()
    n = states.count()
    if n == 0:
        raise ValueError("no partial states to merge (empty input dataset?)")
    merge_fn = make_merge_fn(cls)
    while n > driver_threshold:
        states = states.map_batches(
            merge_fn, batch_format="pyarrow", batch_size=fanout
        ).materialize()
        n = states.count()
    rows = states.take_all()
    acc = cls.from_bytes(rows[0]["state"])
    for r in rows[1:]:
        acc.merge(cls.from_bytes(r["state"]))
    return acc


def sketch_dataset(
    ds,
    factory: Callable[[], MergeableSketch],
    update: Callable[[MergeableSketch, pa.Table], None],
    cls: type[MergeableSketch],
    *,
    batch_size: int = 4096,
    fanout: int = 8,
) -> MergeableSketch:
    """End-to-end: dataset → per-batch partials → tree merge → sketch.

    ``factory`` must be deterministic (seeded) so all workers agree on hash
    functions; ``update`` mutates the sketch with one Arrow batch.
    """
    partial_fn = make_partial_fn(factory, update)
    states = ds.map_batches(partial_fn, batch_format="pyarrow", batch_size=batch_size)
    return tree_merge(states, cls, fanout=fanout)
