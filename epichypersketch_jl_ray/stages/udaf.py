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

from ray.data.aggregate import AggregateFnV2

from epichypersketch_jl_ray.state.base import MergeableSketch

STATE_SCHEMA = pa.schema([("state", pa.large_binary())])


class SketchAggregate(AggregateFnV2):
    """Ray-Data-native mergeable-sketch UDAF via Dataset.aggregate: one
    execution does per-block partial build (aggregate_block) + combine.

    Measured caveat: the built-in aggregate funnels combines through few
    tasks, which loses badly to tree_merge for MB-scale states (34.8s vs
    6.0s on the 120k-doc webtext build) — use it only for small (KB-scale)
    states; the pipelines use map_batches partials + tree_merge instead.
    The accumulator is the sketch object itself (picklable)."""

    def __init__(
        self,
        factory: Callable[[], MergeableSketch],
        update: Callable[[MergeableSketch, pa.Table], None],
        name: str = "sketch",
    ) -> None:
        super().__init__(name, zero_factory=lambda: None, on=None, ignore_nulls=True)
        self._factory = factory
        self._update = update

    def aggregate_block(self, block: pa.Table):
        sk = self._factory()
        self._update(sk, block)
        return sk

    def combine(self, a, b):
        if a is None:
            return b
        if b is None:
            return a
        return a.merge(b)


def aggregate_sketch(
    ds,
    factory: Callable[[], MergeableSketch],
    update: Callable[[MergeableSketch, pa.Table], None],
) -> MergeableSketch:
    """dataset → merged sketch in ONE streaming execution (no actor pool, no
    intermediate materialization)."""
    out = ds.aggregate(SketchAggregate(factory, update))
    return out["sketch"]


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
        acc.merge_many([cls.from_bytes(col[i].as_py()) for i in range(1, len(col))])
        return pa.table({"state": pa.array([acc.to_bytes()], type=pa.large_binary())})

    return merge_states


def tree_merge(
    states_ds,
    cls: type[MergeableSketch],
    *,
    fanout: int = 8,
    levels: int = 0,
) -> MergeableSketch:
    """Merge a Dataset of serialized partial states into one sketch.

    Chains ``levels`` lazy map_batches merge stages (each reduces the state
    count by ``fanout``×) onto the pipeline — still ONE streaming execution,
    no mid-pipeline materialization — then finishes the remainder with one
    k-way merge_many on the driver. ``levels=0`` (driver-only k-way) is
    fastest up to a few hundred partials; a 100 TB run with millions of
    blocks passes ``levels=ceil(log_fanout(blocks/few-hundred))`` so state
    traffic stays off the driver.
    """
    merge_fn = make_merge_fn(cls)
    states = states_ds
    for _ in range(max(levels, 0)):
        states = states.map_batches(merge_fn, batch_format="pyarrow", batch_size=fanout)
    rows = states.take_all()
    if not rows:
        raise ValueError("no partial states to merge (empty input dataset?)")
    acc = cls.from_bytes(rows[0]["state"])
    acc.merge_many([cls.from_bytes(r["state"]) for r in rows[1:]])
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
