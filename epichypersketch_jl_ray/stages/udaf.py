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


def _sketches_from_table(tbl: pa.Table, cls: type[MergeableSketch]) -> list[MergeableSketch]:
    """Deserialize every state row of ``tbl``.

    Callers merge the returned list with ONE ``merge_many`` call rather than
    folding pairwise: for concatenate-then-sort merges (sparse CountMin COO)
    a pairwise fold re-sorts the growing accumulator per input — O(k·N log N)
    across k states — where a single merge_many is one O(N log N) pass.
    """
    col = tbl["state"]
    return [cls.from_bytes(col[i].as_py()) for i in range(len(col))]


def tree_merge(
    states_ds,
    cls: type[MergeableSketch],
    *,
    fanout: int = 8,
    levels: int | None = None,
) -> MergeableSketch:
    """Merge a Dataset of serialized partial states into one sketch.

    ``levels=None`` (default) is the AUTO path, sized from the actual block
    count so the 100 TB case needs no manual tuning: the dataset streams
    once, the driver collects only object REFS to the state blocks
    (``iter_internal_ref_bundles`` — bytes stay in the object store), and
    while more than ``fanout**2`` blocks remain they are reduced by remote
    ``fanout``-way merge tasks (each emits one 1-row block). The remaining
    (at most ``fanout**2``) blocks' states are deserialized on the driver and
    combined with a single ``merge_many`` — bounded regardless of input size
    (asserted by a forced-10k-partial unit test), and one linear pass rather
    than a pairwise fold (which is quadratic for COO-sketch merges).

    An explicit ``levels`` keeps the legacy shape: that many lazy map_batches
    merge stages (each reduces the state count ``fanout``×) chained onto the
    pipeline, then one k-way merge_many of the remainder on the driver.
    """
    if levels is None:
        import ray

        @ray.remote
        def _merge_blocks(*blocks) -> pa.Table:
            sketches: list[MergeableSketch] = []
            for blk in blocks:
                if not isinstance(blk, pa.Table):  # pandas/simple-block fallback
                    blk = pa.Table.from_pandas(blk)
                sketches.extend(_sketches_from_table(blk, cls))
            if not sketches:  # all-empty blocks
                return pa.table({"state": pa.array([], type=pa.large_binary())})
            acc = sketches[0].merge_many(sketches[1:])
            return pa.table({"state": pa.array([acc.to_bytes()], type=pa.large_binary())})

        refs = [
            ref
            for bundle in states_ds.iter_internal_ref_bundles()
            for ref in bundle.block_refs
        ]
        driver_cap = fanout * fanout
        while len(refs) > driver_cap:
            # Adaptive group width: aim to finish in ONE remote round (each
            # extra round re-sorts and re-ships every merged state), but cap
            # at 64 states per task so worker memory stays bounded by
            # 64 × the sketch's fixed geometry. A million-block run still
            # needs only ~log_64 rounds.
            group = min(64, max(fanout, -(-len(refs) // driver_cap)))
            refs = [
                _merge_blocks.remote(*refs[i : i + group])
                for i in range(0, len(refs), group)
            ]
        sketches: list[MergeableSketch] = []
        for ref in refs:
            blk = ray.get(ref)
            if not isinstance(blk, pa.Table):
                blk = pa.Table.from_pandas(blk)
            sketches.extend(_sketches_from_table(blk, cls))
        if not sketches:
            raise ValueError("no partial states to merge (empty input dataset?)")
        return sketches[0].merge_many(sketches[1:])

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


# worker-local broadcast cache: since the CM01 wire format, ray.get of a
# CountMin(-containing) object DECODES the state (allocating fresh arrays)
# on every call instead of returning zero-copy plasma views — a per-batch
# ray.get in a pass-2 stage re-paid that decode per batch (measured 40x on
# the sf0.1 k=4 motif select: 0.5 s -> 29 s). Memoize the deserialized
# object per worker process, keyed by the ref. Bounded LRU: iterative
# engines (PageRank) broadcast a fresh node-scale vector per iteration,
# and an unbounded cache would pin every iteration's vector in every
# long-lived worker for the whole session.
from collections import OrderedDict

_BROADCAST_CACHE: OrderedDict = OrderedDict()
_BROADCAST_CACHE_MAX = 32


def broadcast_get(ref):
    """ray.get memoized per worker process — use for every per-batch read of
    a ray.put sketch/state broadcast (plain numpy broadcasts stay zero-copy
    through vanilla ray.get and don't need this). The memo is a small LRU;
    callers that broadcast a sequence of one-shot values (one per iteration)
    should also broadcast_evict the superseded ref."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else ref
    if key in _BROADCAST_CACHE:
        _BROADCAST_CACHE.move_to_end(key)
        return _BROADCAST_CACHE[key]
    value = ray.get(ref)
    _BROADCAST_CACHE[key] = value
    while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_MAX:
        _BROADCAST_CACHE.popitem(last=False)
    return value


def broadcast_evict(ref) -> None:
    """Drop a broadcast entry from THIS process' cache. Worker processes
    evict lazily via the LRU bound; call this on the driver (and in stages
    that know a ref is superseded) for deterministic release of node-scale
    one-iteration values."""
    key = ref.hex() if hasattr(ref, "hex") else ref
    _BROADCAST_CACHE.pop(key, None)
