"""Scale-critical invariants: int64 counter headroom (the reference's Int32
counters overflow at 10^12 rows, SURVEY.md §7.4), and bit-identical results
across batch sizes / parallelism (the N-vs-4N reproducibility argument)."""

import numpy as np
import pandas as pd

from epichypersketch_jl_ray.state.countmin import CountMin
from epichypersketch_jl_ray.state.hll import HyperLogLog


def test_countmin_counters_beyond_int32():
    """Weighted inserts past 2^31 — the exact point where the reference's
    Int32 sketch (/root/reference/src/sketch.jl:59) would wrap negative."""
    cm = CountMin(1, delta=0.01, epsilon=0.01, seed=3)
    big = np.int64(3_000_000_000)  # > 2^31 - 1
    cm.add(np.array([[7]]), weights=np.array([big]))
    cm.add(np.array([[7]]), weights=np.array([big]))
    assert cm.estimate(np.array([[7]]))[0] == 2 * big
    assert cm.n_inserts == 2 * big
    # survives serialization and merge
    other = CountMin.from_bytes(cm.to_bytes())
    cm.merge(other)
    assert cm.estimate(np.array([[7]]))[0] == 4 * big


def test_motif_results_invariant_to_batch_size(ray_session):
    """Same activation input, different map_batches batch sizes -> identical
    output rows and estimates (batching must never leak into results)."""
    from epichypersketch_jl_ray.pipelines.motifs import motif_pipeline
    from epichypersketch_jl_ray.api import activation_table_from_dict
    from epichypersketch_jl_ray.sources.reference_fixtures import make_ordinary_dict
    import ray.data

    tbl, _ = activation_table_from_dict(make_ordinary_dict())
    outs = []
    for bs in (64, 2048):
        ds = ray.data.from_arrow(tbl)
        df = motif_pipeline(ds, motif_size=3, min_count=8, batch_size=bs).to_pandas()
        cols = sorted(df.columns)
        outs.append(df[cols].sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_hll_register_merge_is_max_not_add():
    """Merging the same data twice must NOT inflate the estimate."""
    from epichypersketch_jl_ray.functions.hashing import hash_int64

    keys = hash_int64(np.arange(5000), seed=2)
    a = HyperLogLog(p=12).update_hashed(keys)
    b = HyperLogLog(p=12).update_hashed(keys)
    est_before = a.estimate()
    a.merge(b)
    assert a.estimate() == est_before
