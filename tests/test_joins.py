"""Join operator tests: the portable bucketed hash join (fallback pattern)
vs pandas ground truth, and the as-of join vs pandas merge_asof."""

import numpy as np
import pandas as pd
import pytest


def test_bucketed_hash_join_matches_pandas(ray_session):
    import ray.data

    from epichypersketch_jl_ray.stages.join import bucketed_hash_join

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500), "lv": rng.integers(0, 1000, 500)})
    right = pd.DataFrame({"rk": np.arange(0, 60), "rv": np.arange(100, 160)})
    out = bucketed_hash_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left_on="k",
        right_on="rk",
        bucket_count=8,
    ).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk", how="inner")
    cols = ["k", "lv", "rk", "rv"]
    a = out[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    b = want[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_asof_join_matches_pandas(ray_session):
    import ray.data

    from epichypersketch_jl_ray.stages.join import bucketed_asof_join

    rng = np.random.default_rng(4)
    left = pd.DataFrame(
        {"u": rng.integers(0, 10, 200), "t": rng.integers(0, 10_000, 200).astype("int64")}
    )
    right = pd.DataFrame(
        {
            "u": rng.integers(0, 10, 100),
            "t": rng.integers(0, 10_000, 100).astype("int64"),
            "v": rng.integers(0, 100, 100).astype("int64"),
        }
    ).drop_duplicates(subset=["u", "t"])
    out = bucketed_asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), by="u", on="t", bucket_count=4
    ).to_pandas()
    want = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable").rename(columns={"t": "t_r", "v": "v_r"}),
        left_on="t",
        right_on="t_r",
        by="u",
        direction="backward",
        allow_exact_matches=True,
    ).dropna(subset=["t_r"])
    cols = ["u", "t", "t_r", "v_r"]
    a = out[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    b = want[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(a, b)


def test_hash_join_keeps_all_null_columns_within_bucket(ray_session):
    """A nullable payload column that is entirely null inside one bucket must
    survive the join with nulls (the old dropna(axis=1) silently dropped it,
    producing inconsistent per-group schemas)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    from epichypersketch_jl_ray.stages.join import bucketed_hash_join

    keys = np.arange(200, dtype=np.int64)
    left = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "lv": pa.array(keys * 2, pa.int64())})
    )
    # note: only key 0's rows carry a non-null payload -> in every bucket but
    # key 0's, "note" is all-null
    note = pa.array(["hit" if k == 0 else None for k in keys], pa.string())
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(keys, pa.int64()), "note": note})
    )
    out = bucketed_hash_join(left, right, left_on="k", right_on="rk", bucket_count=16).to_pandas()
    assert len(out) == 200
    assert "note" in out.columns
    assert out.loc[out["k"] == 0, "note"].iloc[0] == "hit"
    assert out["note"].isna().sum() == 199
