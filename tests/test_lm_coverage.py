"""Reference-LM coverage columns of doc_stats (pipelines/textstats.py):
CCNet-style bigram-vocabulary agreement with a reference slice, exact by
construction (integer counts + one IEEE division). Oracle parity is covered
by test_queries_oracle; here: planted-vocabulary exactness and the forced
semi-join (over-cap) path pinned equal to the broadcast path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, rows):
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_lm_coverage_planted(ray_session, tmp_path):
    from epichypersketch_jl_ray.pipelines.textstats import doc_stats

    # ref slice = doc_id % 10 == 0 -> doc 0 and doc 10.
    # reference bigrams: {"a b", "b c", "x y"}; reference tokens: {a,b,c,x,y}
    rows = [
        (0, "a b c"),
        (10, "x y"),
        (1, "a b c"),      # bigrams (a b), (b c): 2/2 hits, 0 oov
        (2, "b c q"),      # (b c) hit, (c q) miss; q oov -> 1/2, oov 1
        (3, "q"),          # no bigrams, 1 oov token
        (4, "b a"),        # (b a) not in ref -> 0/1 hits
    ]
    out = (
        doc_stats(_write_docs(tmp_path, rows))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    exp = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 10],
            "n_bigrams": [2, 2, 2, 0, 1, 1],
            "lm_hits": [2, 2, 1, 0, 0, 1],
            "oov_tokens": [0, 0, 1, 1, 0, 0],
            "lm_coverage": [1.0, 1.0, 0.5, 0.0, 0.0, 1.0],
        }
    ).set_index("doc_id")
    for c in exp.columns:
        assert list(out[c]) == list(exp[c]), c


@pytest.mark.parametrize("cap", [0, 3])
def test_lm_semijoin_path_equals_broadcast(ray_session, sf_dir, cap):
    from epichypersketch_jl_ray.pipelines.textstats import doc_stats

    key = ["doc_id"]
    a = doc_stats(sf_dir).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        doc_stats(sf_dir, broadcast_cap=cap)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)[a.columns]
    )
    pd.testing.assert_frame_equal(a, b)


def test_lm_coverage_empty_reference_slice(ray_session, tmp_path):
    """No doc_id % 10 == 0 docs: every bigram misses, every token is OOV."""
    from epichypersketch_jl_ray.pipelines.textstats import doc_stats

    out = (
        doc_stats(_write_docs(tmp_path, [(1, "a b"), (2, "c")]))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out["lm_hits"]) == [0, 0]
    assert list(out["oov_tokens"]) == [2, 1]
    assert list(out["lm_coverage"]) == [0.0, 0.0]
    assert int(np.sum(out["n_bigrams"])) == 1
