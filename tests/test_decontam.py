"""Benchmark decontamination (pipelines/curate.decontaminate_corpus):
planted shared-n-gram fixture, exact window-boundary behavior, and
broadcast-vs-semi-join path equality against the DuckDB string oracle."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from epichypersketch_jl_ray.pipelines import curate


def _write_docs(tmp_path, rows: list[tuple[int, str]], name: str = "sf_decontam") -> str:
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    sf = tmp_path / name
    sf.mkdir()
    pq.write_table(tbl, sf / "documents.parquet")
    return str(sf)


def test_planted_contamination_and_window_boundary(ray_session, tmp_path):
    ev = " ".join(f"e{i}" for i in range(20))  # doc 11 -> eval set (11 % 11 == 0)
    shared8 = " ".join(f"e{i}" for i in range(5, 13))  # 8 consecutive eval tokens
    shared7 = " ".join(f"e{i}" for i in range(5, 12))  # only 7 consecutive
    rows = [
        (11, ev),
        (1, "a1 a2 a3 " + shared8 + " a4 a5"),  # contaminated (8-token window)
        (2, "b1 b2 b3 " + shared7 + " b4 b5 b6"),  # clean: longest overlap is 7
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),  # clean
        (4, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),  # exact dup of 3 -> dropped by head
        (5, "short doc"),  # < n tokens: can never be contaminated
    ]
    sf = _write_docs(tmp_path, rows)

    out = sorted(curate.decontaminate_corpus(sf, min_chars=0).to_pandas()["doc_id"])
    assert out == [2, 3, 5]

    # forced semi-join path must agree exactly
    out_sj = sorted(
        curate.decontaminate_corpus(sf, min_chars=0, broadcast_cap=0).to_pandas()["doc_id"]
    )
    assert out_sj == out

    # and both must match the string-n-gram DuckDB oracle
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle = sorted(
        r[0] for r in con.execute(curate.decontaminate_corpus_sql(min_chars=0)).fetchall()
    )
    assert out == oracle


def test_eval_docs_excluded_and_no_eval_means_no_drops(ray_session, tmp_path):
    # no doc_id divisible by 11 -> empty eval set -> every keeper survives
    rows = [(1, " ".join(f"t{i}" for i in range(30))), (2, " ".join(f"u{i}" for i in range(30)))]
    sf = _write_docs(tmp_path, rows)
    out = sorted(curate.decontaminate_corpus(sf, min_chars=0).to_pandas()["doc_id"])
    assert out == [1, 2]

    # an eval doc never appears in the training output, even when clean
    rows.append((22, " ".join(f"v{i}" for i in range(30))))
    sf2 = _write_docs(tmp_path, rows, name="sf_with_eval")
    out2 = sorted(curate.decontaminate_corpus(sf2, min_chars=0).to_pandas()["doc_id"])
    assert out2 == [1, 2]
