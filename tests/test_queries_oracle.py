"""Integration: every oracled queries() entry must exactly match its DuckDB
oracle at sf0.001 (the driver runs the same compare at sf0.01); non-oracled
(approximate) queries must run and satisfy their published bounds."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")
from oracle_util import compare, duck_con, to_pandas


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


def test_all_oracled_queries_match(entrymod, con, sf_dir):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, sql in oracles.items():
        ours = to_pandas(qs[name](sf_dir))
        theirs = con.sql(sql).df()
        failures += compare(name, ours, theirs)
    assert not failures, failures


def test_non_oracled_queries_run(entrymod, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        pdf = to_pandas(qs[name](sf_dir))
        assert len(pdf) >= 1, name


def test_hll_within_bound(entrymod, con, sf_dir):
    qs = entrymod.queries()
    df = to_pandas(qs["distinct_users_hll"](sf_dir))
    est_rows = df[df["bucket"] == -1]
    est = float(est_rows.loc[est_rows["event_type"] == "*", "value"].iloc[0])
    true = con.sql("SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert abs(est - true) <= 4 * (1.04 / np.sqrt(2**14)) * true + 2


def test_hll_linear_counting_matches_duckdb_ln_over_full_domain():
    """The registered HLL estimate row hash-matches SQL only if the scalar
    libm log used by state/hll.py's linear-counting branch is bit-identical
    to DuckDB's ln for every possible V in [1, m]. Pin that over the FULL
    domain (m = 2^14), so any libm/DuckDB drift fails loudly here instead of
    as a driver hash mismatch."""
    import math

    import duckdb

    m = 1 << 14
    ours = np.array([m * math.log(m / v) for v in range(1, m + 1)], dtype=np.float64)
    theirs = (
        duckdb.sql(
            f"SELECT {m}.0*ln({m}.0/CAST(v AS DOUBLE)) AS e"
            f" FROM (SELECT unnest(range(1,{m + 1})) AS v)"
        )
        .df()["e"]
        .to_numpy()
    )
    assert np.array_equal(ours.view(np.uint64), theirs.view(np.uint64))


def test_ddsketch_bucket_index_matches_duckdb_over_domain():
    """The ddsketch rows of doc_length_quantiles_approx hash-match SQL only
    if ceil(log(v)/log_gamma) in DDSketch.update (vectorized np.log over
    scalar-libm math.log(gamma)) equals DuckDB's ceil(ln(v)/ln(gamma)) for
    every integer value the documents table can hold. Pin exhaustively over
    [1, 2^17] — any libm/SIMD drift that flips a bucket fails loudly here
    instead of as a driver hash mismatch (the state/hll.py ln lesson)."""
    import duckdb

    from epichypersketch_jl_ray.state.ddsketch import DDSketch

    dd = DDSketch(alpha=0.01)
    n = 1 << 17
    v = np.arange(1, n + 1, dtype=np.float64)
    ours = np.ceil(np.log(v) / dd._log_gamma).astype(np.int64)
    theirs = (
        duckdb.sql(
            f"SELECT CAST(ceiling(ln(CAST(v AS DOUBLE)) / ln({dd.gamma!r})) AS BIGINT) AS i"
            f" FROM (SELECT unnest(range(1, {n + 1})) AS v)"
        )
        .df()["i"]
        .to_numpy()
    )
    assert np.array_equal(ours, theirs)


def test_ddsketch_bucket_midpoint_matches_duckdb_power():
    """Same pin for the reported value: gamma**i * 2/(gamma+1) in
    DDSketch.quantile vs DuckDB power(gamma, i) * 2/(gamma+1), over every
    bucket index the [1, 2^17] value domain can produce (plus margin)."""
    import duckdb

    from epichypersketch_jl_ray.state.ddsketch import DDSketch

    dd = DDSketch(alpha=0.01)
    g = dd.gamma
    lo, hi = -8, 1200  # ceil(ln(2^17)/ln(gamma)) ~ 593 at alpha=0.01
    ours = np.array([g**i * 2.0 / (g + 1.0) for i in range(lo, hi)])
    theirs = (
        duckdb.sql(
            f"SELECT power({g!r}, CAST(i AS DOUBLE)) * 2.0 / ({g!r} + 1.0) AS x"
            f" FROM (SELECT unnest(range({lo}, {hi})) AS i)"
        )
        .df()["x"]
        .to_numpy()
    )
    assert np.array_equal(ours.view(np.uint64), theirs.view(np.uint64))


def test_tdigest_within_bound(entrymod, con, sf_dir):
    qs = entrymod.queries()
    approx = to_pandas(qs["doc_length_quantiles_approx"](sf_dir))
    td = approx[approx["method"] == "tdigest"]
    vals = con.sql("SELECT n_chars FROM documents ORDER BY n_chars").df()["n_chars"].to_numpy()
    for _, row in td.iterrows():
        true_rank = np.searchsorted(vals, row["n_chars_q"]) / len(vals)
        assert abs(true_rank - row["q"]) < 0.05


def test_entry_smoke(entrymod):
    res = entrymod.entry()
    pdf = to_pandas(res)
    assert len(pdf) >= 0
    assert sorted(pdf.columns) == ["estimate", "ngram"]
