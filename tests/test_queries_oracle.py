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
