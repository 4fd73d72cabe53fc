"""Webtext flagship: fixture determinism, byte-identical extraction,
planted-truth sketch accuracy, checkpoint/resume equality, batching
invariance (north_rule test battery; FIXTURES.md F1/F2/F5)."""

import shutil

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from epichypersketch_jl_ray.sources.webpages import (
    PLANTS,
    expected_distinct_urls,
    generate_webpages,
    held_out_urls,
    webpages_dir_for,
)

N = 3000


@pytest.fixture(scope="module")
def web_dir(ray_session):
    return webpages_dir_for(N, n_shards=8)


def test_fixture_deterministic_and_shard_invariant(tmp_path):
    a = generate_webpages(str(tmp_path / "a"), 500, n_shards=4)
    b = generate_webpages(str(tmp_path / "b"), 500, n_shards=10)
    ta = pq.read_table(a[0]).schema
    import pyarrow as pa

    tbl_a = pa.concat_tables([pq.read_table(f) for f in a])
    tbl_b = pa.concat_tables([pq.read_table(f) for f in b])
    assert tbl_a.equals(tbl_b)
    # regeneration is byte-stable
    c = generate_webpages(str(tmp_path / "c"), 500, n_shards=4)
    assert pa.concat_tables([pq.read_table(f) for f in c]).equals(tbl_a)


def test_extraction_byte_identical(web_dir):
    import pyarrow as pa

    from epichypersketch_jl_ray.functions.html import extract_text

    tbl = pq.read_table(f"{web_dir}/webpages-00000.parquet")
    out = extract_text(tbl["html"].combine_chunks())
    stored = tbl["text"].combine_chunks()
    assert out.equals(stored)


@pytest.fixture(scope="module")
def web_state(web_dir):
    from epichypersketch_jl_ray.pipelines.webpages import build_web_sketches

    return build_web_sketches(web_dir, batch_size=512)


def test_flagship_counts_and_bounds(web_dir, web_state):
    st = web_state
    assert st.rows_seen == N
    # distinct urls via HLL
    true_distinct = expected_distinct_urls(N)
    rse = 1.04 / np.sqrt(st.hll.m)
    assert abs(st.hll.estimate() - true_distinct) <= 4 * rse * true_distinct + 2
    # planted (lang, trigram) heavy hitters: exact truth via duckdb
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW w AS SELECT * FROM read_parquet('{web_dir}/*.parquet')"
    )
    from epichypersketch_jl_ray.pipelines.webpages import query_plants

    for phrase, _ in PLANTS:
        truth = {
            r[0]: r[1]
            for r in con.sql(
                f"SELECT lang, count(*) FROM w WHERE text LIKE '%{phrase}%' GROUP BY 1"
            ).fetchall()
        }
        est = query_plants(st, [(lang, phrase) for lang in truth])
        eps_n = 5e-5 * st.cms.n_inserts
        for _, row in est.iterrows():
            t = truth[row["lang"]]
            assert row["estimate"] >= t, (phrase, row["lang"])  # never undercounts
            assert row["estimate"] <= t + eps_n + 1, (phrase, row["lang"])
    # quantiles sane
    q50 = st.kll.quantile(0.5)
    lens = con.sql("SELECT length(text) FROM w ORDER BY 1").df().iloc[:, 0].to_numpy()
    true_rank = np.searchsorted(lens, q50) / len(lens)
    assert abs(true_rank - 0.5) < 0.05
    # bloom: all present urls hit, held-out absent
    from epichypersketch_jl_ray.functions.hashing import fnv1a64
    import pyarrow as pa

    urls = con.sql("SELECT DISTINCT url FROM w").df().iloc[:, 0].tolist()
    assert st.bloom.contains_hashed(fnv1a64(pa.array(urls))).all()
    absent = st.bloom.contains_hashed(fnv1a64(pa.array(held_out_urls())))
    assert absent.sum() == 0


def test_batching_invariance(web_dir, web_state):
    """Different batch size => byte-identical CMS/HLL/Bloom (the N-vs-4N
    reproducibility argument, SURVEY.md §4)."""
    from epichypersketch_jl_ray.pipelines.webpages import build_web_sketches

    st2 = build_web_sketches(web_dir, batch_size=200, concurrency=2)
    for name in ("cms", "hll", "bloom"):
        assert getattr(st2, name).digest() == getattr(web_state, name).digest(), name
    assert st2.kll.n == web_state.kll.n
    assert abs(st2.kll.quantile(0.5) - web_state.kll.quantile(0.5)) <= np.quantile(
        [1.0], 0.5
    ) * 0 + 50  # same-bound sanity; exactness not required for KLL


def test_merge_order_invariance(web_dir):
    from epichypersketch_jl_ray.pipelines.webpages import WebSketchBuilder, make_state
    import pyarrow as pa

    tbl = pq.read_table(f"{web_dir}/webpages-00001.parquet")
    b = WebSketchBuilder()
    chunks = [tbl.slice(i, 100) for i in range(0, len(tbl), 100)]
    from epichypersketch_jl_ray.state.websketch import WebSketchState

    parts = [WebSketchState.from_bytes(b(c)["state"][0].as_py()) for c in chunks]
    rng = np.random.default_rng(0)
    digests = set()
    for _ in range(3):
        order = rng.permutation(len(parts))
        acc = WebSketchState.from_bytes(parts[order[0]].to_bytes())
        for i in order[1:]:
            acc.merge(WebSketchState.from_bytes(parts[i].to_bytes()))
        digests.add((acc.cms.digest(), acc.hll.digest(), acc.bloom.digest()))
    assert len(digests) == 1


def test_checkpoint_resume_identical(web_dir, tmp_path):
    from epichypersketch_jl_ray.checkpoint import build_checkpointed
    from epichypersketch_jl_ray.pipelines.webpages import web_batch_features, make_state
    from epichypersketch_jl_ray.state.websketch import WebSketchState
    import glob

    files = sorted(glob.glob(f"{web_dir}/*.parquet"))

    def make_partial(tbl):
        keys, url_h, lengths, _ = web_batch_features(tbl)
        return make_state().update(ngram_keys=keys, url_hashes=url_h, text_lengths=lengths)

    ck_full = str(tmp_path / "full")
    full, m_full = build_checkpointed(files, make_partial, WebSketchState, ck_full)
    assert m_full["resumed_partitions"] == 0 and m_full["rows"] == N

    # simulate a killed run: first half only, then resume with everything
    ck_half = str(tmp_path / "half")
    build_checkpointed(files[:4], make_partial, WebSketchState, ck_half)
    resumed, m_res = build_checkpointed(files, make_partial, WebSketchState, ck_half)
    assert m_res["resumed_partitions"] == 4
    for name in ("cms", "hll", "bloom", "kll", "tdigest"):
        assert getattr(resumed, name).digest() == getattr(full, name).digest(), name
    # rerunning resume with everything done is a no-op with identical state
    again, m2 = build_checkpointed(files, make_partial, WebSketchState, ck_half)
    assert m2["resumed_partitions"] == len(files)
    assert again.cms.digest() == full.cms.digest()


def test_bloom_capacity_sized_to_corpus(ray_session):
    """The Bloom capacity derives from the corpus row count (round-1 soak
    lesson: the fixed default overfilled to 0.78 at 10M docs). Rule:
    capacity >= docs (distinct urls <= docs), floored at 2^16; at its rated
    capacity a Bloom's fill stays at/below ~0.55."""
    import numpy as np

    from epichypersketch_jl_ray.pipelines.webpages import (
        bloom_capacity_for,
        build_web_sketches,
        corpus_rows,
        make_state,
    )
    from epichypersketch_jl_ray.sources.webpages import webpages_dir_for

    assert bloom_capacity_for(10_000_000) >= 10_000_000
    assert bloom_capacity_for(100) == 1 << 16
    st = make_state(n_docs_hint=3_000_000)
    assert st.bloom.capacity >= 3_000_000
    # explicit bloom_capacity wins over the hint
    st2 = make_state(n_docs_hint=3_000_000, bloom_capacity=1 << 20)
    assert st2.bloom.capacity == 1 << 20

    web_dir = webpages_dir_for(3000, n_shards=4)
    assert corpus_rows(web_dir) == 3000
    state = build_web_sketches(web_dir)
    assert state.bloom.capacity >= 3000
    assert state.bloom.fill_ratio() < 0.55

    # at rated capacity, fill stays at the ~0.5 design point
    probe = make_state(n_docs_hint=100_000)
    rng = np.random.default_rng(3)
    probe.bloom.add_hashed(rng.integers(0, 2**63, size=probe.bloom.capacity, dtype=np.uint64))
    assert probe.bloom.fill_ratio() <= 0.55
