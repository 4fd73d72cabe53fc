"""Fault-tolerance: corrupted/torn checkpoint blobs are detected by digest
validation and recomputed; the resumed state is byte-identical. Plus
public-API export surface and format_duration."""

import glob
import json

import pytest


def test_corrupt_blob_recomputed(ray_session, tmp_path):
    from epichypersketch_jl_ray.checkpoint import build_checkpointed, read_manifest
    from epichypersketch_jl_ray.pipelines.webpages import make_state, web_batch_features
    from epichypersketch_jl_ray.sources.webpages import webpages_dir_for
    from epichypersketch_jl_ray.state.websketch import WebSketchState

    web_dir = webpages_dir_for(3000, n_shards=8)
    files = sorted(glob.glob(f"{web_dir}/*.parquet"))

    def make_partial(tbl):
        keys, url_h, lengths, _ = web_batch_features(tbl)
        return make_state().update(ngram_keys=keys, url_hashes=url_h, text_lengths=lengths)

    ck = str(tmp_path / "ck")
    clean, m1 = build_checkpointed(files, make_partial, WebSketchState, ck)
    # simulate a torn write: truncate one blob
    victim = read_manifest(ck)[files[3]]["blob"]
    with open(victim, "r+b") as fh:
        fh.truncate(100)
    resumed, m2 = build_checkpointed(files, make_partial, WebSketchState, ck)
    # the corrupted partition was recomputed, the rest resumed
    assert m2["resumed_partitions"] == len(files) - 1
    assert resumed.cms.digest() == clean.cms.digest()
    assert resumed.bloom.digest() == clean.bloom.digest()
    # manifest records the retry
    rec = read_manifest(ck)[files[3]]
    assert rec["attempt"] >= 2


def test_public_api_exports():
    import epichypersketch_jl_ray as pkg

    assert callable(pkg.obtain_enriched_configurations)
    assert callable(pkg.build_checkpointed)
    for name in ("CountMin", "HyperLogLog", "KLL", "TDigest", "BloomFilter"):
        assert getattr(pkg, name) is not None
    with pytest.raises(AttributeError):
        pkg.nonexistent_symbol


def test_format_duration():
    from epichypersketch_jl_ray.functions.perf import format_duration, timed

    assert format_duration(0.05) == "50ms"
    assert format_duration(12.3) == "12.30s"
    assert format_duration(75) == "1m15s"
    assert format_duration(3700) == "1h1m40s"
    sink = {}
    with timed("x", sink):
        pass
    assert "x" in sink


def test_empty_shard_contributes_empty_partial(ray_session, tmp_path):
    """An input shard with zero rows must not abort the checkpointed build:
    it contributes an empty partial and rows=0 in the manifest, and the
    merged state equals the build without the empty shard."""
    import shutil

    import pyarrow.parquet as pq

    from epichypersketch_jl_ray.checkpoint import build_checkpointed, read_manifest
    from epichypersketch_jl_ray.pipelines.webpages import make_state, web_batch_features
    from epichypersketch_jl_ray.sources.webpages import webpages_dir_for
    from epichypersketch_jl_ray.state.websketch import WebSketchState

    web_dir = webpages_dir_for(1500, n_shards=4)
    src_files = sorted(glob.glob(f"{web_dir}/*.parquet"))
    work = tmp_path / "shards"
    work.mkdir()
    files = []
    for f in src_files:
        dst = work / f.split("/")[-1]
        shutil.copy(f, dst)
        files.append(str(dst))
    # one legitimately empty shard, same schema
    schema = pq.ParquetFile(files[0]).schema_arrow
    empty = str(work / "zz-empty.parquet")
    pq.write_table(schema.empty_table(), empty)

    def make_partial(tbl):
        keys, url_h, lengths, _ = web_batch_features(tbl)
        return make_state().update(ngram_keys=keys, url_hashes=url_h, text_lengths=lengths)

    base, _ = build_checkpointed(files, make_partial, WebSketchState, str(tmp_path / "ck1"))
    with_empty, m = build_checkpointed(
        files + [empty], make_partial, WebSketchState, str(tmp_path / "ck2")
    )
    assert base.cms.digest() == with_empty.cms.digest()
    assert base.hll.digest() == with_empty.hll.digest()
    assert read_manifest(str(tmp_path / "ck2"))[empty]["rows"] == 0
    assert m["rows"] == sum(pq.ParquetFile(f).metadata.num_rows for f in files)
