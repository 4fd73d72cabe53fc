"""API surface: every accepted activation input type produces identical
results; pipeline output writes as partitioned parquet and reads back."""

import glob

import pandas as pd
import pyarrow.parquet as pq
import pytest

from epichypersketch_jl_ray.sources.reference_fixtures import make_ordinary_dict


@pytest.fixture(scope="module")
def api(ray_session):
    from epichypersketch_jl_ray import api

    return api


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_all_input_types_equivalent(api):
    import ray.data

    d = make_ordinary_dict()
    tbl, _ = api.activation_table_from_dict(d)
    from_dict = api.obtain_enriched_configurations(d, motif_size=3, min_count=10)
    from_arrow = api.obtain_enriched_configurations(tbl, motif_size=3, min_count=10)
    from_ds = api.obtain_enriched_configurations(
        ray.data.from_arrow(tbl), motif_size=3, min_count=10
    )
    pd.testing.assert_frame_equal(_norm(from_dict), _norm(from_arrow))
    pd.testing.assert_frame_equal(_norm(from_dict), _norm(from_ds))


def test_namedtuple_input(api):
    from collections import namedtuple

    Feat = namedtuple("Feat", ["feature", "contribution"])
    d = {i: [Feat(7, 1.0), Feat(19, 1.0), Feat(42, 1.0)] for i in range(1, 6)}
    out = api.obtain_enriched_configurations(d, motif_size=3, min_count=5)
    assert len(out) == 5
    assert tuple(out.iloc[0][["m1", "m2", "m3"]]) == (7, 19, 42)


def test_motif_output_to_partitioned_parquet(ray_session, tmp_path, sf_dir):
    from epichypersketch_jl_ray.pipelines.motifs import motifs_conv
    from epichypersketch_jl_ray.sources.sinks import write_partitioned

    ds = motifs_conv(sf_dir)
    out = write_partitioned(ds, str(tmp_path / "motifs"))
    files = glob.glob(f"{out}/*.parquet")
    assert files
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert total == motifs_conv(sf_dir).count()


def test_simple_example_runs():
    """The runnable example (mirror of the reference's
    examples/simple_example.jl) executes end-to-end in its own process."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "simple_example.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "motif occurrences" in proc.stdout
    assert "Done!" in proc.stdout
