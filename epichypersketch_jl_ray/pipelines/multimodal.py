"""Multimodal pipelines: binary payload column → decode (actor pool) →
featurize → embedding column.

The driver queries run REAL decodes end-to-end — the fixtures are valid
BMP / PNG / baseline+progressive-JPEG / GIF / lossless-WebP / WAV-PCM /
FLAC / raw-video / animated-GIF payloads and the decoders are the
pure-numpy/stdlib parsers in functions/codecs.py. The remaining
compressed formats (MP3/H.264/lossy-WebP) stay behind the documented
NotImplementedError seams in stages/multimodal.py, exercised by the fake
fixtures in tests.
Rows-only driver check — binary fixtures have no SQL oracle; decode
round-trip exactness is pinned by tests/test_codecs.py.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray


from epichypersketch_jl_ray.stages.multimodal import (
    DecodeImage,
    FeaturizeImage,
    FrameSampleVideo,
    WindowAudio,
    make_mixed_audio_table,
    make_mixed_image_table,
    make_mixed_video_table,
)


def _as_blocks(tbl: pa.Table, rows_per_block: int) -> list[pa.Table]:
    """Split a driver-built fixture table into batch-sized blocks so the
    decode actor pools actually fan out. A real deployment reads payloads
    with read_parquet/read_binary_files and gets many blocks for free; a
    single from_arrow block would pin the whole decode on one actor (Ray
    warns 'operator only received 1 input')."""
    return [tbl.slice(i, rows_per_block) for i in range(0, tbl.num_rows, rows_per_block)]


def image_features(sf_dir: str, *, n: int = 512, dim: int = 16) -> pd.DataFrame:
    """Deterministic mixed BMP+PNG+JPEG+GIF+WebP corpus → REAL decode
    (pure-numpy BI_RGB parser; stdlib-zlib + numpy-unfilter PNG across all
    five row filters; table-driven JPEG, baseline and progressive SOF2; LZW
    GIF incl. interlace; VP8L WebP; actor pool) → feature vectors.

    ``sf_dir`` only scales the corpus (the multimodal fixture is generated,
    not read from the sf tables).
    """
    scale = {"sf0.001": 1, "sf0.01": 2, "sf0.1": 8}.get(sf_dir.rstrip("/").rsplit("/", 1)[-1], 1)
    tbl = make_mixed_image_table(n * scale)
    ds = ray.data.from_arrow(_as_blocks(tbl, 256))
    decoded = ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=4,
    )
    feats = decoded.map_batches(
        FeaturizeImage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )
    return feats.to_pandas()


def video_frame_features(sf_dir: str, *, n: int = 64, stride: int = 8, dim: int = 8) -> pd.DataFrame:
    """Mixed raw + animated-GIF + MJPEG-AVI + Y4M video corpus (ffmpeg
    rawvideo layout / GIF89a LZW / RIFF-AVI with per-frame JPEGs / YUV4MPEG2)
    → frame sampling (actor pool, REAL decode on all four container paths)
    → per-frame feature vectors. One output row per sampled frame."""
    scale = {"sf0.001": 1, "sf0.01": 2, "sf0.1": 4}.get(sf_dir.rstrip("/").rsplit("/", 1)[-1], 1)
    tbl = make_mixed_video_table(n * scale)
    ds = ray.data.from_arrow(_as_blocks(tbl, 32))
    frames = ds.map_batches(
        FrameSampleVideo,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=4,
    )
    feats = frames.map_batches(
        FeaturizeImage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )
    return feats.to_pandas()


def audio_window_features(sf_dir: str, *, n: int = 64, window: int = 1024, dim: int = 8) -> pd.DataFrame:
    """Mixed WAV-PCM + FLAC corpus → REAL decode (pure-numpy RIFF parser /
    full-spec FLAC with Rice, LPC, partitions and escapes) + window chunking
    (actor pool) → per-window feature vectors. One output row per analysis
    window."""
    scale = {"sf0.001": 1, "sf0.01": 2, "sf0.1": 4}.get(sf_dir.rstrip("/").rsplit("/", 1)[-1], 1)
    tbl = make_mixed_audio_table(n * scale)
    ds = ray.data.from_arrow(_as_blocks(tbl, 32))
    windows = ds.map_batches(
        WindowAudio,
        fn_constructor_kwargs={"window": window},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=4,
    )
    feats = windows.map_batches(
        FeaturizeImage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )
    return feats.to_pandas()
