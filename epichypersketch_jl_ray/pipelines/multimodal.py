"""Multimodal pipeline: binary payload column → decode (stubbed, actor pool)
→ featurize → embedding column. The decode library seam is documented in
stages/multimodal.py; the deterministic fake decode makes the full Ray
plumbing testable (rows-only driver check — the fixture has no SQL oracle)."""

from __future__ import annotations

import pandas as pd

import ray

from epichypersketch_jl_ray.stages.multimodal import (
    DecodeImage,
    FeaturizeImage,
    FrameSampleVideo,
    WindowAudio,
    make_fake_audio_table,
    make_fake_image_table,
    make_fake_video_table,
)


def image_features(sf_dir: str, *, n: int = 512, dim: int = 16) -> pd.DataFrame:
    """Deterministic fake-image corpus → decode → feature vectors.

    ``sf_dir`` only scales the corpus (the multimodal fixture is generated,
    not read from the sf tables).
    """
    scale = {"sf0.001": 1, "sf0.01": 2, "sf0.1": 8}.get(sf_dir.rstrip("/").rsplit("/", 1)[-1], 1)
    tbl = make_fake_image_table(n * scale)
    ds = ray.data.from_arrow(tbl)
    decoded = ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
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
    """Fake-video corpus → frame sampling (actor pool, stubbed codec) →
    per-frame feature vectors. One output row per sampled frame."""
    scale = {"sf0.001": 1, "sf0.01": 2, "sf0.1": 4}.get(sf_dir.rstrip("/").rsplit("/", 1)[-1], 1)
    tbl = make_fake_video_table(n * scale)
    ds = ray.data.from_arrow(tbl)
    frames = ds.map_batches(
        FrameSampleVideo,
        fn_constructor_kwargs={"stride": stride, "fake": True},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
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
    """Fake-audio corpus → window chunking (actor pool, stubbed codec) →
    per-window feature vectors. One output row per analysis window."""
    scale = {"sf0.001": 1, "sf0.01": 2, "sf0.1": 4}.get(sf_dir.rstrip("/").rsplit("/", 1)[-1], 1)
    tbl = make_fake_audio_table(n * scale)
    ds = ray.data.from_arrow(tbl)
    windows = ds.map_batches(
        WindowAudio,
        fn_constructor_kwargs={"window": window, "fake": True},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )
    feats = windows.map_batches(
        FeaturizeImage,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )
    return feats.to_pandas()
