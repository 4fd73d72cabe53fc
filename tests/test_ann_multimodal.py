"""ANN (brute-force + LSH recall) and multimodal plumbing tests."""

import numpy as np
import pytest


def test_ann_lsh_recall(ray_session, sf_dir):
    from epichypersketch_jl_ray.pipelines.ann import ann_cosine_topk, ann_lsh_topk

    exact = ann_cosine_topk(sf_dir)
    approx = ann_lsh_topk(sf_dir)
    # recall@10 of the LSH path vs brute force
    recalls = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls
    # rank 1 must be the query itself in both (cosine(self)=1)
    for df in (exact, approx):
        r1 = df[df["rank"] == 1]
        assert (r1["query_id"].to_numpy() == r1["neighbor_id"].to_numpy()).all()


def test_multimodal_plumbing(ray_session, sf_dir):
    from epichypersketch_jl_ray.pipelines.multimodal import image_features

    out = image_features(sf_dir, n=128, dim=16)
    assert len(out) == 128
    assert set(out.columns) == {"id", "embedding"}
    assert all(len(e) == 16 for e in out["embedding"].head(10))
    # deterministic across runs
    out2 = image_features(sf_dir, n=128, dim=16)
    a = np.array(out.sort_values("id")["embedding"].tolist())
    b = np.array(out2.sort_values("id")["embedding"].tolist())
    assert np.array_equal(a, b)


def test_decode_stub_raises_without_fake(ray_session):
    """The codec seam is per-mime at call time: fake payloads without
    fake=True and compressed mimes raise; real formats (BMP) never do."""
    from epichypersketch_jl_ray.stages.multimodal import DecodeImage, make_fake_image_table

    with pytest.raises(NotImplementedError):
        DecodeImage()(make_fake_image_table(2))


def test_decode_validates_payload(ray_session):
    import pyarrow as pa

    from epichypersketch_jl_ray.stages.multimodal import DecodeImage, make_fake_image_table

    tbl = make_fake_image_table(4)
    bad = tbl.set_column(3, "width", pa.array([99] * 4, pa.int32()))
    with pytest.raises(ValueError):
        DecodeImage(fake=True)(bad)


def test_video_frame_sampling(ray_session, sf_dir):
    from epichypersketch_jl_ray.pipelines.multimodal import video_frame_features
    from epichypersketch_jl_ray.stages.multimodal import FrameSampleVideo, make_fake_video_table

    out = video_frame_features(sf_dir, n=32, stride=8)
    # 24 frames, stride 8 -> frames 0, 8, 16 per video
    per_video = out.groupby("id")["frame_idx"].apply(sorted)
    assert all(v == [0, 8, 16] for v in per_video)
    # deterministic
    out2 = video_frame_features(sf_dir, n=32, stride=8)
    a = np.array(out.sort_values(["id", "frame_idx"])["embedding"].tolist())
    b = np.array(out2.sort_values(["id", "frame_idx"])["embedding"].tolist())
    assert np.array_equal(a, b)
    with pytest.raises(NotImplementedError):
        FrameSampleVideo(stride=8)(make_fake_video_table(2))
    with pytest.raises(ValueError):
        FrameSampleVideo(stride=0, fake=True)


def test_audio_windowing(ray_session, sf_dir):
    from epichypersketch_jl_ray.pipelines.multimodal import audio_window_features
    from epichypersketch_jl_ray.stages.multimodal import WindowAudio

    out = audio_window_features(sf_dir, n=16, window=1024)
    # 4096 samples / 1024 window -> 4 windows per clip
    per_clip = out.groupby("id")["window_idx"].apply(sorted)
    assert all(v == [0, 1, 2, 3] for v in per_clip)
    assert all(len(e) == 8 for e in out["embedding"].head(5))
    from epichypersketch_jl_ray.stages.multimodal import make_fake_audio_table

    with pytest.raises(NotImplementedError):
        WindowAudio(window=1024)(make_fake_audio_table(2))


def test_multimodal_stages_honour_sliced_batches():
    """A zero-copy sliced batch has a non-zero array offset; the decode
    stages must read the right rows' payload bytes (uniform payload sizes
    would otherwise pass the length check while reading the wrong rows)."""
    import numpy as np
    import pyarrow as pa

    from epichypersketch_jl_ray.stages.multimodal import (
        DecodeImage,
        FrameSampleVideo,
        WindowAudio,
        make_fake_audio_table,
        make_fake_image_table,
        make_fake_video_table,
    )

    img = make_fake_image_table(10)
    full = DecodeImage(fake=True)(img)
    part = DecodeImage(fake=True)(img.slice(4, 3))
    for i in range(3):
        assert np.array_equal(
            np.asarray(part["pixels"][i].as_py()), np.asarray(full["pixels"][4 + i].as_py())
        )

    vid = make_fake_video_table(6)
    vfull = FrameSampleVideo(stride=8, fake=True)(vid).to_pandas()
    vpart = FrameSampleVideo(stride=8, fake=True)(vid.slice(2, 2)).to_pandas()
    for _, row in vpart.iterrows():
        ref = vfull[(vfull["id"] == row["id"]) & (vfull["frame_idx"] == row["frame_idx"])]
        assert np.array_equal(np.asarray(row["pixels"]), np.asarray(ref.iloc[0]["pixels"]))

    aud = make_fake_audio_table(6)
    afull = WindowAudio(window=1024, fake=True)(aud).to_pandas()
    apart = WindowAudio(window=1024, fake=True)(aud.slice(3, 2)).to_pandas()
    for _, row in apart.iterrows():
        ref = afull[(afull["id"] == row["id"]) & (afull["window_idx"] == row["window_idx"])]
        assert np.array_equal(np.asarray(row["pixels"]), np.asarray(ref.iloc[0]["pixels"]))


def test_binary_buffers_slice_safe():
    """_binary_buffers on a plain sliced Array (offset != 0) must return the
    sliced rows' offsets, not the parent buffer's start."""
    import numpy as np
    import pyarrow as pa

    from epichypersketch_jl_ray.stages.multimodal import _binary_buffers, make_fake_image_table

    arr = make_fake_image_table(10)["payload"].combine_chunks()
    sl = arr.slice(4, 3)
    assert sl.offset == 4
    offsets, values = _binary_buffers(sl)
    assert len(offsets) == 4
    for i in range(3):
        assert bytes(values[offsets[i] : offsets[i + 1]]) == arr[4 + i].as_py()


def test_ann_ivf_recall_vs_bruteforce(ray_session, sf_dir):
    """IVF probing: exact ranking of probed candidates, recall vs the exact
    brute-force top-k."""
    from epichypersketch_jl_ray.pipelines.ann import ann_cosine_topk, ann_ivf_topk

    exact = ann_cosine_topk(sf_dir)
    ivf = ann_ivf_topk(sf_dir)
    want = set(zip(exact["query_id"], exact["neighbor_id"]))
    got = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"recall {recall:.2f}"
    # each query's own vector lives in its best-probed list -> rank 1 found
    self_hits = ivf[(ivf["query_id"] == ivf["neighbor_id"]) & (ivf["rank"] == 1)]
    assert len(self_hits) == ivf["query_id"].nunique()


def test_frequent_directions_bound_and_merge():
    """FD covariance guarantee 0 <= x'(A'A-B'B)x <= ||A||_F^2/ell, merge
    composes the bound, and the sketched top subspace captures almost all
    the energy of a planted low-rank + noise matrix."""
    import numpy as np

    from epichypersketch_jl_ray.state.frequentdirections import FrequentDirections

    rng = np.random.default_rng(2)
    d, n, ell = 32, 5000, 24
    basis = np.linalg.qr(rng.standard_normal((d, 4)))[0].T  # 4 planted directions
    A = rng.standard_normal((n, 4)) @ (basis * np.array([10, 8, 6, 4])[:, None])
    A += 0.1 * rng.standard_normal((n, d))

    whole = FrequentDirections(d, ell=ell).update(A)
    parts = [FrequentDirections(d, ell=ell).update(c) for c in np.array_split(A, 7)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)

    ata = A.T @ A
    for fd in (whole, merged):
        diff = ata - fd.cov_estimate()
        eig = np.linalg.eigvalsh(diff)
        assert eig.min() > -1e-6  # one-sided: B'B never overestimates
        assert eig.max() <= fd.error_bound() + 1e-6
        # planted 4-dim subspace recovered: projecting A on the sketch's top-4
        # directions keeps ~all of the energy the exact top-4 keeps
        _, vt = fd.top_directions(4)
        exact_energy = (np.linalg.svd(A, compute_uv=False)[:4] ** 2).sum()
        got_energy = ((A @ vt.T) ** 2).sum()
        assert got_energy >= 0.98 * exact_energy


def test_embedding_pca_pipeline(ray_session, sf_dir):
    from epichypersketch_jl_ray.pipelines.ann import embedding_principal_components

    out = embedding_principal_components(sf_dir, k=4)
    assert len(out) == 4
    assert (out["singular_value"].to_numpy() > 0).all()
    assert (np.diff(out["singular_value"].to_numpy()) <= 1e-9).all()  # sorted desc
    assert 0 < out["energy_share"].sum() <= 1.0 + 1e-9


def test_ann_ivfpq_recall_and_exact_rerank(ray_session, sf_dir):
    """IVF-PQ: recall vs brute force bounded below, AND every returned sim
    equals the true cosine (the ADC score only shortlists; ranking is an
    exact re-rank of in-batch vectors)."""
    from epichypersketch_jl_ray.pipelines.ann import ann_cosine_topk, ann_ivfpq_topk

    bf = ann_cosine_topk(sf_dir)
    pq_ = ann_ivfpq_topk(sf_dir)
    want = set(zip(bf["query_id"], bf["neighbor_id"]))
    got = set(zip(pq_["query_id"], pq_["neighbor_id"]))
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall
    # exact re-rank: both rank by TRUE cosine, so among shared pairs the
    # relative order must agree exactly for every query
    bf_rank = {(q, n): r for q, n, r in zip(bf["query_id"], bf["neighbor_id"], bf["rank"])}
    for q in set(pq_["query_id"]):
        sub = pq_[pq_["query_id"] == q].sort_values("rank")
        shared = [bf_rank[(q, n)] for n in sub["neighbor_id"] if (q, n) in bf_rank]
        assert shared == sorted(shared), (q, shared)


def test_ann_ivfpq_deterministic(ray_session, sf_dir):
    from epichypersketch_jl_ray.pipelines.ann import ann_ivfpq_topk

    key = ["query_id", "rank"]
    a = ann_ivfpq_topk(sf_dir).sort_values(key).reset_index(drop=True)
    b = ann_ivfpq_topk(sf_dir).sort_values(key).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_ann_lsh_candidates_stay_in_their_querys_probe_set(ray_session, sf_dir):
    """Every candidate the LSH path emits must come from ITS OWN query's
    probe set (hamming <= probe_hamming of that query's bucket) — the
    regression guard for the cross-query leakage fixed in round 5, where
    rows from the UNION of all queries' buckets were scored against every
    query, inflating recall."""
    import pyarrow.dataset as pads

    from epichypersketch_jl_ray.pipelines.ann import _fetch_probes, ann_lsh_topk
    from epichypersketch_jl_ray.sources.tables import read_table
    from epichypersketch_jl_ray.stages.ann import LSHBuckets, _embedding_matrix

    bits, radius = 8, 3
    store = "/tmp/ehs_test_lsh_containment"
    ann_lsh_topk(sf_dir, bits=bits, probe_hamming=radius, store=store)
    cands = pads.dataset(store).to_table().to_pandas()
    assert len(cands) > 0

    q_ids, q = _fetch_probes(sf_dir)
    lsh = LSHBuckets(q.shape[1], bits=bits)
    q_bucket = dict(zip(q_ids.tolist(), lsh.bucket_of(q).tolist()))
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    tbl = emb.to_pandas()
    import pyarrow as pa

    mat = _embedding_matrix(pa.Table.from_pandas(tbl), "embedding")
    n_bucket = dict(zip(tbl["vec_id"].tolist(), lsh.bucket_of(mat).tolist()))
    for qid, nid in zip(cands["query_id"], cands["neighbor_id"]):
        ham = bin(q_bucket[int(qid)] ^ n_bucket[int(nid)]).count("1")
        assert ham <= radius, (qid, nid, ham)
