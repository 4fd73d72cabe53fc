"""Distributed-trained quality classifier (pipelines/classifier.py):
learnability on a planted separable corpus, full determinism (fixed-point
gradient accumulation), and loss monotonicity on the real fixture."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def planted_dir():
    """doc_id % 10 == 0 docs draw from 'good*' vocab, % 10 == 5 from
    'spam*', the rest mixed — linearly separable by construction."""
    rng = np.random.default_rng(7)
    good = [f"good{i}" for i in range(50)]
    spam = [f"spam{i}" for i in range(50)]
    mid = [f"mid{i}" for i in range(50)]
    ids, texts = [], []
    for d in range(400):
        r = d % 10
        vocab = (good if r == 0 else spam if r == 5 else (good if d % 2 else spam)) + mid
        texts.append(" ".join(rng.choice(vocab, size=30)))
        ids.append(d)
    tmp = tempfile.mkdtemp()
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}),
        os.path.join(tmp, "documents.parquet"),
    )
    return tmp


def test_classifier_learns_planted_separation(ray_session, planted_dir):
    from epichypersketch_jl_ray.pipelines.classifier import quality_scores

    s = quality_scores(planted_dir).to_pandas()
    pos = s[s.doc_id % 10 == 0]["quality_prob"]
    neg = s[s.doc_id % 10 == 5]["quality_prob"]
    assert (pos > 0.5).all() and (neg < 0.5).all()
    assert pos.mean() - neg.mean() > 0.3


def test_classifier_deterministic(ray_session, planted_dir):
    from epichypersketch_jl_ray.pipelines.classifier import train_quality_classifier

    w1, l1 = train_quality_classifier(planted_dir, iters=5)
    w2, l2 = train_quality_classifier(planted_dir, iters=5)
    assert np.array_equal(w1, w2) and l1 == l2  # byte-identical training


def test_classifier_driver_and_distributed_paths_identical(ray_session, planted_dir):
    """Per-(row, feature) fixed-point quantization makes the driver-local
    and distributed-iteration paths byte-identical, not merely close."""
    from epichypersketch_jl_ray.pipelines.classifier import train_quality_classifier

    w_drv, l_drv = train_quality_classifier(planted_dir, iters=4)  # under cap
    w_dst, l_dst = train_quality_classifier(planted_dir, iters=4, driver_cap=0)
    assert np.array_equal(w_drv, w_dst) and l_drv == l_dst


def test_classifier_loss_decreases_on_fixture(ray_session, sf_dir):
    from epichypersketch_jl_ray.pipelines.classifier import train_quality_classifier

    _, losses = train_quality_classifier(sf_dir, iters=6)
    assert losses[0] == pytest.approx(np.log(2), abs=1e-3)  # w=0 start
    assert all(b <= a for a, b in zip(losses, losses[1:]))  # full-batch GD


def test_gradient_state_merge_order_invariant():
    from epichypersketch_jl_ray.pipelines.classifier import GradientState

    rng = np.random.default_rng(3)
    parts = []
    for _ in range(6):
        st = GradientState(64)
        st.g += rng.integers(-1000, 1000, 64)
        st.loss += int(rng.integers(0, 10_000))
        st.n += int(rng.integers(1, 50))
        parts.append(st)

    def tot(order):
        acc = GradientState(64)
        for i in order:
            acc.merge(parts[i])
        return acc.digest()

    base = tot(range(6))
    for _ in range(5):
        assert tot(rng.permutation(6)) == base
