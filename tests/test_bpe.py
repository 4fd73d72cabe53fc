"""Trainable BPE: classic-merge correctness on a hand-checkable corpus,
determinism, encode/decode round trip, the LRU'd apply loop, and the
distributed apply path (broadcast tokenizer == local encode)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from epichypersketch_jl_ray.functions.bpe import (
    BpeTokenizer,
    train_bpe,
    train_bpe_on_dataset,
)


def test_classic_merges_hand_checked():
    # 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3 — the ACL-2016 example:
    # the first merges must build 'est</w>' from (e,s), (es,t</w>)
    corpus = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    merges = train_bpe(corpus, num_merges=10, min_freq=2)
    assert merges[0] == ("e", "s")          # freq 9 (newest+widest)
    assert merges[1] == ("es", "t</w>")     # freq 9
    tok = BpeTokenizer(merges)
    # frequent training words end up fully merged into one token
    assert tok.encode("newest") == ["newest</w>"]
    assert tok.encode("low") == ["low</w>"]
    # the learned 'est</w>' suffix generalizes to an unseen word
    assert tok.encode("tallest")[-1] in ("est</w>", "t</w>", "allest</w>")
    assert len(tok.encode("tallest")) > 1


def test_determinism_and_tie_break():
    corpus = ["ab cd ab cd"]  # (a,b</w>) and (c,d</w>) tie at 2
    m1 = train_bpe(corpus, num_merges=2, min_freq=2)
    m2 = train_bpe(corpus, num_merges=2, min_freq=2)
    assert m1 == m2 == [("a", "b</w>"), ("c", "d</w>")]  # lexicographic tie-break


def test_encode_decode_round_trip():
    corpus = ["the quick brown fox jumps over the lazy dog. " * 20]
    tok = BpeTokenizer(train_bpe(corpus, num_merges=60, min_freq=2))
    text = "the quick brown fox jumps over the lazy dog."
    # word-level BPE: decode restores words; punctuation is its own word
    assert tok.decode(tok.encode(text)) == "the quick brown fox jumps over the lazy dog ."
    # unseen words still encode (down to characters if need be)
    assert tok.decode(tok.encode("zyzzyva")) == "zyzzyva"


def test_min_freq_stops_training():
    merges = train_bpe(["a b c d e"], num_merges=50, min_freq=2)
    assert merges == []  # every pair is a singleton


def test_arrow_kernels():
    tok = BpeTokenizer(train_bpe(["hello hello world"], num_merges=20, min_freq=2))
    arr = pa.array(["hello world", None, ""])
    counts = tok.token_counts(arr)
    assert counts[1].as_py() is None and counts[2].as_py() == 0
    lists = tok.tokenize(arr)
    assert lists[0].as_py() == tok.encode("hello world")
    assert lists[1].as_py() == []


def test_distributed_apply_equals_local(ray_session):
    import ray

    docs = [f"document number {i} talks about sketching and streams" for i in range(200)]
    ds = ray.data.from_items([{"text": t} for t in docs])
    tok = train_bpe_on_dataset(ds, "text", num_merges=80, sample_rows=100)
    ref = ray.put(tok)  # broadcast once, read per task

    def apply(batch: pa.Table) -> pa.Table:
        t = ray.get(ref)
        return pa.table({"n_tokens": t.token_counts(batch["text"])})

    got = ds.map_batches(apply, batch_format="pyarrow").take_all()
    want = [len(tok.encode(t)) for t in docs]
    assert sorted(r["n_tokens"] for r in got) == sorted(want)
    assert min(want) > 0
