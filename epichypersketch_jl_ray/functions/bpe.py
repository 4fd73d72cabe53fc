"""Trainable byte-pair-encoding tokenizer (Sennrich et al., ACL 2016).

The scale shape mirrors how real 100 TB pipelines use BPE: the merge table
is TRAINED on a bounded sample (driver-side, like the IVF centroids in
pipelines/ann.py — the classic algorithm is inherently iterative), then
BROADCAST once (``ray.put``) and APPLIED distributed via ``map_batches``
— tokenization is embarrassingly parallel and dominates the cost at
corpus scale, training is O(sample).

Determinism: merge selection breaks frequency ties lexicographically, so
the same sample always yields the same merge list; the applied encoding
is the standard lowest-rank-first loop (as in the public GPT-2 encoder),
LRU-cached per distinct word inside each actor.

This complements the BPE-ish fixed-regex token COUNTER in
functions/text.py (oracle-checkable because it is pure regex); this
module produces actual subword vocabularies.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?|[^\sA-Za-z0-9]")
_EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def train_bpe(
    texts,
    num_merges: int = 200,
    *,
    lowercase: bool = True,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Texts (any iterable of str) -> ordered merge list. Deterministic:
    ties on pair frequency break lexicographically."""
    words: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        if lowercase:
            t = t.lower()
        words.update(_WORD_RE.findall(t))
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(w): c for w, c in words.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best_freq = max(pairs.values())
        if best_freq < min_freq:
            break
        best = min(p for p, c in pairs.items() if c == best_freq)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


class BpeTokenizer:
    """Applies a trained merge list. Build once per actor (``__init__`` of a
    map_batches class, or broadcast the instance via ``ray.put``)."""

    _CACHE_MAX = 65536  # plain dict, not lru_cache: the instance must pickle
    # cleanly for ray.put broadcast (bound-method caches don't)

    def __init__(self, merges: list[tuple[str, str]], *, lowercase: bool = True) -> None:
        self.merges = [tuple(m) for m in merges]
        self.ranks = {tuple(m): i for i, m in enumerate(self.merges)}
        self.lowercase = lowercase
        self._cache: dict[str, tuple[str, ...]] = {}

    def _encode_word(self, word: str) -> tuple[str, ...]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        out = self._encode_word_uncached(word)
        if len(self._cache) < self._CACHE_MAX:
            self._cache[word] = out
        return out

    def _encode_word_uncached(self, word: str) -> tuple[str, ...]:
        syms = list(_word_symbols(word))
        ranks = self.ranks
        while len(syms) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return tuple(syms)

    def encode(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
        out: list[str] = []
        for w in _WORD_RE.findall(text):
            out.extend(self._encode_word(w))
        return out

    def decode(self, tokens: list[str]) -> str:
        return "".join(tokens).replace(_EOW, " ").rstrip()

    # --- Arrow batch kernels (the distributed apply path) -----------------

    def token_counts(self, texts: pa.Array | pa.ChunkedArray) -> pa.Array:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        return pa.array(
            [None if t is None else len(self.encode(t)) for t in texts.to_pylist()],
            pa.int64(),
        )

    def tokenize(self, texts: pa.Array | pa.ChunkedArray) -> pa.ListArray:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = [self.encode(t) if t is not None else [] for t in texts.to_pylist()]
        lengths = np.fromiter((len(t) for t in toks), np.int32, len(toks))
        return pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(lengths))), pa.int32()),
            pa.array([s for t in toks for s in t], pa.string()),
        )


def train_bpe_on_dataset(
    ds,
    column: str,
    *,
    num_merges: int = 200,
    sample_rows: int = 50_000,
    lowercase: bool = True,
    min_freq: int = 2,
) -> BpeTokenizer:
    """Dataset -> tokenizer trained on a BOUNDED driver-side sample (the
    same documented pattern as the IVF centroid trainer: the iterative
    algorithm sees O(sample_rows), never the corpus; the returned
    tokenizer is then broadcast and applied distributed)."""
    rows = ds.select_columns([column]).limit(sample_rows).take_all()
    merges = train_bpe(
        (r[column] for r in rows),
        num_merges,
        lowercase=lowercase,
        min_freq=min_freq,
    )
    return BpeTokenizer(merges, lowercase=lowercase)
