"""Committed goldens: the deterministic generator + byte-identical extractor
must reproduce the exact (url, md5(text)) pairs committed at
tests/goldens/webpages_extract_goldens.json — guards the input_hint
invariant against accidental generator/extractor drift across code changes
(SURVEY.md §5 goldens requirement)."""

import hashlib
import json
import os


def test_extraction_goldens():
    from epichypersketch_jl_ray.functions.html import extract_text
    from epichypersketch_jl_ray.sources.webpages import _chunk

    goldens = json.load(
        open(os.path.join(os.path.dirname(__file__), "goldens", "webpages_extract_goldens.json"))
    )
    tbl = _chunk(0, len(goldens), 42)
    text = extract_text(tbl["html"])
    for rec, url, t in zip(goldens, tbl["url"].to_pylist(), text.to_pylist()):
        assert rec["url"] == url
        assert rec["text_md5"] == hashlib.md5(t.encode()).hexdigest(), url
