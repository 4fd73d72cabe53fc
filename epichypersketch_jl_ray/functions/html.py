"""Byte-exact html render / extract pair for the webpages table.

The input_hint invariant (BASELINE.json) demands byte-identical extracted
text per url versus the reference extractor. Our fixture generator
(sources/webpages.py) renders ``html`` FROM ``text`` with this fixed
template, and ``extract_text`` inverts it exactly — a pure function of the
bytes (no parser, locale or entity table), so N-vs-4N runs and resumes
produce identical text.

Real-world html decoding (lxml/bs4 etc.) is out of scope for this container
(libs absent) — ``extract_text_generic`` documents the seam where a real
extractor would plug in and raises NotImplementedError for non-fixture html.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PREFIX = "<html><head><title>"
_MID = "</title></head><body><p>"
_SUFFIX = "</p></body></html>"


def render_html(titles: pa.Array, texts: pa.Array) -> pa.Array:
    """text -> html via the fixed byte-exact template (binary column)."""
    joined = pc.binary_join_element_wise(
        pa.array([_PREFIX] * len(titles)),
        titles,
        pa.array([_MID] * len(titles)),
        texts,
        pa.array([_SUFFIX] * len(titles)),
        "",
    )
    return joined.cast(pa.binary())


def extract_text(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Byte-exact inverse of render_html: strip the fixed wrapper.

    Raises ValueError on html that does not match the template (surfacing
    corruption instead of silently emitting wrong text).
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    if len(html) == 0:
        # pc.all over an empty array is null, which would read as a template
        # mismatch; zero rows extract to zero texts
        return pa.array([], pa.string())
    s = html.cast(pa.string())
    ok_prefix = pc.starts_with(s, _PREFIX)
    ok_suffix = pc.ends_with(s, _SUFFIX)
    if not (pc.all(ok_prefix).as_py() and pc.all(ok_suffix).as_py()):
        raise ValueError("html does not match the fixture template")
    # split on the (unique) body marker, then drop the fixed-length suffix —
    # both are vectorized Arrow C++ kernels (no per-byte index arrays).
    # The marker cannot occur inside fixture text (tokens never contain '<').
    parts = pc.split_pattern(s, pattern=_MID, max_splits=1)
    if not pc.all(pc.equal(pc.list_value_length(parts), 2)).as_py():
        raise ValueError("html missing body marker")
    tail = pc.list_element(parts, 1)
    return pc.utf8_slice_codeunits(tail, start=0, stop=-len(_SUFFIX))


def extract_text_generic(html: pa.Array) -> pa.Array:
    """Seam for a real html→text extractor (trafilatura/lxml class loaded once
    per actor). Not available in this container."""
    raise NotImplementedError(
        "generic html extraction requires an html parser not present in this "
        "environment; fixture html uses extract_text()"
    )
