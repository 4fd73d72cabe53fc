"""Vectorized JSON field extraction over Arrow string columns.

Semi-structured event payloads (the events table's ``props`` column) are a
standard web-telemetry shape. Extraction stays inside Arrow C++ kernels
(pyarrow.compute.extract_regex) — no per-row Python json.loads in the hot
path. Scope is deliberately FLAT scalar fields (string/int keys at the top
level): that covers the telemetry-aggregation pattern and keeps the kernel
a single regex; nested JSON would need a real parser and is out of scope
(documented, not silently wrong — a row whose field is absent or non-flat
yields null, same as SQL json_extract).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def json_int_field(arr: pa.Array | pa.ChunkedArray, field: str) -> pa.Array:
    """int64 value of a top-level integer JSON field; null where the field
    is absent/non-integer. Matches DuckDB
    CAST(json_extract(props, '$.field') AS BIGINT) on flat objects."""
    # extract_regex requires a NAMED group; yields struct<v: string> with
    # null on non-match. The [,}\s] terminator keeps a float like 1.5 from
    # half-matching as integer 1 (RE2 has no lookahead).
    pattern = rf'"{re.escape(field)}"\s*:\s*(?P<v>-?\d+)\s*[,}}]'
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    hit = pc.extract_regex(arr, pattern=pattern)
    return pc.cast(pc.struct_field(hit, "v"), pa.int64())


def json_string_field(arr: pa.Array | pa.ChunkedArray, field: str) -> pa.Array:
    """string value of a top-level quoted JSON field; null where absent.
    Escaped quotes inside the value are out of the flat-field scope."""
    pattern = rf'"{re.escape(field)}"\s*:\s*"(?P<v>[^"]*)"'
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    hit = pc.extract_regex(arr, pattern=pattern)
    return pc.struct_field(hit, "v")


def json_int_field_numpy(arr: pa.Array | pa.ChunkedArray, field: str) -> tuple[np.ndarray, np.ndarray]:
    """(values, valid-mask) numpy view of json_int_field — absent fields are
    0 in ``values`` with valid False."""
    col = json_int_field(arr, field)
    valid = ~np.asarray(col.is_null())
    vals = col.fill_null(0).to_numpy(zero_copy_only=False)
    return vals, valid
