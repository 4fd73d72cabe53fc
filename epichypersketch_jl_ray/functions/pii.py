"""PII redaction kernels (training-data-pipeline curation stage).

Scraped web text routinely carries emails, IP addresses and phone numbers
that a training corpus should mask before anything downstream sees it, so
redaction is a first-class curation operator here (the reference engine is
motif/sketch only — no analogue; this is part of the beyond-reference
web-pipeline surface, like dedup and quality scoring).

Everything is a single vectorized Arrow RE2 kernel per pattern
(``pyarrow.compute.replace_substring_regex`` / ``count_substring_regex``) —
no per-row Python. DuckDB's regexp functions are RE2 too, so the SAME
pattern strings drive the SQL oracle verbatim (probed: counts and replaced
spans agree byte-for-byte across both engines).

Redaction order is fixed — emails, then IPs, then phones — so later passes
only ever see earlier passes' ``<TOKEN>`` text, never half-consumed spans.
(``user@10.1.2.3`` is not an email match — the email pattern requires an
alphabetic TLD — but its address part is still masked by the IP pass.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Shared verbatim with the DuckDB oracle SQL — keep RE2-compatible (no
# lookarounds, no backreferences) and engine-agnostic.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# Conservative international-format phones (+CC then 2-3 separator-joined
# groups): a looser pattern would mass-redact ordinary numbers in web text.
PHONE_PATTERN = r"\+\d{1,3}([ -]\d{2,4}){2,3}\b"

REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_PATTERN, "<EMAIL>"),
    ("ips", IPV4_PATTERN, "<IP>"),
    ("phones", PHONE_PATTERN, "<PHONE>"),
)


def pii_counts(texts: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Per-row match counts on the ORIGINAL text, one int64 array per kind
    (keys: n_emails / n_ips / n_phones). Counts are independent per pattern
    (computed pre-redaction), so an email whose domain is an IP counts once
    under each — the SQL oracle defines it the same way."""
    out: dict[str, np.ndarray] = {}
    for name, pattern, _ in REDACTIONS:
        counts = pc.count_substring_regex(texts, pattern)
        out[f"n_{name}"] = counts.to_numpy(zero_copy_only=False).astype(np.int64)
    return out


def redact_pii(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Mask emails / IPv4s / phones with <EMAIL> / <IP> / <PHONE> tokens,
    in that order (see module docstring)."""
    out = texts
    for _, pattern, token in REDACTIONS:
        out = pc.replace_substring_regex(out, pattern, token)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
