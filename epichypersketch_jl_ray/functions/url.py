"""URL canonicalization and domain extraction for web-corpus curation.

Scraped corpora key almost everything on URLs — exact/near dedup, per-site
quality rollups, host-level rate caps — and raw crawl URLs are noisy:
mixed-case hosts, default ports, fragments, dot-segments, tracking
parameters. ``canonicalize_url`` normalizes them the way crawl dedup
expects (RFC 3986 normalization plus the conventional tracking-param
strip), so that two fetches of the same page collapse to one key.

Vectorization note: URL parsing is inherently per-string (stdlib
``urllib.parse`` under one compiled splitter); run it inside an actor-pool
``map_batches`` stage like the other per-item decoders. Host extraction
alone (``hosts_of``) stays a single vectorized Arrow regex for the cheap
group-by-host paths.

``registrable_domain`` uses a compact built-in multi-part-suffix table
(the high-traffic entries of the public-suffix list: co.uk, com.au, …) —
documented heuristic, NOT the full PSL, which is a 200 KB moving target;
a deployment that needs exactness ships the real list into the actor.
"""

from __future__ import annotations

import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pyarrow as pa
import pyarrow.compute as pc

_TRACKING_PARAMS = re.compile(
    r"^(utm_\w+|fbclid|gclid|gbraid|wbraid|msclkid|mc_eid|mc_cid|igshid|"
    r"ref_src|ref_url|spm|yclid|_hsenc|_hsmi|vero_id|oly_enc_id|oly_anon_id)$",
    re.IGNORECASE,
)
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?(?P<host>[^/:?#]+)"

# high-traffic multi-part public suffixes (heuristic subset, see module doc)
_TWO_PART_SUFFIXES = frozenset(
    {
        "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
        "com.au", "net.au", "org.au", "edu.au", "gov.au",
        "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
        "com.br", "net.br", "org.br", "gov.br",
        "co.in", "net.in", "org.in", "gen.in", "firm.in",
        "com.cn", "net.cn", "org.cn", "gov.cn",
        "co.kr", "or.kr", "ne.kr", "go.kr",
        "com.mx", "org.mx", "gob.mx",
        "co.za", "org.za", "web.za",
        "com.tr", "org.tr", "gov.tr",
        "com.tw", "org.tw", "idv.tw",
        "com.sg", "org.sg", "edu.sg",
        "co.nz", "net.nz", "org.nz",
        "com.ar", "com.co", "com.my", "com.hk", "com.pk", "com.eg",
        "com.sa", "com.ua", "co.il", "co.th", "co.id", "com.ph",
        "com.vn", "com.ng",
    }
)


def _resolve_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")):
        out.append("")
    return "/".join(out) or "/"


def canonicalize_one(url: str, *, strip_tracking: bool = True, sort_query: bool = True) -> str:
    """One URL -> its canonical dedup key (see module docstring). Returns
    the input unchanged when it does not parse as an absolute URL."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url
    scheme = parts.scheme.lower()
    host = parts.hostname or ""
    host = host.lower().rstrip(".").encode("idna").decode("ascii") if host else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _resolve_dot_segments(parts.path) if parts.path else "/"
    q = parse_qsl(parts.query, keep_blank_values=True)
    if strip_tracking:
        q = [(k, v) for k, v in q if not _TRACKING_PARAMS.match(k)]
    if sort_query:
        q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q, doseq=True), ""))


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray, **kw) -> pa.Array:
    """URL column -> canonical-key column (per-item; run in an actor stage)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pa.array(
        [None if u is None else canonicalize_one(u, **kw) for u in urls.to_pylist()],
        pa.string(),
    )


def hosts_of(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """URL column -> lowercased host column, one vectorized Arrow regex
    (nulls where no host parses) — the cheap path for group-by-host."""
    ex = pc.extract_regex(urls, _HOST_RE)
    return pc.utf8_lower(pc.struct_field(ex, "host"))


def registrable_domain(host: str) -> str:
    """Host -> heuristic registrable domain ('news.bbc.co.uk' -> 'bbc.co.uk',
    'a.b.example.com' -> 'example.com'). IPs and single labels pass through."""
    labels = host.lower().rstrip(".").split(".")
    if len(labels) <= 2 or all(p.isdigit() for p in labels):
        return ".".join(labels)
    if ".".join(labels[-2:]) in _TWO_PART_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def registrable_domains(hosts: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    return pa.array(
        [None if h is None else registrable_domain(h) for h in hosts.to_pylist()],
        pa.string(),
    )
