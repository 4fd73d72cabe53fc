"""URL canonicalization / host extraction / registrable-domain heuristic."""

from __future__ import annotations

import pyarrow as pa

from epichypersketch_jl_ray.functions.url import (
    canonicalize_one,
    canonicalize_urls,
    hosts_of,
    registrable_domain,
    registrable_domains,
)


def test_canonicalize_normalizations():
    cases = {
        # case + default port + fragment
        "HTTP://Example.COM:80/a#frag": "http://example.com/a",
        "https://example.com:443/": "https://example.com/",
        "https://example.com:8443/x": "https://example.com:8443/x",
        # dot segments
        "http://e.com/a/b/../c/./d": "http://e.com/a/c/d",
        "http://e.com/a/..": "http://e.com/",
        # empty path
        "http://e.com": "http://e.com/",
        # trailing-dot host
        "http://e.com./x": "http://e.com/x",
        # query sort + tracking strip
        "http://e.com/?b=2&a=1&utm_source=x&fbclid=y": "http://e.com/?a=1&b=2",
        "http://e.com/?gclid=1": "http://e.com/",
        # keeps meaningful params and blank values
        "http://e.com/?q=&page=2": "http://e.com/?page=2&q=",
        # credentials survive
        "http://user:pw@E.com/p": "http://user:pw@e.com/p",
    }
    for raw, want in cases.items():
        assert canonicalize_one(raw) == want, raw
    # both fetches of "the same page" collapse to one key (trailing slash
    # is kept — /a/b/ and /a/b are distinct resources)
    a = canonicalize_one("HTTP://E.com:80/a/./b/?z=1&a=2&utm_medium=email")
    b = canonicalize_one("http://e.com/a/b/?a=2&z=1")
    assert a == b


def test_canonicalize_options_and_garbage():
    assert canonicalize_one("http://e.com/?b=2&a=1", sort_query=False).endswith("b=2&a=1")
    assert "utm_x=1" in canonicalize_one("http://e.com/?utm_x=1", strip_tracking=False)
    # non-URLs pass through untouched (never raise)
    for junk in ["not a url", "", "relative/path", "http://"]:
        assert canonicalize_one(junk) == junk
    col = canonicalize_urls(pa.array(["HTTP://A.com:80/", None, "junk"]))
    assert col.to_pylist() == ["http://a.com/", None, "junk"]


def test_idna_hosts():
    assert canonicalize_one("http://bücher.example/x") == "http://xn--bcher-kva.example/x"


def test_hosts_of_vectorized():
    urls = pa.array(
        [
            "https://News.BBC.co.uk/politics",
            "http://user@sub.example.com:8080/p?q=1",
            "not a url",
            None,
        ]
    )
    assert hosts_of(urls).to_pylist() == [
        "news.bbc.co.uk",
        "sub.example.com",
        None,
        None,
    ]


def test_registrable_domain_heuristic():
    cases = {
        "news.bbc.co.uk": "bbc.co.uk",
        "a.b.example.com": "example.com",
        "example.com": "example.com",
        "localhost": "localhost",
        "www.shop.com.au": "shop.com.au",
        "static.site.co.jp": "site.co.jp",
        "10.1.2.3": "10.1.2.3",
        "deep.sub.x.org": "x.org",
    }
    for host, want in cases.items():
        assert registrable_domain(host) == want, host
    col = registrable_domains(pa.array(["a.b.co.uk", None]))
    assert col.to_pylist() == ["b.co.uk", None]
