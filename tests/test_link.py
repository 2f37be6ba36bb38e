"""parse_link classifier conformance — one case per rule of
/root/reference/darc/link.py:316-404 (studied behavior; fresh code)."""

from __future__ import annotations

from urllib.parse import urlsplit

from hypothesis import given, settings, strategies as st

from darc_ray.functions.link import parse_batch, parse_one, split_url
from darc_ray.functions.hashing import sha256_hex, partition_of

CASES = [
    # url, proxy, scheme, host, base_host
    ("http://www.example.com/", "null", "http", "www.example.com", "www.example.com"),
    ("https://example.com/a/b?q=1#f", "null", "https", "example.com", "example.com"),
    ("http://example.com:8080/x", "null", "http", "example.com:8080", "example.com:8080"),
    # rule 11: .onion → tor
    ("http://duckduckgogg42xjoc72x3sjasowoarfbgcmvfimaftt6twagswzczad.onion/", "tor", "http",
     "duckduckgogg42xjoc72x3sjasowoarfbgcmvfimaftt6twagswzczad.onion",
     "duckduckgogg42xjoc72x3sjasowoarfbgcmvfimaftt6twagswzczad.onion"),
    # rule 15: .onion.sh → tor2web
    ("https://x.onion.sh/p", "tor2web", "https", "x.onion.sh", "x.onion.sh"),
    # rule 12: .i2p and i2p local ports
    ("http://stats.i2p/", "i2p", "http", "stats.i2p", "stats.i2p"),
    ("http://127.0.0.1:7657/console", "i2p", "http", "127.0.0.1:7657", "127.0.0.1:7657"),
    ("http://localhost:7658/x", "i2p", "http", "localhost:7658", "localhost:7658"),
    # rule 13: zeronet — non-root path → first segment is base_host; root → null
    ("http://127.0.0.1:43110/1HeLLo4uzjaLetFx6NH3PMwFP3qbRbTf3D/page", "zeronet", "http",
     "127.0.0.1:43110", "1HeLLo4uzjaLetFx6NH3PMwFP3qbRbTf3D"),
    ("http://localhost:43110/", "null", "http", "localhost:43110", "localhost:43110"),
    # rule 14: freenet
    ("http://127.0.0.1:8888/USK@abc,def,AQACAAE/sone/77/", "freenet", "http",
     "127.0.0.1:8888", "USK@abc,def,AQACAAE"),
    ("http://127.0.0.1:8888", "null", "http", "127.0.0.1:8888", "127.0.0.1:8888"),
    # rules 1-8: scheme-classified
    ("data:text/plain;base64,aGk=", "data", "data", "(data)", "(null)"),
    ("javascript:void(0)", "script", "javascript", "(script)", "(null)"),
    ("bitcoin:1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa", "bitcoin", "bitcoin", "(bitcoin)", "(null)"),
    ("btc:1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa", "bitcoin", "btc", "(bitcoin)", "(null)"),
    ("ethereum:0x32Be343B94f860124dC4fEe278FDCBD38C102D88", "ethereum", "ethereum", "(ethereum)", "(null)"),
    # netloc-bearing special schemes keep the netloc as base_host
    # (reference computes hostname BEFORE the scheme rules, link.py:325)
    ("ed2k://|file|x|123|ABCDEF|/", "ed2k", "ed2k", "(ed2k)", "|file|x|123|ABCDEF|"),
    ("magnet:?xt=urn:btih:deadbeef", "magnet", "magnet", "(magnet)", "(null)"),
    ("mailto:alice@example.com", "mail", "mailto", "(mail)", "(null)"),
    ("tel:+1-202-555-0143", "tel", "tel", "(tel)", "(null)"),
    ("irc://irc.example.org/darc", "irc", "irc", "(irc)", "irc.example.org"),
    ("ws://example.com/sock", "ws", "ws", "(ws)", "example.com"),
    ("wss://example.com/sock", "wss", "wss", "(ws)", "example.com"),
    # rule 9: any other scheme is its own proxy type, host = netloc
    ("ftp://ftp.example.com/pub", "ftp", "ftp", "ftp.example.com", "ftp.example.com"),
    # rule 10: http with no netloc → null host
    ("http:www.example.com", "null", "http", None, "(null)"),
]


def test_classifier_rules():
    for url, proxy, scheme, host, base_host in CASES:
        p = parse_one(url)
        assert (p.proxy, p.scheme, p.host, p.base_host) == (proxy, scheme, host, base_host), url


def test_parse_batch_matches_parse_one():
    urls = [c[0] for c in CASES]
    cols = parse_batch(urls)
    for i, url in enumerate(urls):
        p = parse_one(url)
        assert cols["proxy"][i] == p.proxy
        assert cols["host"][i] == p.host
        assert cols["base_host"][i] == p.base_host


def test_ed2k_magnet_host_sentinels_not_netloc():
    # ed2k:// has a netloc-looking part; scheme rule must win
    p = parse_one("ed2k://|file|x|123|ABCDEF|/")
    assert p.host == "(ed2k)"


def test_sha256_matches_hashlib():
    import hashlib

    urls = ["http://a/", "mailto:x@y.z"]
    assert sha256_hex(urls) == [hashlib.sha256(u.encode()).hexdigest() for u in urls]


def test_partition_stable_and_bounded():
    hashes = sha256_hex([f"http://h{i}.example/" for i in range(500)])
    parts = partition_of(hashes, 16)
    assert parts.min() >= 0 and parts.max() < 16
    # uniform-ish: every partition hit for 500 urls
    assert len(set(parts.tolist())) == 16


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=60))
def test_split_url_agrees_with_stdlib_on_scheme_netloc(raw):
    """Fast path must agree with urllib on (scheme, netloc) whenever
    urllib can parse at all."""
    try:
        parts = urlsplit(raw)
    except ValueError:
        return
    scheme, netloc, path = split_url(raw)
    assert scheme == parts.scheme.lower()
    assert netloc == parts.netloc
    assert path == parts.path


@settings(max_examples=100, deadline=None)
@given(
    st.sampled_from(["http", "https", "ftp", "ws"]),
    st.from_regex(r"[a-z0-9.-]{1,20}(:[0-9]{1,5})?", fullmatch=True),
    st.from_regex(r"(/[a-zA-Z0-9._~-]{0,10}){0,3}", fullmatch=True),
)
def test_split_url_wellformed(scheme, netloc, path):
    url = f"{scheme}://{netloc}{path}"
    parts = urlsplit(url)
    assert split_url(url) == (parts.scheme.lower(), parts.netloc, parts.path)


@settings(max_examples=300, deadline=None)
@given(
    st.from_regex(r"https?://[a-z0-9.-]{1,15}(:[0-9]{1,4})?(/[a-zA-Z0-9._-]{0,8}){0,3}",
                  fullmatch=True),
    st.one_of(
        st.from_regex(r"/[a-zA-Z0-9._/-]{0,20}", fullmatch=True),
        st.from_regex(r"https?://[a-z0-9.-]{1,10}/[a-zA-Z0-9._-]{0,8}", fullmatch=True),
        st.from_regex(r"[a-zA-Z0-9._-]{1,10}(\.html)?", fullmatch=True),
        st.sampled_from(["../up", "./x", "/./x", "/../y", "//other.example/z",
                         "mailto:a@b.c", "?q=1", "#frag", ""]),
    ),
)
def test_fast_urljoin_equals_stdlib(base, url):
    from urllib.parse import urljoin as std_urljoin

    from darc_ray.functions.link import urljoin as fast_urljoin

    assert fast_urljoin(base, url) == std_urljoin(base, url)
