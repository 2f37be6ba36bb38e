"""Link-extraction conformance (darc/parse.py:305-374 behavior)."""

from __future__ import annotations

from darc_ray.functions.extract import extract_from_html, extract_from_text, visible_text


PAGE = "http://h1.example/dir/page.html"
HTML = """<!DOCTYPE html><html><head>
<link rel="stylesheet" href="/style.css">
<script src='app.js'></script>
<style>body { color: red; } /* http://not-a-link.example/in-style */</style>
</head><body>
<a href="../up.html">up</a>
<a href="http://h2.example/abs">abs</a>
<img src="img/cat.png">
<a name="noref">nothing</a>
<a href="mailto:bob@example.com">mail</a>
<p>Visit https://plain.example/x today or email carol@example.org
or pay 1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa now.</p>
<script>var u = "http://script.example/should-not-extract";</script>
</body></html>"""


def test_tag_pass_order_and_urljoin():
    urls = extract_from_html(PAGE, HTML)
    # tag pass first, document order, urljoined against the page URL
    assert urls[0] == "http://h1.example/style.css"
    assert urls[1] == "http://h1.example/dir/app.js"
    assert urls[2] == "http://h1.example/up.html"
    assert urls[3] == "http://h2.example/abs"
    assert urls[4] == "http://h1.example/dir/img/cat.png"
    assert urls[5] == "mailto:bob@example.com"


def test_text_pass_schemes_and_injection():
    urls = extract_from_html(PAGE, HTML)
    text_urls = urls[6:]
    assert "https://plain.example/x" in text_urls
    # automail match without scheme gets the literal 'mailto:' key prepended
    # (reference quirk: f'{scheme}:{url}' with scheme='mailto:' → 'mailto::…')
    assert "mailto::carol@example.org" in text_urls
    assert "bitcoin:1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa" in text_urls
    # script/style bodies are not visible text
    assert not any("should-not-extract" in u for u in text_urls)
    assert not any("not-a-link" in u for u in text_urls)


def test_href_preferred_over_src():
    urls = extract_from_html("http://h/", '<a href="/a" src="/b">x</a>')
    assert urls[0] == "http://h/a"


def test_text_www_injection():
    urls = extract_from_text("see www.example.com/path ok")
    assert urls == ["http:www.example.com/path"]  # schemeless http key quirk


def test_ethereum_extraction():
    urls = extract_from_text("addr 0x32Be343B94f860124dC4fEe278FDCBD38C102D88 ")
    assert "ethereum:0x32Be343B94f860124dC4fEe278FDCBD38C102D88" in urls


def test_visible_text_strips_tags():
    txt = visible_text("<p>hello <b>world</b></p><script>nope()</script>")
    assert "hello" in txt and "world" in txt and "nope" not in txt


def test_register_url_pattern_and_env(monkeypatch):
    import importlib
    import json

    import darc_ray.functions.extract as ex

    base_len = len(ex.URL_PATTERNS)
    ex.register_url_pattern("onionv3", r"(?i)\b(?P<url>[a-z2-7]{56}\.onion)\b")
    try:
        urls = ex.extract_from_text("see " + "a" * 56 + ".onion now")
        assert any(u.endswith(".onion") for u in urls)
    finally:
        ex.URL_PATTERNS[:] = ex.URL_PATTERNS[:base_len]

    # env-driven registration, the reference's DARC_URL_PAT format
    monkeypatch.setenv("DARC_URL_PAT",
                       json.dumps([["geo", r"\b(?P<url>geo:[0-9.,-]+)\b", 0]]))
    try:
        ex._load_env_patterns()
        assert ex.extract_from_text("at geo:48.2,16.3 here") == ["geo:48.2,16.3"]
    finally:
        ex.URL_PATTERNS[:] = ex.URL_PATTERNS[:base_len]


def test_malformed_html_recovery():
    """The tokenizer pass recovers candidates the regex pass misses:
    entity-encoded attribute values, attributes split across lines,
    unclosed tags (M3 — the reference's html5lib error recovery)."""
    from darc_ray.functions.extract import extract_from_html

    base = "http://h.example/page.html"
    # entity-decoded href (&amp; → &)
    urls = extract_from_html(base, '<a href="/x?a=1&amp;b=2">x</a>')
    assert "http://h.example/x?a=1&b=2" in urls
    # attributes split across lines + unquoted value + unclosed tag
    urls = extract_from_html(base, '<a\n  class=c\n  href=/deep/page>text')
    assert "http://h.example/deep/page" in urls
    # first duplicate attribute wins (html5lib rule)
    urls = extract_from_html(base, '<a href="/first" href="/second">x</a>')
    assert "http://h.example/first" in urls
    assert "http://h.example/second" not in urls
    # valueless href behaves like empty string → the page itself
    urls = extract_from_html(base, "<a href>self</a>")
    assert urls[0] == base


def test_tag_order_href_preferred():
    from darc_ray.functions.extract import extract_from_html

    base = "http://h.example/"
    urls = extract_from_html(
        base, '<img src="/i.png"><a href="/a" src="/ignored">x</a>')
    assert urls[:2] == ["http://h.example/i.png", "http://h.example/a"]


def test_regex_flavor_still_available():
    from darc_ray.functions.extract import extract_from_html_regex

    urls = extract_from_html_regex("http://h.example/",
                                   '<a href="/ok">x</a>')
    assert "http://h.example/ok" in urls
