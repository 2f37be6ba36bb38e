"""Link extraction from HTML and raw text.

Reimplements the reference's two extraction passes
(``/root/reference/darc/parse.py:305-374``):

1. **Tag pass** — every tag carrying an ``href`` or ``src`` attribute
   (``href`` preferred when both present, first duplicate attribute
   wins), joined against the page URL.  The reference walks a html5lib
   DOM; we run stdlib ``html.parser`` — a real, error-recovering HTML
   tokenizer (entity-decoded attribute values and character data,
   tolerant of unclosed/malformed markup) in one streaming sweep that
   yields both the tag pass and the visible text (script/style bodies
   excluded, matching modern bs4's ``soup.text``).  A compiled-regex
   fallback (``extract_from_html_regex``) handles pathological inputs
   that make the tokenizer raise, and remains available as the cheaper
   well-formed-markup fast path.
2. **Text pass** — whitespace-split visible text matched against the
   URL pattern suite (``darc/parse.py:40-59``: gfm autolink http URL,
   gfm automail, bitcoin base58, ethereum hex), with the pattern key
   prepended as scheme when the match has none (including the
   reference's literal ``f'{scheme}:{url}'`` behaviour for the
   ``mailto:`` key, which yields ``mailto::addr``).

The pattern suite is extensible (``extra_patterns``), mirroring
``DARC_URL_PAT``.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from darc_ray.functions.link import split_url, urljoin

# Tag-attribute pass: any tag with href= or src= (parse.py:322-327).
_TAG_RE = re.compile(r"<[a-zA-Z][^>]*>")
_HREF_RE = re.compile(
    r"""\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.IGNORECASE)
_SRC_RE = re.compile(
    r"""\bsrc\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""", re.IGNORECASE)

# Visible-text reconstruction: drop script/style bodies, strip tags.
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_STRIP_TAG_RE = re.compile(r"<[^>]*>")

# The URL pattern suite (parse.py:40-55; patterns originate from the
# public py-gfm autolink/automail extensions, reproduced as a spec).
URL_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    ("http", re.compile(
        r"(?i)\b(?P<url>(?:(?:ftp|https?|wss?|irc)://|www\d{0,3}[.])(?:[^\s()<>]+|"
        r"\(([^\s()<>]+|(\([^\s()<>]+\)))*\))+(?:\(([^\s()<>]+|(\([^\s()"
        r"<>]+\)))*\)|[^\s`!()\[\]{};:'\".,<>?«»“”‘’]))", re.ASCII)),
    ("mailto:", re.compile(
        r"(?i)\b(?P<url>(?:mailto:)?[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]+)\b", re.ASCII)),
    ("bitcoin", re.compile(
        r"(?i)\b(?P<url>(?:(?:bitcoin|btc):)?[13][a-z0-9]{27,34})\b", re.ASCII)),
    ("ethereum", re.compile(
        r"(?i)\b(?P<url>(?:(?:ethereum|eth):)?(?:0x)?[0-9a-f]{40})\b", re.ASCII)),
]


def register_url_pattern(scheme: str, pattern: str, flags: int = 0) -> None:
    """User-extension hook mirroring ``DARC_URL_PAT``
    (darc/parse.py:58-59): adds a regex extractor (must expose a
    ``url`` named group) to the default suite."""
    URL_PATTERNS.append((scheme, re.compile(pattern, re.RegexFlag(flags) | re.ASCII)))


def _load_env_patterns() -> None:
    """``DARC_URL_PAT`` env: JSON list of [scheme, pattern, flags]
    triples, exactly the reference's format (darc/parse.py:58-59)."""
    import json
    import os

    raw = os.getenv("DARC_URL_PAT")
    if not raw:
        return
    for scheme, pattern, flags in json.loads(raw):
        register_url_pattern(scheme, pattern, int(flags))


_load_env_patterns()


from html.parser import HTMLParser


class _LinkTextParser(HTMLParser):
    """One tokenizer sweep: start tags with href/src (href preferred,
    ref parse.py:322-327 ``child.get('href', child.get('src'))``) in
    document order, plus character data outside script/style."""

    _SKIP = ("script", "style")

    def __init__(self, base_url: str) -> None:
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.urls: list[str] = []
        self.texts: list[str] = []
        self._skip = 0

    def _emit(self, attrs) -> None:
        href = src = None
        for k, v in attrs:                     # first duplicate attr wins
            if k == "href" and href is None:
                href = v if v is not None else ""
            elif k == "src" and src is None:
                src = v if v is not None else ""
        value = href if href is not None else src
        if value is not None:
            self.urls.append(urljoin(self.base, value))

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip += 1
        self._emit(attrs)

    def handle_startendtag(self, tag, attrs):
        self._emit(attrs)

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip:
            self._skip -= 1

    def handle_data(self, data):
        if not self._skip:
            self.texts.append(data)


def extract_from_html(page_url: str, html: str,
                      extra_patterns: Iterable[tuple[str, re.Pattern[str]]] = ()) -> list[str]:
    """All candidate URLs of one HTML document, document order:
    tag pass first, then text pass (parse.py:305-337)."""
    try:
        p = _LinkTextParser(page_url)
        p.feed(html)
        p.close()
    except Exception:                          # tokenizer-breaking input
        return extract_from_html_regex(page_url, html, extra_patterns)
    out = p.urls
    out.extend(extract_from_text(" ".join(p.texts), extra_patterns))
    return out


def extract_from_html_regex(page_url: str, html: str,
                            extra_patterns: Iterable[tuple[str, re.Pattern[str]]] = ()) -> list[str]:
    """Compiled-regex flavor: exact on well-formed markup, ~2.5× faster
    per page; no entity decoding or malformed-markup recovery."""
    out: list[str] = []
    for tag in _TAG_RE.finditer(html):
        t = tag.group(0)
        m = _HREF_RE.search(t) or _SRC_RE.search(t)
        if m is None:
            continue
        value = next(g for g in m.groups() if g is not None)
        out.append(urljoin(page_url, value))
    out.extend(extract_from_text(visible_text(html), extra_patterns))
    return out


def visible_text(html: str) -> str:
    """Approximate ``soup.text``: remove script/style bodies, strip tags."""
    return _STRIP_TAG_RE.sub(" ", _SCRIPT_STYLE_RE.sub(" ", html))


def extract_from_text(text: str,
                      extra_patterns: Iterable[tuple[str, re.Pattern[str]]] = ()) -> list[str]:
    """Whitespace-split regex pass (parse.py:340-374), including the
    scheme-injection quirk for schemeless matches."""
    patterns = URL_PATTERNS + list(extra_patterns)
    out: list[str] = []
    for part in text.split():
        for scheme, pattern in patterns:
            for match in pattern.finditer(part):
                url = match.group("url")
                if not split_url(url)[0]:
                    url = f"{scheme}:{url}"
                out.append(url)
    return out
