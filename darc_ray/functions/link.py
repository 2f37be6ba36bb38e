"""URL canonicalization + proxy-type classification.

Reimplements, batch-at-a-time, the 16-rule classifier of the
reference's ``parse_link`` (``/root/reference/darc/link.py:228-404``)
and its exception-suppressing URL helpers (``darc/link.py:40-152``).
Semantics are matched rule for rule; the implementation is a fresh
write over plain stdlib parsing with a fast path for common http(s)
URLs (the hot case at 10^10-URL scale).

Output per URL: ``(proxy, scheme, host, base_host)`` where

* ``host``      — the reference ``Link.host``: netloc for web URLs, a
  ``(data)``/``(mail)``-style sentinel for scheme-classified ones, or
  None when the URL has no netloc (rule 0/10).
* ``base_host`` — the hostname component of the reference ``Link.base``
  save-path (``<proxy>/<scheme>/<hostname>``): differs from ``host``
  for zeronet/freenet (first path segment, rules 13-14) and when the
  URL has no netloc (``(null)``).
"""

from __future__ import annotations

from typing import NamedTuple
from urllib.parse import urljoin as _urljoin, urlsplit as _urlsplit

ZERONET_PORT = 43110  # reference: darc/proxy/zeronet.py:40
FREENET_PORT = 8888   # reference: darc/proxy/freenet.py:46

_I2P_LOCAL = frozenset((
    "127.0.0.1:7657", "127.0.0.1:7658", "localhost:7657", "localhost:7658",
))
_ZERONET_LOCAL = frozenset((f"127.0.0.1:{ZERONET_PORT}", f"localhost:{ZERONET_PORT}"))
_FREENET_LOCAL = frozenset((f"127.0.0.1:{FREENET_PORT}", f"localhost:{FREENET_PORT}"))

# scheme → (proxy, host-sentinel); reference darc/link.py:327-357
_SCHEME_PROXY: dict[str, tuple[str, str]] = {
    "data": ("data", "(data)"),
    "javascript": ("script", "(script)"),
    "bitcoin": ("bitcoin", "(bitcoin)"),
    "btc": ("bitcoin", "(bitcoin)"),
    "ethereum": ("ethereum", "(ethereum)"),
    "eth": ("ethereum", "(ethereum)"),
    "ed2k": ("ed2k", "(ed2k)"),
    "magnet": ("magnet", "(magnet)"),
    "mailto": ("mail", "(mail)"),
    "tel": ("tel", "(tel)"),
    "irc": ("irc", "(irc)"),
    "ws": ("ws", "(ws)"),
    "wss": ("wss", "(ws)"),
}


class ParsedLink(NamedTuple):
    url: str
    proxy: str
    scheme: str
    host: str | None
    base_host: str


def urljoin(base: str, url: str) -> str:
    """Exception-suppressing urljoin (reference darc/link.py:60-76)
    with fast paths for the two dominant shapes — absolute http(s)
    targets and root-relative paths on http(s) bases — verified
    equivalent to stdlib in tests; everything else delegates."""
    if url.startswith(("http://", "https://")):
        return url
    if url.startswith("/") and not url.startswith("//") \
            and base.startswith(("http://", "https://")):
        scheme_end = base.find("//") + 2
        path_start = base.find("/", scheme_end)
        root = base if path_start < 0 else base[:path_start]
        # stdlib collapses /./ and /../ segments; only plain paths skip that
        if "/." not in url:
            return root + url
    try:
        return _urljoin(base, url)
    except ValueError:
        return url


def split_url(url: str) -> tuple[str, str, str]:
    """Return (scheme, netloc, path), tolerant of junk input.

    Fast path avoids ``urlsplit`` for well-formed ``scheme://netloc/...``
    URLs; the slow path delegates to stdlib for full equivalence
    (verified against ``urllib.parse.urlsplit`` in tests).
    """
    # fast path: scheme://netloc[/path...]
    i = url.find(":")
    if i > 0:
        scheme = url[:i]
        if (scheme.isascii() and scheme[0].isalpha()
                and scheme.replace("+", "").replace("-", "").replace(".", "").isalnum()):
            rest = url[i + 1:]
            if rest.startswith("//"):
                rest = rest[2:]
                for j, ch in enumerate(rest):
                    if ch in "/?#":
                        netloc, tail = rest[:j], rest[j:]
                        break
                else:
                    netloc, tail = rest, ""
                if "?" in tail:
                    tail = tail.split("?", 1)[0]
                if "#" in tail:
                    tail = tail.split("#", 1)[0]
                # netloc containing credentials/brackets → defer to stdlib
                if "@" not in netloc and "[" not in netloc and "#" not in netloc and "?" not in netloc:
                    return scheme.lower(), netloc, tail
            else:
                # opaque URL like mailto:a@b.c / bitcoin:1A1…
                tail = rest.split("#", 1)[0].split("?", 1)[0]
                return scheme.lower(), "", tail
    try:
        parts = _urlsplit(url)
        return parts.scheme.lower(), parts.netloc, parts.path
    except ValueError:
        return "", "", url


def parse_one(url: str, host: str | None = None) -> ParsedLink:
    """Classify one URL; mirrors darc/link.py:316-404 rule order."""
    scheme, netloc, path = split_url(url)
    if host is None:
        host = netloc or None

    hostname = host or "(null)"
    scheme = scheme.casefold()

    sp = _SCHEME_PROXY.get(scheme)
    if sp is not None:
        proxy, host = sp
    elif scheme not in ("http", "https"):
        proxy = scheme  # rule 9: any other scheme is its own proxy type
    elif host is None:
        hostname = "(null)"
        proxy = "null"
    elif host.endswith(".onion"):
        proxy = "tor"
    elif host.endswith(".onion.sh"):
        proxy = "tor2web"
    elif host.endswith(".i2p"):
        proxy = "i2p"
    elif host in _I2P_LOCAL:
        proxy = "i2p"
    elif host in _ZERONET_LOCAL:
        if path in ("", "/"):
            proxy = "null"
        else:
            proxy = "zeronet"
            hostname = _first_path_part(path)
    elif host in _FREENET_LOCAL:
        if path in ("", "/"):
            proxy = "null"
        else:
            proxy = "freenet"
            hostname = _first_path_part(path)
    else:
        proxy = "null"

    return ParsedLink(url=url, proxy=proxy, scheme=scheme, host=host, base_host=hostname)


def _first_path_part(path: str) -> str:
    # PosixPath(path).parts[1] equivalent for absolute URL paths
    return path.lstrip("/").split("/", 1)[0]


def parse_batch(urls: list[str]) -> dict[str, list]:
    """Batch classifier: list of urls → dict of columns
    (proxy, scheme, host, base_host).  Hash/partition columns are added
    by the stage (``darc_ray.stages.parse``) so this stays hash-agnostic.
    """
    n = len(urls)
    proxy: list[str] = [""] * n
    scheme: list[str] = [""] * n
    host: list[str | None] = [None] * n
    base_host: list[str] = [""] * n
    for i, u in enumerate(urls):
        p = parse_one(u)
        proxy[i] = p.proxy
        scheme[i] = p.scheme
        host[i] = p.host
        base_host[i] = p.base_host
    return {"proxy": proxy, "scheme": scheme, "host": host, "base_host": base_host}


TRACKING_PARAM_PAT = r"^(utm_[^=]*|fbclid|gclid|ref|mc_cid|mc_eid)="


def canonicalize_urls(urls):
    """Vectorized frontier-hygiene URL canonicalization (pd.Series →
    DataFrame[canon, n_stripped]) — the collapse rule layered ABOVE the
    engine's exact URL-seen dedup (`state/frontier.py` stores exact
    URLs; this measures how many frontier entries are the same page in
    disguise).  Rules, each mirrored verbatim by the family's SQL
    oracle: lowercase scheme+host; strip the scheme's default port
    (:80 / :443); drop the fragment; drop tracking params whose KEY
    matches ``TRACKING_PARAM_PAT`` (the ``=`` anchor means
    ``referrer=`` survives — `ref` is a prefix, not the key); sort the
    surviving ``k=v`` segments bytewise; path untouched (case and
    trailing-slash significant).  A URL the anchored regex cannot
    parse (relative, schemeless, opaque ``mailto:``) canonicalizes to
    ITSELF with n_stripped 0 — rows pass through rather than silently
    vanishing from the census.  One anchored regex split + explode /
    sort / groupby-join — no Python loop over rows."""
    import numpy as np
    import pandas as pd

    parts = urls.str.extract(
        r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?"
        r"(?:#.*)?$")
    scheme = parts[0].str.lower()
    host = parts[1].str.lower()
    host = pd.Series(
        np.where(scheme.eq("http"),
                 host.str.replace(r":80$", "", regex=True),
                 np.where(scheme.eq("https"),
                          host.str.replace(r":443$", "", regex=True),
                          host)),
        index=urls.index)
    base = scheme + "://" + host + parts[2].fillna("")

    seg = parts[3].fillna("").str.split("&").explode()
    seg = seg[seg.ne("")]
    kept = seg[~seg.str.match(TRACKING_PARAM_PAT)]
    n_stripped = (seg.groupby(level=0).size()
                  .sub(kept.groupby(level=0).size(), fill_value=0)
                  .reindex(urls.index, fill_value=0).astype(np.int64))
    joined = (pd.DataFrame({"i": kept.index, "p": kept.to_numpy()})
              .sort_values(["i", "p"], kind="mergesort")
              .groupby("i")["p"].agg("&".join)
              .reindex(urls.index))
    canon = base + np.where(joined.notna(), "?" + joined.fillna(""), "")
    unparsed = parts[0].isna()
    canon = pd.Series(np.where(unparsed, urls, canon), index=urls.index)
    n_stripped = n_stripped.mask(unparsed, 0).astype(np.int64)
    return pd.DataFrame({"canon": canon, "n_stripped": n_stripped})
