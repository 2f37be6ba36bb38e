"""Sitemap / robots-sitemap / i2p hosts.txt readers.

Reimplements (``/root/reference/darc/proxy/null.py:144-332``,
``darc/proxy/i2p.py:282-307``):

* ``sitemaps_from_robots`` — sitemap URLs declared in robots.txt, with
  the ``/sitemap.xml`` fallback when none declared.
* ``child_sitemaps``       — ``sitemapindex > sitemap > loc`` recursion.
* ``sitemap_urls``         — ``urlset > url > loc`` page URLs.
* ``hosts_txt_urls``       — i2p ``hosts.txt``: ``name=key`` lines →
  ``http://<name>`` links (comments skipped, ``.i2p`` names only).
* ``maybe_gunzip``         — gzip-compressed sitemap bodies
  (``null.py:314-318``).

The reference parses sitemap XML with html5lib; our corpus XML is
well-formed, so we use a lenient localname-based ElementTree walk with
a regex fallback for non-XML input.
"""

from __future__ import annotations

import gzip
import re
import xml.etree.ElementTree as ET

from darc_ray.functions.link import urljoin
from darc_ray.functions.robots import RobotsRules

I2P_HOST_RE = re.compile(r".*?\.i2p", re.IGNORECASE)

_LOC_RE = re.compile(r"<loc>\s*([^<\s][^<]*?)\s*</loc>", re.IGNORECASE)


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _locs_under(text: str, root_name: str, child_name: str) -> list[str]:
    """All ``<loc>`` values under ``root > child > loc``."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        # lenient fallback: bare regex over <loc> when the expected
        # root element name appears (html5lib-ish tolerance)
        if f"<{root_name}" in text.lower():
            return [m.group(1) for m in _LOC_RE.finditer(text)]
        return []
    if _localname(root.tag) != root_name:
        return []
    out: list[str] = []
    for child in root:
        if _localname(child.tag) != child_name:
            continue
        for loc in child:
            if _localname(loc.tag) == "loc" and loc.text:
                out.append(loc.text.strip())
    return out


def sitemaps_from_robots(page_url: str, robots_text: str) -> list[str]:
    """Sitemap URLs from robots.txt; fallback ``/sitemap.xml``
    (null.py:144-171).  URLs joined against the page URL."""
    sitemaps = RobotsRules(robots_text).site_maps()
    if sitemaps is None:
        return [urljoin(page_url, "/sitemap.xml")]
    return [urljoin(page_url, sm) for sm in sitemaps]


def child_sitemaps(sitemap_url: str, text: str) -> list[str]:
    """Nested sitemaps of a sitemapindex (null.py:174-199)."""
    return [urljoin(sitemap_url, loc) for loc in _locs_under(text, "sitemapindex", "sitemap")]


def sitemap_urls(page_url: str, text: str) -> list[str]:
    """Page URLs of a urlset sitemap (null.py:202-228).  Joined against
    the *original page* URL, as the reference does (``read_sitemap(link,
    …)`` receives the page link, null.py:332)."""
    return [urljoin(page_url, loc) for loc in _locs_under(text, "urlset", "url")]


def hosts_txt_urls(text: str) -> list[str]:
    """i2p hosts.txt → ``http://<name>`` URLs (i2p.py:282-307)."""
    out: list[str] = []
    for line in filter(None, (s.strip() for s in text.splitlines())):
        if line.startswith("#"):
            continue
        host = line.split("=", 1)[0]
        if I2P_HOST_RE.fullmatch(host) is None:
            continue
        out.append(f"http://{host}")
    return out


def maybe_gunzip(body: bytes, mime: str) -> str:
    """Decompress gzip sitemap bodies by content type (null.py:314-318)."""
    if mime == "application/gzip":
        try:
            return gzip.decompress(body).decode()
        except (OSError, UnicodeDecodeError):
            pass
    return body.decode("utf-8", "replace")
