"""Gate filters: proxy / host / mime black-white-fallback semantics.

Reimplements ``match_proxy`` / ``match_host`` / ``match_mime``
(``/root/reference/darc/parse.py:62-155``) as batch mask kernels.
Reference convention: the match_* functions return True when the row
should be DROPPED; these kernels return *keep* masks (True = keep) so
they compose directly with Arrow ``filter``.
"""

from __future__ import annotations

import numpy as np

from darc_ray.config import CrawlConfig


def keep_proxy_mask(proxies: list[str], cfg: CrawlConfig) -> np.ndarray:
    """True = keep.  ``script`` always dropped; black list drops; white
    list keeps; else fallback drops iff proxy_fallback (parse.py:62-93)."""
    black = set(cfg.proxy_black_list)
    white = set(cfg.proxy_white_list)
    fallback_keep = not cfg.proxy_fallback
    out = np.empty(len(proxies), dtype=bool)
    for i, p in enumerate(proxies):
        if p == "script" or p in black:
            out[i] = False
        elif p in white:
            out[i] = True
        else:
            out[i] = fallback_keep
    return out


def keep_host_mask(hosts: list[str | None], cfg: CrawlConfig) -> np.ndarray:
    """True = keep.  None host always dropped; regex fullmatch black
    drops, white keeps, else fallback (parse.py:96-128)."""
    black = cfg.compiled_link_black()
    white = cfg.compiled_link_white()
    fallback_keep = not cfg.link_fallback
    out = np.empty(len(hosts), dtype=bool)
    cache: dict[str, bool] = {}
    for i, h in enumerate(hosts):
        if h is None:
            out[i] = False
            continue
        got = cache.get(h)
        if got is None:
            if any(p.fullmatch(h) for p in black):
                got = False
            elif any(p.fullmatch(h) for p in white):
                got = True
            else:
                got = fallback_keep
            cache[h] = got
        out[i] = got
    return out


def keep_mime_mask(mimes: list[str], cfg: CrawlConfig) -> np.ndarray:
    """True = keep (parse.py:131-155)."""
    black = cfg.compiled_mime_black()
    white = cfg.compiled_mime_white()
    fallback_keep = not cfg.mime_fallback
    out = np.empty(len(mimes), dtype=bool)
    cache: dict[str, bool] = {}
    for i, m in enumerate(mimes):
        got = cache.get(m)
        if got is None:
            if any(p.fullmatch(m) for p in black):
                got = False
            elif any(p.fullmatch(m) for p in white):
                got = True
            else:
                got = fallback_keep
            cache[m] = got
        out[i] = got
    return out


def candidate_keep_mask(hosts: list[str | None], proxies: list[str],
                        cfg: CrawlConfig) -> np.ndarray:
    """The ``_check`` candidate filter = host-keep AND proxy-keep
    (parse.py:244-273 without the HEAD-probe variant)."""
    return keep_host_mask(hosts, cfg) & keep_proxy_mask(proxies, cfg)


def normalize_content_type(header_value: str | None, body: bytes | None = None) -> str:
    """``get_content_type`` semantics (parse.py:276-302): header wins,
    else a tiny magic-number sniff (libmagic is not available here —
    the sniff covers the corpus formats), else ``(null)``; lowercased,
    parameters stripped."""
    ct = header_value
    if ct is None:
        ct = _sniff(body) if body else None
        if ct is None:
            ct = "(null)"
    return ct.casefold().split(";", 1)[0].strip()


_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"\x1f\x8b", "application/gzip"),
    (b"%PDF", "application/pdf"),
]


def _sniff(body: bytes) -> str | None:
    for magic, mime in _MAGIC:
        if body.startswith(magic):
            return mime
    head = body[:256].lstrip().lower()
    if head.startswith((b"<!doctype html", b"<html")):
        return "text/html"
    return None
