"""Filter black/white/fallback semantics (darc/parse.py:62-155 behavior)."""

from __future__ import annotations

import numpy as np

from darc_ray.config import CrawlConfig
from darc_ray.functions.filters import (
    candidate_keep_mask, keep_host_mask, keep_mime_mask, keep_proxy_mask,
    normalize_content_type,
)


def test_proxy_script_always_dropped():
    cfg = CrawlConfig(proxy_white_list=["script"])
    assert not keep_proxy_mask(["script"], cfg)[0]


def test_proxy_black_white_fallback():
    cfg = CrawlConfig(proxy_black_list=["tor"], proxy_white_list=["i2p"], proxy_fallback=True)
    mask = keep_proxy_mask(["tor", "i2p", "null"], cfg)
    assert mask.tolist() == [False, True, False]
    cfg2 = CrawlConfig()
    assert keep_proxy_mask(["null", "tor"], cfg2).tolist() == [True, True]


def test_host_none_always_dropped():
    assert keep_host_mask([None], CrawlConfig(link_fallback=False)).tolist() == [False]


def test_host_regex_fullmatch():
    cfg = CrawlConfig(link_black_list=[r".*\.bad\.example"], link_white_list=[r"good\.example"])
    mask = keep_host_mask(["x.bad.example", "good.example", "other.example"], cfg)
    assert mask.tolist() == [False, True, True]
    # fullmatch, not search: a black pattern must cover the whole host
    cfg2 = CrawlConfig(link_black_list=["bad"])
    assert keep_host_mask(["bad.example"], cfg2).tolist() == [True]
    # case-insensitive compile, as the reference (const.py:91)
    cfg3 = CrawlConfig(link_black_list=[r"EVIL\.example"])
    assert keep_host_mask(["evil.example"], cfg3).tolist() == [False]


def test_mime_lists():
    cfg = CrawlConfig(mime_black_list=["image/.*"], mime_fallback=False)
    mask = keep_mime_mask(["image/png", "text/html"], cfg)
    assert mask.tolist() == [False, True]


def test_candidate_mask_is_and():
    cfg = CrawlConfig(link_black_list=["blocked.example"])
    hosts = ["ok.example", "blocked.example", None, "ok.example"]
    proxies = ["null", "null", "null", "script"]
    assert candidate_keep_mask(hosts, proxies, cfg).tolist() == [True, False, False, False]


def test_normalize_content_type():
    assert normalize_content_type("Text/HTML; charset=utf-8") == "text/html"
    assert normalize_content_type(None, b"\x89PNG\r\n\x1a\nxxx") == "image/png"
    assert normalize_content_type(None, b"<!DOCTYPE html><html>") == "text/html"
    assert normalize_content_type(None, b"\x00\x01") == "(null)"
    assert normalize_content_type(None, None) == "(null)"
