"""Robots gating + sitemap/hosts readers (darc/parse.py:158-183,
darc/proxy/null.py:144-332, darc/proxy/i2p.py:282-307 behavior)."""

from __future__ import annotations

import gzip

from darc_ray.functions.robots import RobotsRules
from darc_ray.functions.sitemap import (
    child_sitemaps, hosts_txt_urls, maybe_gunzip, sitemap_urls, sitemaps_from_robots,
)

ROBOTS = """User-agent: *
Allow: /private/ok.html
Disallow: /private/
Crawl-delay: 2
Request-rate: 1/5
Sitemap: http://h.example/sm.xml
Sitemap: /sm2.xml
"""


def test_can_fetch_rules():
    r = RobotsRules(ROBOTS)
    assert r.can_fetch("http://h.example/public/x.html")
    assert not r.can_fetch("http://h.example/private/x.html")
    assert r.can_fetch("http://h.example/private/ok.html")


def test_root_path_always_allowed():
    r = RobotsRules("User-agent: *\nDisallow: /\n")
    assert r.can_fetch("http://h.example/")       # root bypass (parse.py:171-173)
    assert r.can_fetch("http://h.example")        # empty path too
    assert not r.can_fetch("http://h.example/x")


def test_no_robots_allows_all():
    r = RobotsRules(None)
    assert r.can_fetch("http://h.example/anything")
    assert r.effective_delay() == 0.0


def test_delay_and_rate():
    r = RobotsRules(ROBOTS)
    assert r.crawl_delay() == 2.0
    assert r.request_rate() == (1, 5)
    assert r.effective_delay() == 5.0  # max(crawl-delay, seconds/requests)


def test_sitemaps_from_robots_and_fallback():
    assert sitemaps_from_robots("http://h.example/", ROBOTS) == [
        "http://h.example/sm.xml", "http://h.example/sm2.xml"]
    assert sitemaps_from_robots("http://h.example/", "User-agent: *\n") == [
        "http://h.example/sitemap.xml"]


SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.example/sm_a.xml</loc></sitemap>
  <sitemap><loc>/sm_b.xml</loc></sitemap>
</sitemapindex>"""

URLSET = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://h.example/p1</loc></url>
  <url><loc>http://h.example/p2</loc></url>
</urlset>"""


def test_sitemap_parsing():
    assert child_sitemaps("http://h.example/smi.xml", SITEMAP_INDEX) == [
        "http://h.example/sm_a.xml", "http://h.example/sm_b.xml"]
    assert sitemap_urls("http://h.example/", URLSET) == [
        "http://h.example/p1", "http://h.example/p2"]
    # a urlset is not a sitemapindex and vice versa
    assert child_sitemaps("http://h/", URLSET) == []
    assert sitemap_urls("http://h/", SITEMAP_INDEX) == []


def test_gzip_sitemap():
    body = gzip.compress(URLSET.encode())
    assert maybe_gunzip(body, "application/gzip") == URLSET
    assert maybe_gunzip(b"plain", "text/xml") == "plain"


def test_hosts_txt():
    text = "# comment\nfoo.i2p=longkey\nnot-i2p.example=key\n\nbar.i2p=k2\n"
    assert hosts_txt_urls(text) == ["http://foo.i2p", "http://bar.i2p"]
