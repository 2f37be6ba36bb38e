"""Synthetic corpus: determinism, coverage, persistence, invariants."""

from __future__ import annotations

import numpy as np

from darc_ray.functions import image as img
from darc_ray.functions.link import parse_one
from darc_ray.pipelines.corpus import Corpus, make_corpus


def test_deterministic():
    c1 = make_corpus(seed=7, n_hosts=10, pages_per_host=5)
    c2 = make_corpus(seed=7, n_hosts=10, pages_per_host=5)
    assert c1.web.equals(c2.web)
    assert c1.images.equals(c2.images)
    assert c1.seeds == c2.seeds
    c3 = make_corpus(seed=8, n_hosts=10, pages_per_host=5)
    assert not c1.web.equals(c3.web)


def test_proxy_coverage():
    c = make_corpus(seed=42, n_hosts=20, pages_per_host=5)
    proxies = set(c.host_meta.column("proxy").to_pylist())
    assert proxies == {"null", "tor", "i2p", "tor2web", "zeronet", "freenet"}
    # every page URL classifies to its host's proxy class
    for u, h in zip(c.web.column("url").to_pylist()[:200],
                    c.web.column("host").to_pylist()[:200]):
        p = parse_one(u)
        assert p.host == h, (u, p.host, h)


def test_lookup_and_redirects():
    c = make_corpus(seed=42, n_hosts=8, pages_per_host=10)
    idx = c.index()
    redirects = [u for u, row in idx.items() if row[3]]
    assert redirects, "corpus should contain redirect chains"
    status, mime, body, history = c.lookup(redirects[0])
    assert history and history[0][0] == redirects[0]
    assert status in (0, 200, 301, 404, 500)
    # miss → 404
    s, *_ = c.lookup("http://nonexistent.example/xyz")
    assert s == 404


def test_images_decode_and_phash():
    c = make_corpus(seed=42, n_hosts=6, pages_per_host=4)
    rows = c.images.to_pylist()
    assert rows
    for r in rows[:10]:
        pix = img.decode(r["bytes"], r["fmt"])
        assert pix.shape == (r["h"], r["w"], 3)
        assert img.phash64(pix) == r["phash"]
        assert r["caption"].startswith(r["image_id"])


def test_save_load_roundtrip(tmp_path):
    c = make_corpus(seed=42, n_hosts=6, pages_per_host=4)
    c.save(str(tmp_path / "corpus"))
    c2 = Corpus.load(str(tmp_path / "corpus"))
    assert c2.web.equals(c.web)
    assert c2.seeds == c.seeds


def test_control_files_served():
    c = make_corpus(seed=42, n_hosts=20, pages_per_host=6)
    idx = c.index()
    robots = [u for u in idx if u.endswith("/robots.txt")]
    sitemaps = [u for u in idx if "sitemap" in u or "/sm_" in u]
    hosts_txt = [u for u in idx if u.endswith("/hosts.txt")]
    assert robots and sitemaps and hosts_txt
    # gzip sitemap variant exists
    assert any(idx[u][1] == "application/gzip" for u in sitemaps)
    # statuses include failure modes
    statuses = {row[0] for row in idx.values()}
    assert {200, 301}.issubset(statuses)
    assert 0 in statuses or 404 in statuses or 500 in statuses
