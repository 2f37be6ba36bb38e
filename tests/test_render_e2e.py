"""Second-stage (render/loader) conformance: with render_enabled the
engine's dual-queue cycle (crawler promotes → loader renders → loader
extraction feeds the requests frontier) must reproduce the oracle
exactly."""

from __future__ import annotations

import hashlib

import pytest
import ray

from darc_ray.config import CrawlConfig
from darc_ray.pipelines.corpus import make_corpus
from darc_ray.pipelines.crawl import CrawlEngine
from darc_ray.pipelines.oracle import simulate

ROUNDS = 7


def _cfg() -> CrawlConfig:
    return CrawlConfig(max_pool=40, time_cache=2.0, seen_shards=3, host_shards=2,
                       fetch_concurrency=2, fetch_batch_size=16, snapshot_every=3,
                       render_enabled=True)


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    c = make_corpus(seed=21, n_hosts=8, pages_per_host=5)
    cpath = str(tmp_path_factory.mktemp("rcorpus"))
    c.save(cpath)
    out = str(tmp_path_factory.mktemp("rout"))
    eng = CrawlEngine(cpath, out, _cfg())
    eng.seed(c.seeds)
    totals = eng.run(ROUNDS)
    want = simulate(c, _cfg(), ROUNDS)
    return c, cpath, eng, totals, want


def test_requests_side_still_exact(setup):
    _, _, eng, _, want = setup
    assert eng.pop_log == want.pop_order
    assert set(eng.seen_hashes()) == want.seen


def test_render_pop_order_equal(setup):
    _, _, eng, _, want = setup
    assert eng.render_pop_log == want.render_pop_order


def test_render_seen_and_frontier_equal(setup):
    _, _, eng, _, want = setup
    assert set(eng.render_seen()) == want.render_seen
    live = eng.render_live()
    want_live = {hh: (row[6], row[0]) for hh, row in want.render_frontier.items()}
    assert live == want_live


def test_rendered_documents_and_screenshots_equal(setup):
    _, _, eng, _, want = setup
    t = eng.rendered_table()
    assert t is not None
    got = {(r["url_hash"], r["round"]):
           (hashlib.sha256(r["doc"].encode("utf-8", "replace")).hexdigest(),
            hashlib.sha256(r["screenshot"]).hexdigest(), r["width"], r["height"])
           for r in t.to_pylist()}
    exp = {(p["url_hash"], p["round"]):
           (p["doc_digest"], p["screenshot_digest"], p["width"], p["height"])
           for p in want.rendered}
    assert got == exp
    assert len(got) > 0


def test_screenshots_are_valid_png(setup):
    from darc_ray.functions.image import png_decode

    _, _, eng, _, _ = setup
    t = eng.rendered_table()
    for r in t.to_pylist()[:5]:
        pix = png_decode(r["screenshot"])
        assert pix.ndim == 3 and pix.shape[2] == 3
        assert r["width"] == 1024 and r["height"] >= 1100   # ⌈max(h,1000)·1.1⌉


def test_render_resume(setup, tmp_path_factory):
    """Kill/resume with the dual-queue state restores both frontiers."""
    c, cpath, _, _, _ = setup
    out = str(tmp_path_factory.mktemp("rresume"))
    e1 = CrawlEngine(cpath, out, _cfg())
    e1.seed(c.seeds)
    e1.run(4)
    e2 = CrawlEngine.resume(cpath, out, _cfg())
    assert e2.next_round == 4
    e2.run(3)

    full = simulate(c, _cfg(), 7)
    assert set(e2.seen_hashes()) == full.seen
    assert set(e2.render_seen()) == full.render_seen
    live = e2.render_live()
    assert live == {hh: (row[6], row[0]) for hh, row in full.render_frontier.items()}
