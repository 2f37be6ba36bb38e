"""Conformance across the config matrix: CHECK-time filtering, FORCE
(robots off), tight politeness caps, filter lists, deeper recrawl
horizon — each variant must still match the oracle exactly."""

from __future__ import annotations

import pytest

from darc_ray.config import CrawlConfig
from darc_ray.pipelines.corpus import make_corpus
from darc_ray.pipelines.crawl import CrawlEngine
from darc_ray.pipelines.oracle import simulate

CONFIGS = {
    "check_on": dict(check=True, link_black_list=[r"h00[12]\.example"],
                     proxy_black_list=["tor2web"]),
    "force_robots_off": dict(force=True),
    "tight_politeness": dict(per_host_cap=2, max_pool=25),
    "mime_filtered_deep": dict(mime_black_list=["image/.*"], time_cache=1.0),
    "actor_pool_fetch": dict(fetch_use_actors=True),
    # the render stage's actor-pool flavor (fetch_use_actors gates both
    # stages): per-proxy drivers live for the round in each actor
    "render_actor_pool": dict(render_enabled=True, fetch_use_actors=True),
    "check_ng_probe": dict(check_ng=True, mime_black_list=["image/.*"]),
    # render queue must get the same _check_ng host/proxy/HEAD-mime
    # filtering as the crawl queue (load_selenium(check=CHECK) →
    # _check → _check_ng, ref darc/db.py:1060, darc/parse.py:244-273)
    "render_check_ng": dict(render_enabled=True, check_ng=True,
                            mime_black_list=["image/.*"],
                            link_black_list=[r"h00[3]\.example"]),
    # forced attr-store spilling: 16-row hot cap per shard pushes most
    # frontier attrs to parquet runs — cold-path pops must stay exact
    "spilled_frontier": dict(frontier_resident_rows=16, render_enabled=True),
    # CHECK_NG redirect rewrite (ref darc/parse.py:236-241): probed
    # candidates are replaced by the probe's final URL; old hash
    # dropped, final enqueued leased — engine and oracle must agree
    "check_ng_redirect_rewrite": dict(check_ng=True, check_ng_rewrite=True,
                                      render_enabled=True),
    # multi-worker budget (DARC_CPU analog): workers multiplies the
    # per-round lease budget (max_pool × workers, darc/process.py
    # worker fan-out each popping MAX_POOL)
    "multi_worker_budget": dict(workers=4, max_pool=12),
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    c = make_corpus(seed=5, n_hosts=9, pages_per_host=5)
    path = tmp_path_factory.mktemp("mcorpus")
    c.save(str(path))
    return c, str(path)


@pytest.mark.parametrize("variant", sorted(CONFIGS))
def test_variant_matches_oracle(variant, corpus, ray_session, tmp_path_factory):
    c, cpath = corpus
    base = dict(max_pool=40, time_cache=2.0, seen_shards=3, host_shards=2,
                fetch_concurrency=2, fetch_batch_size=16, snapshot_every=0)
    base.update(CONFIGS[variant])
    cfg = CrawlConfig(**base)
    rounds = 10 if variant in ("mime_filtered_deep",
                               "check_ng_redirect_rewrite") else 7
    out = str(tmp_path_factory.mktemp(variant))
    eng = CrawlEngine(cpath, out, cfg)
    eng.seed(c.seeds)
    totals = eng.run(rounds)
    want = simulate(c, cfg, rounds)

    assert eng.pop_log == want.pop_order, variant
    assert set(eng.seen_hashes()) == want.seen, variant
    pages = eng.pages_table()
    got_pages = {(r["url_hash"], r["round"], r["status"], r["mime"])
                 for r in (pages.to_pylist() if pages is not None else [])}
    want_pages = {(p["url_hash"], p["round"], p["status"], p["mime"])
                  for p in want.pages}
    assert got_pages == want_pages, variant
    arts = eng.artifacts_table()
    got_arts = sorted((r["proxy"], r["src"], r["url"])
                      for r in (arts.to_pylist() if arts is not None else []))
    assert got_arts == sorted(want.artifacts), variant
    eng.shutdown()


def test_redirect_history_location_points_at_target(corpus, ray_session,
                                                    tmp_path_factory):
    """Absolute check (not oracle-relative): a crawled URL that
    redirected carries a history hop whose Location header is the TRUE
    redirect target from the corpus, not the original URL."""
    c, cpath = corpus
    src = "http://t001oooooooooooooooooooooooooooooooooooooooooooooooo.onion/p001.html"
    dst = c.resolve(src)
    assert dst != src
    eng = CrawlEngine(cpath, str(tmp_path_factory.mktemp("redir")),
                      CrawlConfig(max_pool=40, time_cache=2.0, seen_shards=3,
                                  host_shards=2, fetch_concurrency=2,
                                  fetch_batch_size=16, snapshot_every=0))
    eng.seed(c.seeds)
    eng.run(10)
    pages = eng.pages_table().to_pylist()
    hop_pages = [p for p in pages if p["history"]]
    assert hop_pages, "the redirecting URL was crawled"
    redirected = [p for p in hop_pages if p["url"] == src]
    assert redirected
    hop = redirected[0]["history"][-1]
    assert dict(hop["headers"])["Location"] == dst
    assert hop["url"] == src and hop["status"] == 301
    eng.shutdown()


def test_wall_clock_mode_smoke(corpus, ray_session, tmp_path_factory):
    """logical_clock=False runs the reference's wall-time lease
    arithmetic (darc/db.py:918-977).  Not oracle-comparable (time is
    real), but the loop must make progress and stay consistent."""
    c, cpath = corpus
    cfg = CrawlConfig(max_pool=40, time_cache=0.05, seen_shards=3, host_shards=2,
                      fetch_concurrency=2, fetch_batch_size=16, snapshot_every=0,
                      logical_clock=False)
    eng = CrawlEngine(cpath, str(tmp_path_factory.mktemp("wall")), cfg)
    eng.seed(c.seeds)
    totals = eng.run(4)
    assert totals["taken"] > 0 and totals["pages"] > 0
    counts = eng.counts()
    assert counts["ever"] >= len(c.seeds)
    # wall-clock leases expire after time_cache: a later run re-takes
    import time as _t

    _t.sleep(0.1)
    totals2 = eng.run(2)
    assert totals2["taken"] > 0
    eng.shutdown()


def test_check_ng_rewrite_replaces_candidate(corpus, ray_session,
                                             tmp_path_factory):
    """The redirecting candidate is actually rewritten: its hash enters
    the seen set but is dropped from the live frontier, and no page is
    ever fetched under the pre-redirect URL (parse.py:240)."""
    import hashlib

    import ray

    c, cpath = corpus
    src = "http://t001oooooooooooooooooooooooooooooooooooooooooooooooo.onion/p001.html"
    dst = c.resolve(src)
    assert dst != src, "corpus must contain a redirect for this test"
    cfg = CrawlConfig(max_pool=40, time_cache=2.0, seen_shards=3, host_shards=2,
                      fetch_concurrency=2, fetch_batch_size=16, snapshot_every=0,
                      check_ng=True, check_ng_rewrite=True)
    eng = CrawlEngine(cpath, str(tmp_path_factory.mktemp("rw")), cfg)
    eng.seed(c.seeds)
    eng.run(10)
    src_hash = hashlib.sha256(src.encode()).hexdigest()
    seen = set(eng.seen_hashes())
    assert src_hash in seen          # it was discovered and enqueued
    # the pre-redirect URL is never fetched — every pop of it is
    # rewritten to the final URL before the crawl (the old hash may
    # legitimately re-enter the frontier via later re-extraction, as in
    # the reference's nx re-add after drop)
    pages = eng.pages_table()
    urls = {r["url"] for r in pages.to_pylist()}
    assert src not in urls and dst in urls
    assert any(u == src for _, u in eng.pop_log)  # popped, then rewritten
    eng.shutdown()


def test_fixtures_scale_with_render(ray_session, tmp_path_factory):
    """FIXTURES.md default scale (20 hosts × 25 pages) at production-like
    shard counts, dual-queue enabled, 12 rounds — still oracle-exact."""
    c = make_corpus(seed=42, n_hosts=20, pages_per_host=25)
    cpath = str(tmp_path_factory.mktemp("bigcorpus"))
    c.save(cpath)
    cfg = CrawlConfig(max_pool=300, time_cache=2.0, seen_shards=8, host_shards=4,
                      fetch_concurrency=3, fetch_batch_size=64, snapshot_every=5,
                      render_enabled=True)
    out = str(tmp_path_factory.mktemp("bigout"))
    eng = CrawlEngine(cpath, out, cfg)
    eng.seed(c.seeds)
    eng.run(12)
    want = simulate(c, cfg, 12)
    assert eng.pop_log == want.pop_order
    assert set(eng.seen_hashes()) == want.seen
    assert eng.render_pop_log == want.render_pop_order
    assert set(eng.render_seen()) == want.render_seen
    eng.shutdown()


def test_partial_bootstrap_failure_retries(corpus, ray_session,
                                           tmp_path_factory):
    """new_host partial-failure retry (ref darc/crawl.py:158-166 +
    submit.py $PARTIAL$): a sitemap fetch that RAISES marks the host's
    bootstrap partial, the hostname is dropped from the seen set, and
    the next encounter retries the bootstrap — engine and oracle run
    the same injected failure and must agree exactly."""
    import hashlib

    import ray

    from darc_ray.pipelines.oracle import simulate as _simulate

    c, cpath = corpus
    target = "http://h006.example/sitemap.xml"

    class FlakyOnce:
        """Raises on the first fetch of ``target``, then delegates."""

        def __init__(self, inner):
            self.inner = inner
            self.fired = False

        def __call__(self, url):
            if url == target and not self.fired:
                self.fired = True
                raise ConnectionError(url)
            return self.inner(url)

        def resolve(self, url):
            r = getattr(self.inner, "resolve", None)
            return r(url) if r else url

    # host_ttl huge: force-refetch must NOT mask the drop-for-retry path
    cfg = CrawlConfig(max_pool=40, time_cache=2.0, host_ttl=1e9,
                      seen_shards=3, host_shards=2, fetch_concurrency=2,
                      fetch_batch_size=16, snapshot_every=0)
    rounds = 8
    eng = CrawlEngine(cpath, str(tmp_path_factory.mktemp("partial")), cfg)
    ray.get([h.set_fetch_fn.remote(FlakyOnce(eng.fetch_fn))
             for h in eng.hosts])
    eng.seed(c.seeds)
    totals = eng.run(rounds)
    assert totals["boot_partial"] >= 1           # the injected failure fired

    want = _simulate(c, cfg, rounds, bootstrap_fetch=FlakyOnce(c.lookup))
    assert eng.pop_log == want.pop_order
    assert set(eng.seen_hashes()) == want.seen
    pages = eng.pages_table()
    got_pages = {(r["url_hash"], r["round"], r["status"], r["mime"])
                 for r in (pages.to_pylist() if pages is not None else [])}
    want_pages = {(p["url_hash"], p["round"], p["status"], p["mime"])
                  for p in want.pages}
    assert got_pages == want_pages

    # the retry actually recovered the sitemap: a sitemap-only page of
    # h006 was discovered despite the round-0 failure
    sm_only = "http://h006.example/sm_only_0.html"
    hh = hashlib.sha256(sm_only.encode()).hexdigest()
    assert hh in set(eng.seen_hashes())
    eng.shutdown()
