"""Round pipelining (config.overlap_rounds): the speculative next-round
pop + deferred checkpoint finish must be invisible semantically —
identical pop ordering, seen set, pages and manifests vs the serial
engine — while actually engaging (spec_pop hits) in steady-state
re-crawl rounds."""

from __future__ import annotations

import json
import os

import pytest

from darc_ray.config import CrawlConfig
from darc_ray.pipelines.corpus import make_corpus
from darc_ray.pipelines.crawl import CrawlEngine


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    c = make_corpus(seed=7, n_hosts=8, pages_per_host=5)
    path = tmp_path_factory.mktemp("corpus_ov")
    c.save(str(path))
    return c, str(path)


def _cfg(overlap: bool) -> CrawlConfig:
    # short lease -> the whole frontier re-pops every round, the
    # steady-state shape where speculation pays
    return CrawlConfig(max_pool=500, workers=1, time_cache=0.5, tick=1.0,
                       host_ttl=1e9, seen_shards=4, host_shards=2,
                       fetch_concurrency=2, fetch_batch_size=64,
                       per_host_cap=500, snapshot_every=0,
                       overlap_rounds=overlap)


def _run(cpath, out, overlap, rounds=6):
    eng = CrawlEngine(cpath, str(out), _cfg(overlap))
    from darc_ray.sources.table_io import read_table

    urls = read_table(os.path.join(cpath, "web")).column("url").to_pylist()
    eng.seed(urls)
    per_round = [eng.run_round(t) for t in range(rounds)]
    eng._finish_pending_commit()
    state = {
        "pop_log": list(eng.pop_log),
        "seen": sorted(eng.seen_hashes()),
        "counts": eng.counts(),
    }
    pages = eng.pages_table()
    state["pages"] = (sorted(zip(pages.column("url_hash").to_pylist(),
                                 pages.column("round").to_pylist()))
                      if pages is not None else None)
    eng.shutdown()
    return per_round, state


def test_overlap_matches_serial(ray_session, corpus, tmp_path_factory):
    _, cpath = corpus
    out_a = tmp_path_factory.mktemp("ov_on")
    out_b = tmp_path_factory.mktemp("ov_off")
    rounds_a, state_a = _run(cpath, out_a, overlap=True)
    rounds_b, state_b = _run(cpath, out_b, overlap=False)

    assert state_a == state_b
    # functional metrics identical round by round (timings differ)
    for ma, mb in zip(rounds_a, rounds_b):
        fa = {k: v for k, v in ma.items()
              if not k.startswith("t_") and k != "spec_pop"}
        fb = {k: v for k, v in mb.items()
              if not k.startswith("t_") and k != "spec_pop"}
        assert fa == fb
    # speculation engages in every round after the first: discovery
    # inserts, artifact-drop re-inserts, requeues and drops are all
    # patched exactly from the shipped flush rows + per-hash fixes
    assert sum(m.get("spec_pop", 0) for m in rounds_a) >= 4
    assert all("spec_pop" not in m for m in rounds_b)

    # manifests durable and identical modulo timings
    for out in (out_a, out_b):
        for t in range(6):
            p = os.path.join(str(out), f"manifest_r{t:05d}.json")
            assert os.path.exists(p), (out, t)
    ma = json.load(open(os.path.join(str(out_a), "manifest_r00003.json")))
    mb = json.load(open(os.path.join(str(out_b), "manifest_r00003.json")))
    fa = {k: v for k, v in ma["metrics"].items()
          if not k.startswith("t_") and k != "spec_pop"}
    fb = {k: v for k, v in mb["metrics"].items()
          if not k.startswith("t_") and k != "spec_pop"}
    assert fa == fb


@pytest.mark.parametrize("knobs", [
    # truncated shard pops: tiny budget forces the drop/raise fallbacks
    dict(max_pool=5, time_cache=0.5),
    # ineligible requeues: lease outlives the tick (2*ttl > tick)
    dict(max_pool=500, time_cache=0.8),
    # CHECK_NG rewrites rename pool hashes mid-round
    dict(max_pool=500, time_cache=0.5, check_ng=True, check_ng_rewrite=True),
], ids=["truncated", "long-lease", "check-ng-rewrite"])
def test_overlap_matches_serial_matrix(ray_session, corpus, tmp_path_factory, knobs):
    """The exactness fallbacks (budget-truncated shard pops, ineligible
    requeues, CHECK-rewritten hashes) must never change semantics —
    overlapped and serial runs stay bit-identical."""
    _, cpath = corpus

    def cfg(overlap):
        return CrawlConfig(workers=1, tick=1.0, host_ttl=1e9, seen_shards=4,
                           host_shards=2, fetch_concurrency=2,
                           fetch_batch_size=64, per_host_cap=500,
                           snapshot_every=0, overlap_rounds=overlap, **knobs)

    states = []
    for overlap in (True, False):
        out = tmp_path_factory.mktemp(f"ovm_{overlap}")
        eng = CrawlEngine(cpath, str(out), cfg(overlap))
        from darc_ray.sources.table_io import read_table

        urls = read_table(os.path.join(cpath, "web")).column("url").to_pylist()
        eng.seed(urls)
        rounds = [eng.run_round(t) for t in range(6)]
        eng._finish_pending_commit()
        pages = eng.pages_table()
        states.append({
            "pop_log": list(eng.pop_log),
            "seen": sorted(eng.seen_hashes()),
            "counts": eng.counts(),
            "pages": (sorted(zip(pages.column("url_hash").to_pylist(),
                                 pages.column("round").to_pylist()))
                      if pages is not None else None),
            "rounds": [{k: v for k, v in m.items()
                        if not k.startswith("t_") and k != "spec_pop"}
                       for m in rounds],
        })
        eng.shutdown()
    assert states[0] == states[1]


def test_overlap_matches_serial_with_render(ray_session, corpus,
                                            tmp_path_factory):
    """Render runs speculate at round END (after the render phase's
    requests-frontier flush) instead of mid-round — state is final, so
    no corrections apply.  Overlapped and serial render engines must
    stay bit-identical (pop logs on BOTH frontiers, pages, rendered
    rows, seen set), and the speculation must actually engage."""
    _, cpath = corpus

    def cfg(overlap):
        return CrawlConfig(max_pool=500, workers=1, time_cache=0.5,
                           tick=1.0, host_ttl=1e9, seen_shards=4,
                           host_shards=2, fetch_concurrency=2,
                           fetch_batch_size=64, per_host_cap=500,
                           snapshot_every=0, render_enabled=True,
                           overlap_rounds=overlap)

    states, rounds_by = [], []
    for overlap in (True, False):
        out = tmp_path_factory.mktemp(f"ovr_{overlap}")
        eng = CrawlEngine(cpath, str(out), cfg(overlap))
        from darc_ray.sources.table_io import read_table

        urls = read_table(os.path.join(cpath, "web")).column("url").to_pylist()
        eng.seed(urls)
        rounds = [eng.run_round(t) for t in range(6)]
        eng.finalize()
        pages = eng.pages_table()
        rend = eng.render_table()
        states.append({
            "pop_log": list(eng.pop_log),
            "render_pop_log": list(eng.render_pop_log),
            "seen": sorted(eng.seen_hashes()),
            "counts": eng.counts(),
            "pages": (sorted(zip(pages.column("url_hash").to_pylist(),
                                 pages.column("round").to_pylist()))
                      if pages is not None else None),
            "rendered": (sorted(rend.column("url_hash").to_pylist())
                         if rend is not None else None),
            "rounds": [{k: v for k, v in m.items()
                        if not k.startswith("t_") and k != "spec_pop"}
                       for m in rounds],
        })
        rounds_by.append(rounds)
        eng.shutdown()
    assert states[0] == states[1]
    assert sum(m.get("spec_pop", 0) for m in rounds_by[0]) >= 4
    assert all("spec_pop" not in m for m in rounds_by[1])
