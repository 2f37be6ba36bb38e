"""Checkpoint/resume: kill after round k, resume from manifests, finish —
final state must equal an uninterrupted run (north rule)."""

from __future__ import annotations

import os
import shutil

import pytest

from darc_ray.config import CrawlConfig
from darc_ray.pipelines.corpus import make_corpus
from darc_ray.pipelines.crawl import CrawlEngine


def _cfg() -> CrawlConfig:
    return CrawlConfig(max_pool=30, workers=1, time_cache=2.0, tick=1.0,
                       seen_shards=3, host_shards=2, fetch_concurrency=2,
                       fetch_batch_size=16, snapshot_every=2)


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    c = make_corpus(seed=11, n_hosts=8, pages_per_host=5)
    cpath = str(tmp_path_factory.mktemp("corpus"))
    c.save(cpath)
    return c, cpath


def test_resume_equals_uninterrupted(setup, tmp_path_factory):
    c, cpath = setup
    out_full = str(tmp_path_factory.mktemp("full"))
    eng_full = CrawlEngine(cpath, out_full, _cfg())
    eng_full.seed(c.seeds)
    eng_full.run(7)

    out_part = str(tmp_path_factory.mktemp("part"))
    eng_a = CrawlEngine(cpath, out_part, _cfg())
    eng_a.seed(c.seeds)
    eng_a.run(4)
    # simulate a crashed round 4: stale partial dir without manifest
    crash_dir = os.path.join(out_part, "rounds", "r00004")
    os.makedirs(os.path.join(crash_dir, "pages"), exist_ok=True)
    with open(os.path.join(crash_dir, "pages", "junk.parquet"), "wb") as f:
        f.write(b"not parquet")

    eng_b = CrawlEngine.resume(cpath, out_part, _cfg())
    assert eng_b.next_round == 4
    eng_b.run(3)

    assert eng_b.seen_hashes() == eng_full.seen_hashes()
    assert eng_b.counts() == eng_full.counts()

    pages_full = eng_full.pages_table()
    pages_part = eng_b.pages_table()
    key = lambda t: sorted((r["url_hash"], r["round"], r["status"]) for r in t.to_pylist())
    assert key(pages_part) == key(pages_full)

    # crawl ordering after resume matches the full run's later rounds
    full_order = [(t, u) for t, u in eng_full.pop_log if t >= 4]
    assert eng_b.pop_log == full_order


def test_resume_from_empty_dir(setup, tmp_path_factory):
    _, cpath = setup
    out = str(tmp_path_factory.mktemp("empty"))
    eng = CrawlEngine.resume(cpath, out, _cfg())
    assert eng.next_round == 0


def test_graceful_signal_stop_then_resume(setup, tmp_path_factory):
    """register_signal + graceful stop (ref darc/signal.py:35-63,
    process.py:114-115): a signal between rounds stops the loop after
    the current round; resume from the per-round checkpoints finishes
    IDENTICALLY to an uninterrupted run."""
    import os as _os
    import signal as _signal

    from darc_ray.hooks import clear_registries, register_signal

    c, cpath = setup
    out_full = str(tmp_path_factory.mktemp("sigfull"))
    eng_full = CrawlEngine(cpath, out_full, _cfg())
    eng_full.seed(c.seeds)
    eng_full.run(7)

    out_part = str(tmp_path_factory.mktemp("sigpart"))
    try:
        register_signal(_signal.SIGUSR1)         # default graceful-stop handler
        eng_a = CrawlEngine(cpath, out_part, _cfg())
        eng_a.seed(c.seeds)
        fired = [0]

        def send_signal(worker_type, pool):      # round hook: after round 3
            if worker_type == "crawler":
                fired[0] += 1
                if fired[0] == 3:
                    _os.kill(_os.getpid(), _signal.SIGUSR1)

        totals = eng_a.run(7, hooks=[send_signal])
        assert totals["rounds"] == 3             # stopped after round 3, not 7
        assert eng_a.next_round == 3
        eng_a.shutdown()
    finally:
        clear_registries()                       # restore handler + stop flag

    eng_b = CrawlEngine.resume(cpath, out_part, _cfg())
    assert eng_b.next_round == 3
    eng_b.run(4)
    assert eng_b.seen_hashes() == eng_full.seen_hashes()
    pages_full = eng_full.pages_table()
    pages_part = eng_b.pages_table()
    key = lambda t: sorted((r["url_hash"], r["round"], r["status"])
                           for r in t.to_pylist())
    assert key(pages_part) == key(pages_full)
    eng_full.shutdown()
    eng_b.shutdown()


def test_request_stop_between_rounds(setup, tmp_path_factory):
    """Engine-level stop flag (no signal): request_stop from a round
    hook halts after the current round."""
    c, cpath = setup
    out = str(tmp_path_factory.mktemp("reqstop"))
    eng = CrawlEngine(cpath, out, _cfg())
    eng.seed(c.seeds)

    def stop_now(worker_type, pool):
        eng.request_stop()

    totals = eng.run(5, hooks=[stop_now])
    assert totals["rounds"] == 1
    assert eng.next_round == 1
    eng.shutdown()
