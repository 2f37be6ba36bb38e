"""Unit tests for the stateful shards: cuckoo/bloom filters, frontier
score/lease/nx semantics, candidate buffers, delta/snapshot replay,
host-state TTL + politeness."""

from __future__ import annotations

import numpy as np

from darc_ray.state.filters import BloomFilter, CuckooFilter
from darc_ray.state.frontier import FrontierShard
from darc_ray.state.host_state import HostShard


def _batch(urls, depth=0):
    import hashlib

    return {
        "url_hash": [hashlib.sha256(u.encode()).hexdigest() for u in urls],
        "url": list(urls),
        "proxy": ["null"] * len(urls),
        "scheme": ["http"] * len(urls),
        "host": ["h.example"] * len(urls),
        "base_host": ["h.example"] * len(urls),
        "backref": [""] * len(urls),
        "depth": [depth] * len(urls),
    }


# ---------------------------------------------------------------- filters
def test_cuckoo_no_false_negatives():
    f = CuckooFilter(4096, seed=1)
    keys = [f"k{i}".encode() for i in range(3000)]
    for k in keys:
        f.insert(k)
    assert all(f.contains(k) for k in keys)          # false negatives forbidden


def test_cuckoo_low_false_positive_rate():
    f = CuckooFilter(4096, seed=1)
    for i in range(2000):
        f.insert(f"k{i}".encode())
    fp = sum(f.contains(f"other{i}".encode()) for i in range(2000))
    assert fp < 100                                   # ~<5% at this load


def test_cuckoo_overflow_degrades_to_all_positive():
    f = CuckooFilter(8, seed=0)                       # tiny → forced overflow
    for i in range(5000):
        f.insert(f"k{i}".encode())
    assert f.overflowed
    assert f.contains(b"never-inserted")              # safe direction


def test_bloom_no_false_negatives():
    b = BloomFilter(1000, fp_rate=0.01, seed=2)
    keys = [f"b{i}".encode() for i in range(1000)]
    for k in keys:
        b.insert(k)
    assert all(b.contains(k) for k in keys)
    fp = sum(b.contains(f"x{i}".encode()) for i in range(1000))
    assert fp < 60


# ---------------------------------------------------------------- frontier
def test_nx_keeps_first_score_and_attrs():
    s = FrontierShard(0)
    b = _batch(["http://a/"])
    s.upsert(b, 0.0, nx=True)
    b2 = _batch(["http://a/"])
    b2["backref"] = ["http://parent/"]
    s.upsert(b2, 9.0, nx=True)                        # nx: no-op on existing
    row = s.rows[b["url_hash"][0]]
    assert row[6] == 0.0 and row[5] == ""


def test_xx_only_updates_existing():
    s = FrontierShard(0)
    s.upsert(_batch(["http://a/"]), 1.0)
    s.upsert(_batch(["http://a/", "http://b/"]), 7.0, xx=True)
    hashes = _batch(["http://a/", "http://b/"])["url_hash"]
    assert s.rows[hashes[0]][6] == 7.0
    assert hashes[1] not in s.rows                    # xx never inserts


def test_pop_order_and_lease_and_drop():
    s = FrontierShard(0)
    urls = [f"http://h/{i}" for i in range(10)]
    s.upsert(_batch(urls), 0.0, nx=True)
    got = s.pop_candidates(now=5.0, ttl=2.0, k=4)
    assert len(got["url_hash"]) == 4
    assert got["url_hash"] == sorted(got["url_hash"])  # equal score → hash order
    s.set_scores(got["url_hash"], 7.0)                 # lease
    again = s.pop_candidates(now=5.0, ttl=2.0, k=10)
    assert set(again["url_hash"]).isdisjoint(got["url_hash"])
    n = s.drop(got["url_hash"][:2])
    assert n == 2
    assert s.counts()["live"] == 8 and s.counts()["ever"] == 10


def test_candidate_buffer_winner_merge_commutes():
    def run(order):
        s = FrontierShard(0)
        for b, d in order:
            batch = _batch(["http://x/"], depth=d)
            batch["backref"] = [b]
            batch["mode"] = ["zero_nx"]
            s.buffer_candidates(batch)
        s.flush_candidates(now=3.0)
        row = s.rows[_batch(["http://x/"])["url_hash"][0]]
        return row[5], row[7], row[6]

    a = run([("http://p1/", 2), ("http://p0/", 5), ("http://p2/", 1)])
    b = run([("http://p2/", 1), ("http://p1/", 2), ("http://p0/", 5)])
    assert a == b == ("http://p0/", 5, 0.0)           # min (backref, depth), score 0


def test_flush_modes_nx_then_replace():
    s = FrontierShard(0)
    s.upsert(_batch(["http://a/"]), 1.0)              # existing row
    ba = _batch(["http://a/", "http://b/"])
    ba["mode"] = ["zero_nx", "now_replace"]
    s.buffer_candidates(ba)
    res = s.flush_candidates(now=9.0)
    assert res["added"] == 1                          # only b is new
    assert res["mutated"] == 1                        # only b's insert mutates
    assert s.rows[ba["url_hash"][0]][6] == 1.0        # nx kept existing score
    assert s.rows[ba["url_hash"][1]][6] == 9.0        # replace → now


def test_delta_snapshot_replay_roundtrip():
    s = FrontierShard(0)
    s.upsert(_batch([f"http://h/{i}" for i in range(20)]), 0.0, nx=True)
    d1 = s.drain_delta()
    s.drop(_batch(["http://h/3"])["url_hash"])
    s.set_scores(_batch(["http://h/4"])["url_hash"], 8.0)
    d2 = s.drain_delta()
    restored = FrontierShard(0)
    restored.restore(None, [d1, d2])
    assert restored.rows.keys() == s.rows.keys()
    assert restored.ever == s.ever
    assert restored.rows[_batch(["http://h/4"])["url_hash"][0]][6] == 8.0
    # snapshot path preserves ever-only hashes
    snap = s.snapshot()
    r2 = FrontierShard(0)
    r2.restore(snap, [])
    assert r2.ever == s.ever and r2.rows.keys() == s.rows.keys()


# ---------------------------------------------------------------- host state
def test_have_hostnames_redis_semantics():
    h = HostShard(0)
    have, force = h.have_hostnames(["a", "b"], ["null", "null"], now=10.0, ttl=5.0)
    assert have == [False, False] and force == [False, False]
    have, force = h.have_hostnames(["a"], ["null"], now=12.0, ttl=5.0)
    assert have == [True] and force == [False]
    have, force = h.have_hostnames(["a"], ["null"], now=20.0, ttl=5.0)
    assert have == [True] and force == [True]         # stale → refetch
    # score updated on force (redis flavor) → not stale immediately after
    have, force = h.have_hostnames(["a"], ["null"], now=21.0, ttl=5.0)
    assert force == [False]


def test_politeness_token_bucket():
    h = HostShard(0)
    h.have_hostnames(["slow.example"], ["null"], now=1.0, ttl=100.0)
    h.hosts["slow.example"]["robots"] = "User-agent: *\nCrawl-delay: 2\n"
    assert h.take_allowance(["slow.example"], [5], now=1.0, per_host_cap=10) == [1]
    assert h.take_allowance(["slow.example"], [5], now=2.0, per_host_cap=10) == [0]
    assert h.take_allowance(["slow.example"], [5], now=3.0, per_host_cap=10) == [1]
    # host without delay → capped only
    assert h.take_allowance(["fast.example"], [50], now=1.0, per_host_cap=8) == [8]


def test_host_snapshot_restore():
    h = HostShard(0)
    h.have_hostnames(["a"], ["tor"], now=3.0, ttl=5.0)
    h.hosts["a"]["robots"] = "User-agent: *\n"
    snap = h.snapshot()
    h2 = HostShard(1)
    h2.restore(snap)
    assert h2.hosts["a"]["score"] == 3.0
    assert h2.hosts["a"]["robots"] == "User-agent: *\n"
    assert h2.hosts["a"]["proxy"] == "tor"
