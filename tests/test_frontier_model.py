"""Property-based check: FrontierShard (cuckoo fast path + delta log +
buffers) must behave exactly like a naive dict model under arbitrary
operation sequences — and restore-from-deltas must reproduce the state
at any cut point."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

from darc_ray.state.frontier import FrontierShard


def _h(u: str) -> str:
    return hashlib.sha256(u.encode()).hexdigest()


def _batch(urls, backrefs=None, depths=None, modes=None):
    n = len(urls)
    b = {
        "url_hash": [_h(u) for u in urls],
        "url": list(urls),
        "proxy": ["null"] * n,
        "scheme": ["http"] * n,
        "host": ["h"] * n,
        "base_host": ["h"] * n,
        "backref": backrefs or [""] * n,
        "depth": depths or [0] * n,
    }
    if modes:
        b["mode"] = modes
    return b


URLS = [f"http://u{i}/" for i in range(12)]

op = st.one_of(
    st.tuples(st.just("upsert"), st.lists(st.sampled_from(URLS), min_size=1, max_size=4),
              st.floats(0, 100), st.booleans(), st.booleans()),
    st.tuples(st.just("drop"), st.lists(st.sampled_from(URLS), min_size=1, max_size=3)),
    st.tuples(st.just("lease"), st.lists(st.sampled_from(URLS), min_size=1, max_size=3),
              st.floats(0, 100)),
    st.tuples(st.just("buffer"), st.lists(st.sampled_from(URLS), min_size=1, max_size=4),
              st.sampled_from(["zero_nx", "now_replace"]),
              st.sampled_from(["", "http://p1/", "http://p2/"]),
              st.integers(0, 3)),
    st.tuples(st.just("flush"), st.floats(0, 100)),
    st.tuples(st.just("pop"), st.floats(0, 100), st.integers(1, 6)),
)


# resident=2 forces the attr store to spill to parquet runs on nearly
# every put — the cold path must be op-for-op identical to all-hot
@pytest.mark.parametrize("resident", [1_000_000, 2])
@settings(max_examples=150, deadline=None)
@given(st.lists(op, min_size=1, max_size=25))
def test_shard_matches_dict_model_and_delta_replay(resident, tmp_path_factory, ops):
    spill = str(tmp_path_factory.mktemp("spill"))
    shard = FrontierShard(0, filter_capacity=256, max_resident_rows=resident,
                          spill_dir=spill)
    model: dict[str, tuple[float, str, int]] = {}   # hash → (score, backref, depth)
    ever: set[str] = set()
    pending: dict[tuple[str, str], tuple[str, int]] = {}
    deltas = []

    for o in ops:
        kind = o[0]
        if kind == "upsert":
            _, urls, score, nx, xx = o
            if nx and xx:
                xx = False
            shard.upsert(_batch(urls), score, nx=nx, xx=xx)
            for u in urls:
                hh = _h(u)
                known = hh in model
                if nx and known:
                    continue
                if xx and not known:
                    continue
                if xx:
                    model[hh] = (score, model[hh][1], model[hh][2])
                else:
                    model[hh] = (score, "", 0)
                ever.add(hh)
        elif kind == "drop":
            _, urls = o
            shard.drop([_h(u) for u in urls])
            for u in urls:
                model.pop(_h(u), None)
        elif kind == "lease":
            _, urls, score = o
            shard.set_scores([_h(u) for u in urls], score)
            for u in urls:
                hh = _h(u)
                if hh in model:
                    model[hh] = (score, model[hh][1], model[hh][2])
        elif kind == "buffer":
            _, urls, mode, backref, depth = o
            shard.buffer_candidates(_batch(urls, backrefs=[backref] * len(urls),
                                           depths=[depth] * len(urls),
                                           modes=[mode] * len(urls)))
            for u in urls:
                key = (_h(u), mode)
                cur = pending.get(key)
                if cur is None or (backref, depth) < cur:
                    pending[key] = (backref, depth)
        elif kind == "pop":
            _, now, k = o
            got = shard.pop_candidates(now, 0.0, k)
            want = sorted((s, hh) for hh, (s, _b, _d) in model.items()
                          if s <= now)[:k]
            assert got["url_hash"] == [hh for _, hh in want]
            assert got["score"] == [s for s, _ in want]
        elif kind == "flush":
            _, now = o
            shard.flush_candidates(now)
            for (hh, mode), (backref, depth) in sorted(
                    pending.items(), key=lambda kv: kv[0][1] != "zero_nx"):
                known = hh in model
                if mode == "zero_nx":
                    if not known:
                        model[hh] = (0.0, backref, depth)
                        ever.add(hh)
                else:
                    model[hh] = (now, backref, depth)
                    ever.add(hh)
            pending.clear()

    # state equivalence
    assert set(shard.rows.keys()) == set(model.keys())
    for hh, (score, backref, depth) in model.items():
        row = shard.rows[hh]
        assert row[6] == score
        assert (row[5], row[7]) == (backref, depth)
    assert shard.ever >= ever           # flush-less buffers never add to ever
    # delta replay reproduces live rows exactly (pending buffers are
    # round-scoped and not durable until flushed — by design)
    deltas.append(shard.drain_delta())
    restored = FrontierShard(0, filter_capacity=256, max_resident_rows=resident,
                             spill_dir=str(tmp_path_factory.mktemp("rspill")))
    restored.restore(None, deltas)
    assert restored.rows.keys() == shard.rows.keys()
    for hh in shard.rows:
        assert restored.rows[hh] == shard.rows[hh]
    assert restored.ever == shard.ever
