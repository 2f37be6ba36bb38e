"""Frontier enqueue stage: routes deduped candidate rows to the
frontier shards with the reference's save_requests score semantics
(fresh discoveries: ``score=0, nx`` — darc/crawl.py:225; sitemap /
hosts.txt discoveries: ``score=now`` replace — null.py:332,
crawl.py:202).  One batched RPC per (shard × batch)."""

from __future__ import annotations

import pyarrow as pa

_COLS = ("url", "url_hash", "proxy", "scheme", "host", "base_host", "backref", "depth")


class EnqueueStage:
    def __init__(self, frontier_shards: list, now: float) -> None:
        self.shards = frontier_shards
        self.now = now

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        cols = batch.to_pydict()
        n = len(cols["url_hash"])
        by_call: dict[tuple[int, str], list[int]] = {}
        for i in range(n):
            by_call.setdefault((int(cols["shard"][i]), cols["mode"][i]), []).append(i)
        futures = []
        for (s, mode), idxs in sorted(by_call.items()):
            sub = {c: [cols[c][i] for i in idxs] for c in _COLS}
            score, nx = (0.0, True) if mode == "zero_nx" else (self.now, False)
            method = self.shards[s].upsert
            if hasattr(method, "remote"):
                futures.append(method.remote(sub, score, nx))
            else:
                futures.append(method(sub, score, nx))
        added = sum(ray.get(f) if not isinstance(f, int) else f for f in futures)
        return pa.Table.from_pydict({"enqueued": [added], "routed": [n]})
