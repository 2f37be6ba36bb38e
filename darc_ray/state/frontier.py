"""Sharded frontier: priority queue + exact URL-seen store per shard.

This replaces the reference's Redis sorted-set / RDS task queue
(``/root/reference/darc/db.py:470-662`` save, ``:868-977`` load,
``:321-467`` drop) with ``seen_shards`` actor-held shards keyed by
``int(url_hash[8:16], 16) % S``.  Each shard holds:

* ``rows``   — live frontier rows: url_hash → attrs + score.  The
  score semantics are the reference's exactly: fresh discoveries
  enqueue ``score=0, nx`` (first-wins, darc/crawl.py:225); failures
  re-enqueue ``score=now``; a round's pop takes ``score ≤ now − ttl``
  ordered by ``(score, url_hash)`` (the Redis zrangebyscore order with
  lex member tie-break, darc/db.py:967-968) and leases taken rows to
  ``now + ttl`` (visibility timeout, darc/db.py:938-941).
* ``ever``   — every url_hash ever enqueued (the conformance
  "URL-seen set"; in the reference this is implicit queue history).
* ``filter`` — a cuckoo filter fast path in front of the exact store
  (north star).  Positives are always confirmed exactly; negatives
  skip the store lookup.  At 10^10 scale ``rows`` becomes a
  disk-backed table and the filter is the memory-resident part; the
  interface stays the same.

Durability is delta-based: every mutation is appended to an op log
(``drain_delta``); the round commit writes the delta per shard, and a
periodic full ``snapshot`` bounds replay length (north rule:
per-partition checkpoints with lineage).

All methods take/return plain dict-of-lists (Arrow-friendly), one call
per batch — callers route batches by ``shard_of``.
"""

from __future__ import annotations

import heapq
from typing import Any

import pyarrow as pa

from darc_ray.state.filters import CuckooFilter

# row attr order in the `rows` dict values
_ATTRS = ("url", "proxy", "scheme", "host", "base_host", "backref", "score", "depth")

DELTA_SCHEMA = pa.schema([
    pa.field("op", pa.string()),          # u = upsert/update, d = drop, e = ever-only
    pa.field("url_hash", pa.string()),
    pa.field("url", pa.string()),
    pa.field("proxy", pa.string()),
    pa.field("scheme", pa.string()),
    pa.field("host", pa.string()),
    pa.field("base_host", pa.string()),
    pa.field("backref", pa.string()),
    pa.field("score", pa.float64()),
    pa.field("depth", pa.int32()),
])


class FrontierShard:
    """One shard; wrap with ``ray.remote`` for the actor pool."""

    def __init__(self, shard_id: int, filter_capacity: int = 1 << 20) -> None:
        self.shard_id = shard_id
        self.filter_capacity = filter_capacity
        self.rows: dict[str, list[Any]] = {}
        self.ever: set[str] = set()
        self.filter = CuckooFilter(filter_capacity, seed=shard_id)
        self._delta: list[tuple[str, str, list[Any] | None]] = []
        # round-buffered candidates: (url_hash, mode) → winner row attrs
        self._pending: dict[tuple[str, str], list[Any]] = {}

    # -- mutation ----------------------------------------------------------
    def upsert(self, batch: dict[str, list], score: float, nx: bool = False,
               xx: bool = False) -> int:
        """save_requests semantics (darc/db.py:644-651): nx keeps the
        first score AND first attrs (backref provenance); xx only
        updates scores of existing rows; default replaces."""
        added = 0
        hashes = batch["url_hash"]
        for i, hh in enumerate(hashes):
            known = self.filter.contains(hh.encode()) and hh in self.rows
            if nx and known:
                continue
            if xx and not known:
                continue
            if known:
                row = self.rows[hh]
                if xx:
                    row[6] = score
                else:
                    row = [batch["url"][i], batch["proxy"][i], batch["scheme"][i],
                           batch["host"][i], batch["base_host"][i], batch["backref"][i],
                           score, batch["depth"][i]]
                    self.rows[hh] = row
                self._delta.append(("u", hh, list(row)))
            else:
                row = [batch["url"][i], batch["proxy"][i], batch["scheme"][i],
                       batch["host"][i], batch["base_host"][i], batch["backref"][i],
                       score, batch["depth"][i]]
                self.rows[hh] = row
                # the filter mirrors `ever` exactly: one fingerprint per
                # distinct hash, or re-added (dropped-then-rediscovered)
                # URLs would consume cuckoo slots toward overflow
                if hh not in self.ever:
                    self.ever.add(hh)
                    self.filter.insert(hh.encode())
                    added += 1
                self._delta.append(("u", hh, list(row)))
        return added

    def buffer_candidates(self, batch: dict[str, list]) -> int:
        """Round-buffer candidate rows, merging duplicates to the
        canonical winner — min ``(backref, depth)`` per (url_hash,
        mode).  Arrival order across concurrent fetch tasks is
        irrelevant (min is commutative), which is what makes the round
        deterministic at any concurrency (see stages/parse.py).
        Applied atomically by :meth:`flush_candidates`."""
        hashes = batch["url_hash"]
        modes = batch["mode"]
        for i, hh in enumerate(hashes):
            key = (hh, modes[i])
            row = [batch["url"][i], batch["proxy"][i], batch["scheme"][i],
                   batch["host"][i], batch["base_host"][i], batch["backref"][i],
                   0.0, batch["depth"][i]]
            cur = self._pending.get(key)
            if cur is None or (row[5], row[7]) < (cur[5], cur[7]):
                self._pending[key] = row
        return len(hashes)

    def flush_candidates(self, now: float) -> int:
        """Apply the round's buffered candidates: fresh discoveries as
        ``score=0, nx`` (crawl.py:225), sitemap/hosts.txt rows as
        ``score=now`` replace (null.py:332).  nx first, replace second —
        the combined outcome is order-independent (tested)."""
        added = 0
        by_mode: dict[str, list[tuple[str, list[Any]]]] = {"zero_nx": [], "now_replace": []}
        for (hh, mode), row in self._pending.items():
            by_mode.setdefault(mode, []).append((hh, row))
        self._pending = {}
        for mode, score, nx in (("zero_nx", 0.0, True), ("now_replace", now, False)):
            items = by_mode.get(mode, [])
            if not items:
                continue
            batch = {
                "url_hash": [hh for hh, _ in items],
                "url": [r[0] for _, r in items],
                "proxy": [r[1] for _, r in items],
                "scheme": [r[2] for _, r in items],
                "host": [r[3] for _, r in items],
                "base_host": [r[4] for _, r in items],
                "backref": [r[5] for _, r in items],
                "depth": [r[7] for _, r in items],
            }
            added += self.upsert(batch, score, nx=nx)
        return added

    def set_scores(self, url_hashes: list[str], score: float) -> None:
        """Lease (score=now+ttl) or requeue (score=now) taken rows."""
        for hh in url_hashes:
            row = self.rows.get(hh)
            if row is not None:
                row[6] = score
                self._delta.append(("u", hh, list(row)))

    def drop(self, url_hashes: list[str]) -> int:
        """drop_requests (darc/db.py:370-417): remove rows; ``ever``
        keeps the hash."""
        n = 0
        for hh in url_hashes:
            if self.rows.pop(hh, None) is not None:
                self._delta.append(("d", hh, None))
                n += 1
        return n

    # -- pop ---------------------------------------------------------------
    def pop_candidates(self, now: float, ttl: float, k: int) -> dict[str, list]:
        """Top-k eligible rows by (score, url_hash); does NOT lease —
        the driver merges shards, applies politeness, then leases.

        The full-scan is O(shard) per round; a production shard keeps a
        score-ordered index alongside (same interface)."""
        max_score = now - ttl
        eligible = ((row[6], hh) for hh, row in self.rows.items() if row[6] <= max_score)
        top = heapq.nsmallest(k, eligible)
        out: dict[str, list] = {"url_hash": [], "url": [], "proxy": [], "scheme": [],
                                "host": [], "base_host": [], "backref": [],
                                "score": [], "depth": []}
        for score, hh in top:
            row = self.rows[hh]
            out["url_hash"].append(hh)
            for name, val in zip(_ATTRS, row):
                out[name if name != "score" else "score"].append(val)
        return out

    # -- introspection -----------------------------------------------------
    def counts(self) -> dict[str, int]:
        return {"live": len(self.rows), "ever": len(self.ever),
                "filter_count": self.filter.count}

    def eligible_count(self, now: float, ttl: float) -> int:
        max_score = now - ttl
        return sum(1 for row in self.rows.values() if row[6] <= max_score)

    def min_score(self) -> float | None:
        return min((row[6] for row in self.rows.values()), default=None)

    def seen_hashes(self) -> list[str]:
        return sorted(self.ever)

    def live_table(self) -> pa.Table:
        return self._table([("u", hh, row) for hh, row in self.rows.items()])

    # -- durability --------------------------------------------------------
    def drain_delta(self) -> pa.Table:
        out = self._table(self._delta)
        self._delta = []
        return out

    def drain_delta_to(self, path: str) -> int:
        """Write this round's delta directly from the shard (parallel
        across shards; nothing serializes through the driver)."""
        from darc_ray.sources.table_io import write_table

        t = self.drain_delta()
        if t.num_rows:
            write_table(t, path)
        return t.num_rows

    def snapshot(self) -> pa.Table:
        ops = [("u", hh, row) for hh, row in self.rows.items()]
        ops += [("e", hh, None) for hh in self.ever if hh not in self.rows]
        return self._table(ops)

    def snapshot_to(self, path: str) -> int:
        from darc_ray.sources.table_io import write_table

        t = self.snapshot()
        write_table(t, path)
        return t.num_rows

    def restore(self, snapshot: pa.Table | None, deltas: list[pa.Table]) -> None:
        self.rows.clear()
        self.ever.clear()
        self._delta = []
        self.filter = CuckooFilter(self.filter_capacity, seed=self.shard_id)
        tables = ([snapshot] if snapshot is not None else []) + list(deltas)
        for t in tables:
            cols = t.to_pydict()
            for i, op in enumerate(cols["op"]):
                hh = cols["url_hash"][i]
                if op == "u":
                    self.rows[hh] = [cols["url"][i], cols["proxy"][i], cols["scheme"][i],
                                     cols["host"][i], cols["base_host"][i],
                                     cols["backref"][i], cols["score"][i], cols["depth"][i]]
                    if hh not in self.ever:
                        self.ever.add(hh)
                        self.filter.insert(hh.encode())
                elif op == "d":
                    self.rows.pop(hh, None)
                elif op == "e":
                    if hh not in self.ever:
                        self.ever.add(hh)
                        self.filter.insert(hh.encode())

    @staticmethod
    def _table(ops: list[tuple[str, str, list[Any] | None]]) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in DELTA_SCHEMA}
        for op, hh, row in ops:
            cols["op"].append(op)
            cols["url_hash"].append(hh)
            if row is None:
                row = ["", "", "", None, "", "", 0.0, 0]
            for name, val in zip(_ATTRS, row):
                cols[name].append(val)
        return pa.Table.from_pydict(cols, schema=DELTA_SCHEMA)
