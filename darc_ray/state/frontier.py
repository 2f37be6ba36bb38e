"""Sharded frontier: priority queue + exact URL-seen store per shard.

This replaces the reference's Redis sorted-set / RDS task queue
(``/root/reference/darc/db.py:470-662`` save, ``:868-977`` load,
``:321-467`` drop) with ``seen_shards`` actor-held shards keyed by
``int(url_hash[8:16], 16) % S``.  Each shard holds:

* ``scores`` — the memory-resident index: url_hash → current score,
  paired with a lazy min-heap of ``(score, url_hash)`` entries so a
  round's pop is O(k log n) instead of an O(shard) scan.  The score
  semantics are the reference's exactly: fresh discoveries enqueue
  ``score=0, nx`` (first-wins, darc/crawl.py:225); failures re-enqueue
  ``score=now``; a round's pop takes ``score ≤ now − ttl`` ordered by
  ``(score, url_hash)`` (the Redis zrangebyscore order with lex member
  tie-break, darc/db.py:967-968) and leases taken rows to
  ``now + ttl`` (visibility timeout, darc/db.py:938-941).
* ``store``  — the row-attribute store (url, proxy, host, backref, …).
  Attributes are NOT required to be memory-resident: beyond
  ``max_resident_rows`` the hot dict spills to sorted Parquet runs on
  local disk and lookups read back only the ≤ pool-size rows a pop
  touches.  This is the 10^10-URL design point: per shard, memory holds
  the (score, url_hash) index + cuckoo filter; bulk attributes live in
  spill runs / checkpoints.
* ``ever``   — every url_hash ever enqueued (the conformance
  "URL-seen set"; in the reference this is implicit queue history).
* ``filter`` — a cuckoo filter fast path in front of the exact store
  (north star).  Positives are always confirmed exactly; negatives
  skip the store lookup.

Durability is delta-based: every mutation is appended to an op log
(``drain_delta``); the round commit writes the delta per shard, and a
periodic full ``snapshot`` bounds replay length (north rule:
per-partition checkpoints with lineage).  Score-only changes (leases,
requeues) log a compact ``s`` op — (url_hash, score) — instead of the
full row, so per-round delta size is O(pool), not O(pool × row width).

All methods take/return plain dict-of-lists (Arrow-friendly), one call
per batch — callers route batches by ``shard_of``.
"""

from __future__ import annotations

import heapq
import os
from typing import Any, Iterable

import pyarrow as pa

from darc_ray.state.filters import CuckooFilter

# row attr order in full-row views (score at index 6)
_ATTRS = ("url", "proxy", "scheme", "host", "base_host", "backref", "score", "depth")
# cold attrs held by the RowStore (score lives in the index, not here)
_COLD = ("url", "proxy", "scheme", "host", "base_host", "backref", "depth")

DELTA_SCHEMA = pa.schema([
    pa.field("op", pa.string()),          # u = upsert, s = score-only, d = drop, e = ever-only
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

_SPILL_SCHEMA = pa.schema([
    pa.field("url_hash", pa.string()),
    pa.field("url", pa.string()),
    pa.field("proxy", pa.string()),
    pa.field("scheme", pa.string()),
    pa.field("host", pa.string()),
    pa.field("base_host", pa.string()),
    pa.field("backref", pa.string()),
    pa.field("depth", pa.int32()),
])


class RowStore:
    """url_hash → cold attrs, with a bounded hot dict that spills to
    sorted Parquet runs.  Lookups check hot first, then runs newest →
    oldest (a later version shadows an earlier one); deletes are lazy
    (dropped rows become run garbage reclaimed by :meth:`compact`).

    At test scale nothing spills (``max_resident_rows`` default 1M);
    the forced-spill e2e test runs shards at a tiny cap to prove the
    cold path is semantics-identical."""

    def __init__(self, shard_id: int, max_resident_rows: int = 1_000_000,
                 spill_dir: str | None = None) -> None:
        self.shard_id = shard_id
        self.max_resident = max(1, max_resident_rows)
        self.hot: dict[str, list[Any]] = {}
        self.runs: list[str] = []          # newest last
        self._spill_dir = spill_dir
        self.n_spilled = 0                 # rows across runs, incl. garbage
        self._run_seq = 0

    # -- dirs --------------------------------------------------------------
    def _dir(self) -> str:
        if self._spill_dir is None:
            import tempfile

            self._spill_dir = tempfile.mkdtemp(prefix=f"darc_ray_shard{self.shard_id}_")
        os.makedirs(self._spill_dir, exist_ok=True)
        return self._spill_dir

    # -- mutation ----------------------------------------------------------
    def put(self, hh: str, attrs: list[Any]) -> None:
        self.hot[hh] = attrs
        if len(self.hot) > self.max_resident:
            self._spill()

    def delete(self, hh: str) -> None:
        self.hot.pop(hh, None)             # run copies = garbage until compact

    def _spill(self) -> None:
        import pyarrow.parquet as pq

        items = sorted(self.hot.items())
        cols: dict[str, list] = {"url_hash": [k for k, _ in items]}
        for j, name in enumerate(_COLD):
            cols[name] = [v[j] for _, v in items]
        path = os.path.join(self._dir(), f"run_{self._run_seq:06d}.parquet")
        self._run_seq += 1
        pq.write_table(pa.Table.from_pydict(cols, schema=_SPILL_SCHEMA), path)
        self.runs.append(path)
        self.n_spilled += len(items)
        self.hot.clear()

    # -- lookup ------------------------------------------------------------
    def get_many(self, hashes: Iterable[str]) -> dict[str, list[Any]]:
        hashes = list(hashes)
        found = {hh: self.hot[hh] for hh in hashes if hh in self.hot}
        missing = [hh for hh in hashes if hh not in found]
        if missing:
            import pyarrow.parquet as pq

            for run in reversed(self.runs):
                if not missing:
                    break
                t = pq.read_table(run, filters=[("url_hash", "in", missing)])
                cols = t.to_pydict()
                for i, hh in enumerate(cols["url_hash"]):
                    if hh not in found:
                        found[hh] = [cols[name][i] for name in _COLD]
                missing = [hh for hh in missing if hh not in found]
        if missing:
            raise KeyError(f"RowStore shard {self.shard_id}: missing {missing[:3]}")
        return found

    # -- maintenance -------------------------------------------------------
    def compact(self, live: set[str]) -> None:
        """Rewrite runs keeping only live, newest-version rows.  At the
        10^10 design point this is an external merge of the sorted runs
        (they are each sorted by url_hash); here we rebuild via the
        lookup path, which is O(live) memory — the bound a checkpoint
        snapshot already implies."""
        if not self.runs:
            return
        cold = [hh for hh in live if hh not in self.hot]
        got = self.get_many(cold) if cold else {}
        for p in self.runs:
            try:
                os.remove(p)
            except OSError:
                pass
        self.runs = []
        self.n_spilled = 0
        if got:
            saved_hot = self.hot
            self.hot = dict(got)
            self._spill()
            self.hot = saved_hot
            if len(self.hot) > self.max_resident:
                self._spill()

    def clear(self) -> None:
        self.hot.clear()
        for p in self.runs:
            try:
                os.remove(p)
            except OSError:
                pass
        self.runs = []
        self.n_spilled = 0


class FrontierShard:
    """One shard; wrap with ``ray.remote`` for the actor pool."""

    def __init__(self, shard_id: int, filter_capacity: int = 1 << 20,
                 max_resident_rows: int = 1_000_000,
                 spill_dir: str | None = None) -> None:
        self.shard_id = shard_id
        self.filter_capacity = filter_capacity
        self.scores: dict[str, float] = {}
        self.heap: list[tuple[float, str]] = []      # lazy (score, url_hash) index
        self.store = RowStore(shard_id, max_resident_rows, spill_dir)
        self.ever: set[str] = set()
        self.filter = CuckooFilter(filter_capacity, seed=shard_id)
        self._delta: list[tuple[str, str, list[Any] | None]] = []
        # round-buffered candidates: (url_hash, mode) → winner row attrs
        self._pending: dict[tuple[str, str], list[Any]] = {}

    # -- compatibility views (test-scale introspection) --------------------
    @property
    def rows(self) -> dict[str, list[Any]]:
        """Full dict view {url_hash: [attrs..., score, depth]} — rebuilds
        from the store on each access; test/debug use only."""
        got = self.store.get_many(self.scores.keys())
        return {hh: a[:6] + [self.scores[hh], a[6]] for hh, a in got.items()}

    def _full_row(self, hh: str, attrs: list[Any]) -> list[Any]:
        return attrs[:6] + [self.scores[hh], attrs[6]]

    # -- mutation ----------------------------------------------------------
    def upsert(self, batch: dict[str, list], score: float, nx: bool = False,
               xx: bool = False) -> int:
        """save_requests semantics (darc/db.py:644-651): nx keeps the
        first score AND first attrs (backref provenance); xx only
        updates scores of existing rows; default replaces."""
        added = 0
        hashes = batch["url_hash"]
        for i, hh in enumerate(hashes):
            known = self.filter.contains(hh.encode()) and hh in self.scores
            if nx and known:
                continue
            if xx and not known:
                continue
            if known and xx:
                self.scores[hh] = score
                heapq.heappush(self.heap, (score, hh))
                self._delta.append(("s", hh, [score]))
                continue
            attrs = [batch["url"][i], batch["proxy"][i], batch["scheme"][i],
                     batch["host"][i], batch["base_host"][i], batch["backref"][i],
                     batch["depth"][i]]
            self.store.put(hh, attrs)
            self.scores[hh] = score
            heapq.heappush(self.heap, (score, hh))
            # the filter mirrors `ever` exactly: one fingerprint per
            # distinct hash, or re-added (dropped-then-rediscovered)
            # URLs would consume cuckoo slots toward overflow
            if hh not in self.ever:
                self.ever.add(hh)
                self.filter.insert(hh.encode())
                added += 1
            self._delta.append(("u", hh, attrs[:6] + [score, attrs[6]]))
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

    def flush_candidates(self, now: float, rows_cap: int = 0) -> dict[str, Any]:
        """Apply the round's buffered candidates: fresh discoveries as
        ``score=0, nx`` (crawl.py:225), sitemap/hosts.txt rows as
        ``score=now`` replace (null.py:332).  nx first, replace second —
        the combined outcome is order-independent (tested).

        Returns ``{"added", "mutated", "rows"}``: ``added`` counts
        new-hash inserts, ``mutated`` EVERY delta-log append (inserts,
        re-inserts of dropped hashes, replace-mode score updates).
        With ``rows_cap > 0`` and ``mutated <= rows_cap``, ``rows``
        carries the applied upserts (full attrs + score, delta order) —
        the engine patches them into its speculative next-round pop
        instead of discarding it; ``rows=None`` signals "not requested
        or too many to ship" (the engine then re-pops exactly)."""
        d0 = len(self._delta)
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
        new_ops = self._delta[d0:]
        res: dict[str, Any] = {"added": added, "mutated": len(new_ops)}
        if rows_cap > 0 and len(new_ops) <= rows_cap:
            # flush only emits full-row "u" ops (nx insert / replace)
            rows: dict[str, list] = {"url_hash": []}
            rows.update({name: [] for name in _ATTRS})
            for _op, hh, row in new_ops:
                rows["url_hash"].append(hh)
                for name, val in zip(_ATTRS, row):
                    rows[name].append(val)
            res["rows"] = rows
        else:
            res["rows"] = None
        return res

    def set_scores(self, url_hashes: list[str], score: float) -> None:
        """Lease (score=now+ttl) or requeue (score=now) taken rows.
        Score-only delta op — O(pool) log bytes, no attr fetch."""
        for hh in url_hashes:
            if hh in self.scores:
                self.scores[hh] = score
                heapq.heappush(self.heap, (score, hh))
                self._delta.append(("s", hh, [score]))

    def drop(self, url_hashes: list[str]) -> int:
        """drop_requests (darc/db.py:370-417): remove rows; ``ever``
        keeps the hash."""
        n = 0
        for hh in url_hashes:
            if self.scores.pop(hh, None) is not None:
                self.store.delete(hh)
                self._delta.append(("d", hh, None))
                n += 1
        self._maybe_compact()
        return n

    def _maybe_compact(self) -> None:
        if self.store.n_spilled > max(4 * len(self.scores),
                                      2 * self.store.max_resident):
            self.store.compact(set(self.scores))

    # -- pop ---------------------------------------------------------------
    def pop_candidates(self, now: float, ttl: float, k: int) -> dict[str, list]:
        """Top-k eligible rows by (score, url_hash); does NOT lease —
        the driver merges shards, applies politeness, then leases.

        Lazy-heap pop: stale entries (superseded score, dropped row)
        are discarded as encountered; valid entries are re-pushed since
        popping is not leasing.  O(k log n + stale) per round."""
        # bound stale accumulation: rebuild when the heap is ≥4× live
        if len(self.heap) > max(4 * len(self.scores), 1024):
            self.heap = [(s, hh) for hh, s in self.scores.items()]
            heapq.heapify(self.heap)
        max_score = now - ttl
        collected: list[tuple[float, str]] = []
        taken: set[str] = set()
        while self.heap and len(collected) < k:
            s, hh = self.heap[0]
            if s > max_score:
                break
            heapq.heappop(self.heap)
            cur = self.scores.get(hh)
            if cur is None or cur != s or hh in taken:
                continue                       # stale or duplicate entry
            taken.add(hh)
            collected.append((s, hh))
        for e in collected:                    # still live (lease is separate)
            heapq.heappush(self.heap, e)
        out: dict[str, list] = {c: [] for c in
                                ("url_hash", "url", "proxy", "scheme", "host",
                                 "base_host", "backref", "score", "depth")}
        if not collected:
            return out
        attrs = self.store.get_many([hh for _, hh in collected])
        for s, hh in collected:
            a = attrs[hh]
            out["url_hash"].append(hh)
            out["url"].append(a[0])
            out["proxy"].append(a[1])
            out["scheme"].append(a[2])
            out["host"].append(a[3])
            out["base_host"].append(a[4])
            out["backref"].append(a[5])
            out["score"].append(s)
            out["depth"].append(a[6])
        return out

    # -- introspection -----------------------------------------------------
    def counts(self) -> dict[str, int]:
        return {"live": len(self.scores), "ever": len(self.ever),
                "filter_count": self.filter.count,
                "spilled": self.store.n_spilled, "runs": len(self.store.runs)}

    def eligible_count(self, now: float, ttl: float) -> int:
        max_score = now - ttl
        return sum(1 for s in self.scores.values() if s <= max_score)

    def min_score(self) -> float | None:
        return min(self.scores.values(), default=None)

    def seen_hashes(self) -> list[str]:
        return sorted(self.ever)

    def live_table(self) -> pa.Table:
        got = self.store.get_many(self.scores.keys())
        return self._table([("u", hh, self._full_row(hh, a))
                            for hh, a in got.items()])

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
        got = self.store.get_many(self.scores.keys())
        ops = [("u", hh, self._full_row(hh, a)) for hh, a in got.items()]
        ops += [("e", hh, None) for hh in self.ever if hh not in self.scores]
        return self._table(ops)

    def snapshot_to(self, path: str) -> int:
        from darc_ray.sources.table_io import write_table

        t = self.snapshot()
        write_table(t, path)
        return t.num_rows

    def restore(self, snapshot: pa.Table | None, deltas: list[pa.Table]) -> None:
        self.scores.clear()
        self.store.clear()
        self.ever.clear()
        self._delta = []
        self.filter = CuckooFilter(self.filter_capacity, seed=self.shard_id)
        tables = ([snapshot] if snapshot is not None else []) + list(deltas)
        for t in tables:
            cols = t.to_pydict()
            for i, op in enumerate(cols["op"]):
                hh = cols["url_hash"][i]
                if op == "u":
                    self.store.put(hh, [cols["url"][i], cols["proxy"][i],
                                        cols["scheme"][i], cols["host"][i],
                                        cols["base_host"][i], cols["backref"][i],
                                        cols["depth"][i]])
                    self.scores[hh] = cols["score"][i]
                    if hh not in self.ever:
                        self.ever.add(hh)
                        self.filter.insert(hh.encode())
                elif op == "s":
                    if hh in self.scores:
                        self.scores[hh] = cols["score"][i]
                elif op == "d":
                    self.scores.pop(hh, None)
                    self.store.delete(hh)
                elif op == "e":
                    if hh not in self.ever:
                        self.ever.add(hh)
                        self.filter.insert(hh.encode())
        self.heap = [(s, hh) for hh, s in self.scores.items()]
        heapq.heapify(self.heap)

    @staticmethod
    def _table(ops: list[tuple[str, str, list[Any] | None]]) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in DELTA_SCHEMA}
        for op, hh, row in ops:
            cols["op"].append(op)
            cols["url_hash"].append(hh)
            if row is None:
                row = ["", "", "", None, "", "", 0.0, 0]
            elif len(row) == 1:                # score-only ("s") op
                row = ["", "", "", None, "", "", row[0], 0]
            for name, val in zip(_ATTRS, row):
                cols[name].append(val)
        return pa.Table.from_pydict(cols, schema=DELTA_SCHEMA)
