"""The crawl round loop — darc's worker loop re-expressed Ray-Data-first.

Reference lifecycle (``/root/reference/darc/process.py:78-121``): an
infinite round loop of ``load_requests()`` (lease ≤ MAX_POOL oldest
eligible links) → ``crawler(link)`` each → repeat.  Here one round is::

    pop (per-shard top-k, merged, (score, url_hash) order)     S2/O1/O2
      → politeness allowance (host-state shards)               St1 + north rule
      → lease taken rows (score = now + ttl)                   db.py:938-941
      → new-host bootstrap (robots/sitemap/hosts.txt)          crawl.py:140-166
      → fetch/route (Fetcher actor pool, map_batches)          F1
      → candidate parse → groupby(url_hash) first-wins         M1 + J2/A1
      → frontier upserts (score=0 nx / now replace)            S3
      → requeues / drops                                       crawl.py:184-249
      → round commit: pages/artifacts/render/pop parquet,
        per-shard frontier deltas, host snapshots, manifest    north rule

Clock: logical by default (``now = ttl + round·tick``) so runs are
deterministic and oracle-comparable; the reference uses wall time for
the same arithmetic (``darc/db.py:918-977``).

Scale notes (10^10 design point): every per-round collection on the
driver is bounded by the lease budget (``max_pool × workers``) — the
same bound the reference's in-memory link pool has; the frontier
itself lives sharded in actors and on disk (deltas + snapshots), never
materialized on the driver.  Fetch, extraction, parsing and enqueue
run as streaming ``map_batches`` stages.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from collections import Counter

import numpy as np
import pyarrow as pa

from darc_ray.config import CrawlConfig
from darc_ray.functions.filters import candidate_keep_mask
from darc_ray.functions.hashing import (group_indices, host_shard_of, sha256_hex,
                                        shard_of)
from darc_ray.functions.link import parse_batch
from darc_ray.sources.table_io import read_table, write_table
from darc_ray.stages.fetch import CorpusFetchFn, FetchProcessStage, fetch_process_batch
from darc_ray.stages.parse import parse_candidates
from darc_ray.state.frontier import FrontierShard
from darc_ray.state.host_state import HostShard

POOL_COLS = ("url_hash", "url", "proxy", "scheme", "host", "base_host",
             "backref", "score", "depth")


def _pool_rows(pool: dict[str, list]) -> list[dict]:
    """Column pool → row dicts for round hooks (the reference passes the
    round's Link pool, darc/process.py:100-111); budget-bounded."""
    n = len(pool.get("url", []))
    return [{c: pool[c][i] for c in POOL_COLS} for i in range(n)]


def _merge_pops(pops: list[dict[str, list]], budget: int) -> dict[str, list]:
    """Merge per-shard pops into the global top-budget pool in
    (score, url_hash) order.  Vectorized lexsort beats a pure-Python
    k-way heap merge here: one C sort + one reindex pass instead of
    per-row tuple traffic (measured).  The hash key sorts as ``S64``
    fixed-width bytes (hex is ASCII, so byte order == lexicographic
    order) and columns reindex via numpy fancy indexing — both C-level;
    the object-dtype variant cost ~0.13 s per 48k-row round (measured),
    pure driver serial time."""
    merged: dict[str, list] = {c: [] for c in POOL_COLS}
    for p in pops:
        for c in POOL_COLS:
            merged[c].extend(p[c])
    n = len(merged["url_hash"])
    if n:
        order = np.lexsort((np.array(merged["url_hash"], dtype="S64"),
                            np.array(merged["score"], dtype=np.float64)))
        order = order[:budget]
        merged = {c: np.asarray(merged[c], dtype=object)[order].tolist()
                  for c in POOL_COLS}
    return merged


class CrawlEngine:
    """Driver-side round loop owning the actor fleet.

    Does NOT call ``ray.init`` — the caller owns the session.
    """

    def __init__(self, corpus_path: str, out_dir: str, cfg: CrawlConfig | None = None):
        import ray

        self.cfg = cfg or CrawlConfig()
        self.corpus_path = corpus_path
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.fetch_fn = CorpusFetchFn.broadcast(corpus_path)
        FShard = ray.remote(FrontierShard)
        HShard = ray.remote(HostShard)
        resident = self.cfg.frontier_resident_rows
        self.frontier = [FShard.remote(s, max_resident_rows=resident)
                         for s in range(self.cfg.seen_shards)]
        self.hosts = [HShard.remote(h, self.fetch_fn) for h in range(self.cfg.host_shards)]
        # second-stage (render/selenium) queue: a full frontier with the
        # same score/lease semantics (darc/db.py:665-865)
        self.render_frontier = ([FShard.remote(1000 + s, max_resident_rows=resident)
                                 for s in range(self.cfg.seen_shards)]
                                if self.cfg.render_enabled else [])
        self.next_round = 0
        self.pop_log: list[tuple[int, str]] = []   # (round, url) crawl ordering
        self.render_pop_log: list[tuple[int, str]] = []
        # snapshot the module registries (SURVEY §2.10): hooks registered
        # on the driver before engine construction reach every worker —
        # cloudpickle ships the classes with the stage constructors
        from darc_ray import hooks as _hooks

        self.site_map = dict(_hooks.SITE_REGISTRY)
        self.proxy_map = dict(_hooks.PROXY_REGISTRY)
        self.round_hooks = list(_hooks.HOOK_REGISTRY)
        self._last_pool: dict[str, list] = {c: [] for c in POOL_COLS}
        self._last_render_pool: dict[str, list] = {c: [] for c in POOL_COLS}
        self._stop_requested = False
        # round-pipelining state: in-flight speculative pop for round
        # t+1 (fired against post-lease state, valid only if the rest
        # of round t mutates nothing) and the previous round's commit
        # futures (finished just before the next commit, or at
        # run()/shutdown())
        # (key, per-shard pop futures, requeue fixes, drop fixes, prev_now)
        self._spec: tuple[tuple, list, list, list, float] | None = None
        self._spec_valid = False
        self._pending_commit: tuple | None = None

    # ------------------------------------------------------------------
    def request_stop(self) -> None:
        """Graceful stop: the round loop exits after the current round
        (ref darc/process.py:114-115 signal-driven stop); checkpoints
        are already committed per round, so :meth:`resume` continues
        exactly.  Also set process-wide by ``hooks.register_signal``'s
        default handler."""
        self._stop_requested = True

    # ------------------------------------------------------------------
    def shutdown(self) -> None:
        """Terminate the actor fleet (bench/CLI hygiene; tests rely on
        handle GC)."""
        import ray

        self._finish_pending_commit()
        for a in self.frontier + self.hosts + self.render_frontier:
            ray.kill(a, no_restart=True)
        self.frontier = []
        self.hosts = []
        self.render_frontier = []

    # ------------------------------------------------------------------
    def now_at(self, t: int) -> float:
        """Logical round clock (deterministic, oracle-comparable); with
        ``logical_clock=False`` the reference's wall-clock arithmetic
        (darc/db.py:918-977) applies instead."""
        if not self.cfg.logical_clock:
            import time

            return time.time()
        return self.cfg.time_cache + t * self.cfg.tick

    def seed(self, urls: list[str]) -> int:
        """Seed links enqueue with score=0, nx (darc/__main__.py:160-161)."""
        import ray

        self._spec_valid = False           # out-of-round frontier mutation
        cols = parse_batch(urls)
        hashes = sha256_hex(urls)
        shards = shard_of(hashes, self.cfg.seen_shards)
        futures = []
        for s, idx in enumerate(group_indices(shards, self.cfg.seen_shards)):
            if not len(idx):
                continue
            sub = {
                "url": [urls[i] for i in idx],
                "url_hash": [hashes[i] for i in idx],
                "proxy": [cols["proxy"][i] for i in idx],
                "scheme": [cols["scheme"][i] for i in idx],
                "host": [cols["host"][i] for i in idx],
                "base_host": [cols["base_host"][i] for i in idx],
                "backref": ["" for _ in idx],
                "depth": [0 for _ in idx],
            }
            futures.append(self.frontier[s].upsert.remote(sub, 0.0, True))
        return sum(ray.get(futures))

    # ------------------------------------------------------------------
    def run(self, max_rounds: int, stop_on_idle: bool = False,
            hooks: list | None = None) -> dict[str, Any]:
        """Round loop with between-round hooks (ref darc/process.py:
        78-121): each round, registered + per-call hooks fire as
        ``fn("crawler", pool)`` (and ``fn("loader", render_pool)`` when
        the dual queue runs); WorkerBreak stops after the round, as do
        :meth:`request_stop` and the hooks-module stop event (signal
        handlers installed via ``register_signal``)."""
        from darc_ray.hooks import run_hooks, stop_requested

        all_hooks = self.round_hooks + list(hooks or [])
        totals: dict[str, float] = {}
        idle = 0
        start = self.next_round
        t = self.next_round
        end = self.next_round + max_rounds
        while t < end:
            m = self.run_round(t)
            for k, v in m.items():
                totals[k] = totals.get(k, 0) + v
            t += 1
            if all_hooks:
                brk = run_hooks(all_hooks, "crawler", _pool_rows(self._last_pool))
                if self.render_frontier:
                    brk |= run_hooks(all_hooks, "loader",
                                     _pool_rows(self._last_render_pool))
                if brk:
                    break
            if self._stop_requested or stop_requested():
                break
            if stop_on_idle:
                idle = idle + 1 if m["taken"] == 0 else 0
                if idle >= 2:
                    break
        self.next_round = t
        totals["rounds"] = t - start       # rounds executed in THIS call
        self._finish_pending_commit()      # all manifests durable on return
        return totals

    # ------------------------------------------------------------------
    def run_round(self, t: int) -> dict[str, int]:
        import time as _time

        import ray
        import ray.data as rd

        _t0 = _time.perf_counter()

        def _mark(metrics, key):
            nonlocal _t0
            now_t = _time.perf_counter()
            metrics[key] = round(metrics.get(key, 0.0) + (now_t - _t0), 4)
            _t0 = now_t

        cfg = self.cfg
        now = self.now_at(t)
        ttl = cfg.time_cache
        budget = cfg.max_pool * cfg.workers
        metrics: dict[str, int] = {k: 0 for k in (
            "popped", "taken", "deferred", "pages", "candidates", "enqueued",
            "requeued", "dropped", "artifacts", "robots_blocked", "render",
            "new_hosts", "boot_candidates", "boot_partial", "skipped")}

        round_dir = os.path.join(self.out_dir, "rounds", f"r{t:05d}")
        if os.path.exists(round_dir):
            shutil.rmtree(round_dir)       # leftover from a crashed round
        os.makedirs(round_dir, exist_ok=True)

        # ---- 1. pop: per-shard top-k, merge, global (score, url_hash) order.
        # A valid speculative pop (fired mid-round t-1 against post-lease
        # state — see step 4b) is the same RPC result, already computed
        # while the fetch stage ran.  The mutations round t-1 made AFTER
        # the speculation are exactly known, so they are applied as
        # driver-side corrections instead of discarding the pop: flush
        # upserts are patched/appended from the rows the shards shipped
        # back, requeued hashes get score=now_{t-1}, dropped hashes are
        # removed, then rows re-filter against this round's eligibility
        # horizon.  Any correction the driver cannot prove exact (a
        # budget-truncated shard pop losing or up-scoring an original
        # row, an over-cap flush, a CHECK-rewritten requeue) falls back
        # to a fresh pop — see _correct_spec_pops for the proofs.
        pops = None
        if self._spec is not None:
            spec_key, spec_futures, flush_fix, req_fix, drop_fix, prev_now = self._spec
            self._spec = None
            if self._spec_valid and spec_key == (t, now, ttl, budget):
                cand = ray.get(spec_futures)
                pops = self._correct_spec_pops(cand, flush_fix, req_fix,
                                               drop_fix, prev_now, now, ttl,
                                               budget)
                if pops is not None:
                    metrics["spec_pop"] = 1
        if pops is None:
            pops = ray.get([s.pop_candidates.remote(now, ttl, budget)
                            for s in self.frontier])
        merged = _merge_pops(pops, budget)
        n_pop = len(merged["url_hash"])
        metrics["popped"] = n_pop
        _mark(metrics, "t_pop")

        # ---- 2. politeness allowance (fetchable rows only), in pop
        # order — vectorized: per-host first-k selection is a grouped
        # cumcount against the allowance (cumcount follows pop order,
        # preserving the reference's first-come-per-host semantics)
        taken_idx: list[int] = []
        if n_pop:
            import pandas as _pd

            scheme = _pd.Series(merged["scheme"])
            hosts = _pd.Series(merged["host"]).fillna("")
            fetchable = scheme.isin(("http", "https")).to_numpy()
            fh = hosts[fetchable]
            wants = fh.value_counts().to_dict()
            allowed = self._take_allowance(wants, now)
            cc = fh.groupby(fh).cumcount().to_numpy()
            cap = fh.map(allowed).fillna(0).to_numpy()
            take_mask = np.zeros(n_pop, dtype=bool)
            take_mask[~fetchable] = True            # non-http rows always pass
            take_mask[fh.index.to_numpy()[cc < cap]] = True
            taken_idx = np.nonzero(take_mask)[0]
        pool = {c: np.asarray(merged[c], dtype=object)[taken_idx].tolist()
                for c in POOL_COLS} if n_pop else {c: [] for c in POOL_COLS}
        n_taken = len(taken_idx)
        metrics["taken"] = n_taken
        metrics["deferred"] = n_pop - n_taken
        self.pop_log.extend((t, u) for u in pool["url"])
        pool_pop = pool           # pre-CHECK pool = the crawl-ordering artifact
        self._last_pool = pool
        _mark(metrics, "t_politeness")

        boot_cand: pa.Table | None = None
        if n_taken:
            # ---- 3. lease taken rows (score = now + ttl, db.py:938-941)
            self._scatter_scores(pool["url_hash"], now + ttl)

            _mark(metrics, "t_lease")

            # ---- 3b. CHECK-time candidate filter (load_requests(check=True),
            # db.py:897-898): filtered rows stay leased, uncrawled.
            # CHECK_NG replaces it with host/proxy + HEAD-probed mime
            # filtering (darc/parse.py:186-241, _check_ng).
            pool = self._check_pool(pool, n_taken, now, ttl, self.frontier)
            n_taken = len(pool["url_hash"])

            # ---- 4. new-host bootstrap (crawl.py:140-166), before any fetch
            boot_cand, n_new, n_partial = self._bootstrap_hosts(pool, now)
            metrics["new_hosts"] = n_new
            metrics["boot_partial"] = n_partial
            if boot_cand is not None:
                metrics["boot_candidates"] = boot_cand.num_rows
        _mark(metrics, "t_bootstrap")

        # ---- 4b. speculative pop for round t+1, overlapped with the
        # fetch stage: every score mutation of round t so far (lease,
        # CHECK rewrites) has been issued, and actor mailbox ordering
        # makes the pop observe exactly that state.  pop_candidates is
        # read-only, so a wasted speculation costs nothing; step 7
        # invalidates it if the round's tail mutates any frontier state
        # (candidate inserts/replacements, requeues, drops).  The
        # render/dual-queue lifecycle mutates the requests frontier
        # after step 7, so speculation is gated off there.
        if cfg.overlap_rounds and not self.render_frontier:
            now_next = self.now_at(t + 1)
            self._spec = ((t + 1, now_next, ttl, budget),
                          [s.pop_candidates.remote(now_next, ttl, budget)
                           for s in self.frontier],
                          None, [], [], now)   # fixes filled in at step 7
            self._spec_valid = True

        req_hashes: list[str] = []
        drop_hashes: list[str] = []
        if n_taken:
            # ---- 5. fused fetch/route/write/buffer stage: ONE Dataset
            # execution per round; bodies go straight to parquet part
            # files and candidates to shard buffers -- only a tiny
            # (kind, url_hash) summary reaches the driver.
            pool_table = pa.Table.from_pydict(
                {**pool,
                 "round": [t] * n_taken,
                 "now": [now] * n_taken})
            # Ray task dispatch is ~10 ms serial per task: target
            # 3×concurrency tasks (≥32 rows each) so per-task work
            # amortizes dispatch, workers stay busy, and the stage tail
            # stays short; split blocks zero-copy (no repartition pass).
            n_blocks = max(1, min(cfg.fetch_concurrency * 3,
                                  (n_taken + 31) // 32))
            step = (n_taken + n_blocks - 1) // n_blocks
            ds = rd.from_arrow([pool_table.slice(i, step)
                                for i in range(0, n_taken, step)])
            # one block = one batch = one task (batch_size > block rows
            # would silently bundle blocks and shrink parallelism)
            batch_size = min(cfg.fetch_batch_size, step)
            if cfg.fetch_use_actors:
                stage = ds.map_batches(
                    FetchProcessStage,
                    fn_constructor_args=(cfg, self.fetch_fn, self.hosts, self.frontier,
                                         cfg.seen_shards, round_dir,
                                         self.render_frontier or None,
                                         self.site_map, self.proxy_map),
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    concurrency=min(cfg.fetch_concurrency, n_blocks),
                    num_cpus=1,
                )
            else:
                from functools import partial

                stage = ds.map_batches(
                    partial(fetch_process_batch, cfg=cfg, fetch_fn=self.fetch_fn,
                            host_shards=self.hosts, frontier_shards=self.frontier,
                            num_shards=cfg.seen_shards, round_dir=round_dir,
                            render_shards=self.render_frontier or None,
                            site_map=self.site_map, proxy_map=self.proxy_map),
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    # cap in-flight tasks below the core count so the
                    # shard actors serving robots/buffer RPCs never
                    # starve behind the fetch tasks
                    concurrency=cfg.fetch_concurrency,
                    num_cpus=1,
                )
            # O(pool) summary: count rows per kind + detail rows only for
            # requeue/drop/artifact (see stages.fetch.summarize_events)
            summary = stage.take_all()

            kc: Counter = Counter()
            drop_set: set[str] = set()
            for r in summary:
                kc[r["kind"]] += r["n"]
                if r["kind"] == "requeue":
                    req_hashes.append(r["url_hash"])
                elif r["kind"] in ("drop", "artifact"):
                    drop_set.add(r["url_hash"])
            metrics["pages"] = kc.get("page", 0)
            metrics["artifacts"] = kc.get("artifact", 0)
            metrics["render"] = kc.get("render", 0)
            metrics["robots_blocked"] = kc.get("robots_blocked", 0)
            metrics["candidates"] = kc.get("candidate", 0)
            metrics["skipped"] = kc.get("skipped", 0)   # LinkNoReturn(drop=False)
            drop_hashes = sorted(drop_set)
        _mark(metrics, "t_fetch")

        # ---- 6. bootstrap candidates join the same shard buffers
        if boot_cand is not None and boot_cand.num_rows:
            cols = boot_cand.to_pydict()
            sid = np.asarray(cols["shard"])
            futures = []
            for s, idx in enumerate(group_indices(sid, cfg.seen_shards)):
                if not len(idx):
                    continue
                sub = {c: [cols[c][i] for i in idx]
                       for c in ("url_hash", "url", "proxy", "scheme", "host",
                                 "base_host", "backref", "depth", "mode")}
                futures.append(self.frontier[s].buffer_candidates.remote(sub))
            ray.get(futures)

        # ---- 7. round-end frontier effects, deterministic order:
        # candidate flush (nx then replace) -> requeues -> drops.
        # When a speculative pop is in flight, each shard ships back its
        # applied flush rows (capped at budget) so the driver can patch
        # them in; requeues/drops are recorded as per-hash corrections.
        spec_live = self._spec is not None and self._spec_valid
        rows_cap = budget if spec_live else 0
        flush_res = ray.get([s.flush_candidates.remote(now, rows_cap)
                             for s in self.frontier])
        metrics["enqueued"] = sum(r["added"] for r in flush_res)
        if self.render_frontier:
            metrics["promoted"] = sum(r["added"] for r in ray.get(
                [s.flush_candidates.remote(now) for s in self.render_frontier]))
        if req_hashes:
            self._scatter_scores(req_hashes, now)
        metrics["requeued"] = len(req_hashes)
        if drop_hashes:
            self._scatter_drops(drop_hashes)
        metrics["dropped"] = len(drop_hashes)
        if spec_live:
            flush_fix = [r["rows"] for r in flush_res]
            if any(r is None for r in flush_fix):
                self._spec_valid = False   # over-cap flush: re-pop at t+1
            else:
                key, spec_futures, _, _, _, prev_now = self._spec
                self._spec = (key, spec_futures, flush_fix,
                              list(req_hashes), list(drop_hashes), prev_now)
        _mark(metrics, "t_flush")

        # ---- 8b. render phase (loader worker, crawl.py:254-354): runs
        # after the crawl phase within the round; extracted links join
        # the requests frontier before the round commits
        if self.render_frontier:
            rmetrics = self._render_phase(t, now, round_dir)
            for k, v in rmetrics.items():
                metrics[f"render_{k}"] = v
            # ---- 8c. speculative pop for round t+1 on render runs:
            # the requests frontier saw its LAST round-t mutation in
            # the render phase's flush just above, so a pop issued here
            # observes exactly the state round t+1 will pop — no
            # corrections needed (empty fixes short-circuit
            # _correct_spec_pops).  The RPCs overlap steps 9-10 and
            # the inter-round driver work; _commit's drains/snapshots
            # are read-only w.r.t. pop-visible score state.
            if cfg.overlap_rounds:
                now_next = self.now_at(t + 1)
                self._spec = ((t + 1, now_next, ttl, budget),
                              [s.pop_candidates.remote(now_next, ttl, budget)
                               for s in self.frontier],
                              [{"url_hash": []} for _ in self.frontier],
                              [], [], now)
                self._spec_valid = True
        _mark(metrics, "t_render")

        # ---- 9. pop-ordering artifact for this round (pre-CHECK pool,
        # matching load_requests' leased pool)
        if pool_pop["url_hash"]:
            write_table(pa.Table.from_pydict({
                "order": list(range(len(pool_pop["url_hash"]))),
                "url_hash": pool_pop["url_hash"],
                "url": pool_pop["url"],
                "score": pool_pop["score"],
            }), os.path.join(round_dir, "pop"))

        # ---- 10. commit: deltas, host snapshots, manifest
        self._commit(t, now, round_dir, metrics)
        _mark(metrics, "t_commit")
        return metrics

    # ------------------------------------------------------------------
    def _render_phase(self, t: int, now: float, round_dir: str) -> dict[str, int]:
        """One loader round over the render frontier (same lease
        arithmetic; no politeness and no robots, matching the
        reference's loader, crawl.py:254-354)."""
        import ray
        import ray.data as rd

        from darc_ray.stages.render import RenderProcessStage, render_process_batch

        cfg = self.cfg
        ttl = cfg.time_cache
        budget = cfg.max_pool * cfg.workers
        metrics = {"popped": 0, "taken": 0, "rendered": 0, "requeued": 0,
                   "dropped": 0, "enqueued": 0}

        pops = ray.get([s.pop_candidates.remote(now, ttl, budget)
                        for s in self.render_frontier])
        merged = _merge_pops(pops, budget)
        n = len(merged["url_hash"])
        metrics["popped"] = metrics["taken"] = n
        self.render_pop_log.extend((t, u) for u in merged["url"])
        self._last_render_pool = merged
        if not n:
            return metrics

        self._scatter_scores_on(self.render_frontier, merged["url_hash"], now + ttl)

        # load_selenium(check=CHECK) dispatches through _check →
        # _check_ng when CHECK_NG is set (db.py:1060, parse.py:244-273),
        # so the render pool gets the same host/proxy + HEAD-mime
        # filtering (and redirect rewrite) as the crawl pool.
        pool = self._check_pool(merged, n, now, ttl, self.render_frontier)
        n = len(pool["url_hash"])
        if not n:
            return metrics

        pool_table = pa.Table.from_pydict(
            {**pool, "round": [t] * n, "now": [now] * n})
        n_blocks = max(1, min(cfg.fetch_concurrency * 3, (n + 31) // 32))
        step = (n + n_blocks - 1) // n_blocks
        ds = rd.from_arrow([pool_table.slice(i, step) for i in range(0, n, step)])
        batch_size = min(cfg.fetch_batch_size, step)
        if cfg.fetch_use_actors:
            # actor-pool flavor (live-browser deployments): _drivers
            # survives the whole round in each actor — the seam where a
            # real Chrome driver plugs in without per-batch relaunch
            stage = ds.map_batches(
                RenderProcessStage,
                fn_constructor_args=(cfg, self.fetch_fn, self.frontier,
                                     cfg.seen_shards, round_dir,
                                     self.site_map, self.proxy_map),
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=min(cfg.fetch_concurrency, n_blocks), num_cpus=1)
        else:
            # stateless tasks on warm workers; per-proxy drivers persist
            # in the worker-global proxy-state cache across batches
            from functools import partial as _partial

            stage = ds.map_batches(
                _partial(render_process_batch, cfg=cfg, fetch_fn=self.fetch_fn,
                         requests_shards=self.frontier, num_shards=cfg.seen_shards,
                         round_dir=round_dir, site_map=self.site_map,
                         proxy_map=self.proxy_map),
                batch_format="pyarrow", batch_size=batch_size,
                concurrency=cfg.fetch_concurrency, num_cpus=1)
        summary = stage.take_all()

        kc = Counter(r["kind"] for r in summary)
        metrics["rendered"] = kc.get("rendered", 0)
        req = [r["url_hash"] for r in summary if r["kind"] == "requeue"]
        drops = sorted({r["url_hash"] for r in summary if r["kind"] == "drop"})

        # render-extracted links -> requests frontier (score=0 nx, crawl.py:349)
        metrics["enqueued"] = sum(r["added"] for r in ray.get(
            [s.flush_candidates.remote(now) for s in self.frontier]))
        if req:
            self._scatter_scores_on(self.render_frontier, req, now)
        metrics["requeued"] = len(req)
        if drops:
            sid = shard_of(drops, cfg.seen_shards)
            arr = np.asarray(drops, dtype=object)
            futures = []
            for s, idx in enumerate(group_indices(sid, cfg.seen_shards)):
                if len(idx):
                    futures.append(self.render_frontier[s].drop.remote(arr[idx].tolist()))
            ray.get(futures)
        metrics["dropped"] = len(drops)
        return metrics

    def _probe_mime(self, hosts: list[str], urls: list[str]
                    ) -> list[tuple[int, str, str]]:
        """Batched HEAD probes via the host shards (keeps the fetch
        fabric off the driver); returns (status, mime, final_url)."""
        import ray

        sid = host_shard_of(hosts, len(self.hosts))
        result: list[tuple[int, str, str]] = [(0, "", u) for u in urls]
        futures, order = [], []
        for s in range(len(self.hosts)):
            idx = [i for i, v in enumerate(sid) if v == s]
            if not idx:
                continue
            futures.append(self.hosts[s].probe_mime.remote([urls[i] for i in idx]))
            order.append(idx)
        for idx, got in zip(order, ray.get(futures)):
            for i, val in zip(idx, got):
                result[i] = tuple(val)
        return result

    def _check_pool(self, pool: dict[str, list], n: int, now: float, ttl: float,
                    shards: list) -> dict[str, list]:
        """The CHECK-time pool filter shared by the crawl and render
        queues (load_requests/load_selenium(check=CHECK) → _check →
        _check_ng, ref darc/db.py:897-898, :1060, darc/parse.py:
        244-273): plain CHECK = host/proxy masks; CHECK_NG = masks +
        HEAD-probed mime filter (+ optional redirect rewrite against
        ``shards``).  Filtered rows stay leased, uncrawled."""
        cfg = self.cfg
        if cfg.check_ng:
            keep = candidate_keep_mask(pool["host"], pool["proxy"], cfg)
            # non-http(s) schemes: requests' HEAD raises without a
            # response (parse.py:224-230) → filtered like a failure
            idxs = [i for i in range(n)
                    if keep[i] and pool["scheme"][i] in ("http", "https")]
            probes = self._probe_mime([pool["host"][i] for i in idxs],
                                      [pool["url"][i] for i in idxs])
            from darc_ray.functions.filters import keep_mime_mask

            final = []
            rewrite_map: dict[int, str] = {}
            for j, i in enumerate(idxs):
                status, mime, final_url = probes[j]
                if status == 0:                  # HEAD failed, no response
                    continue
                if not keep_mime_mask([mime], cfg)[0]:
                    continue
                if cfg.check_ng_rewrite and final_url != pool["url"][i]:
                    rewrite_map[i] = final_url
                final.append(i)
            if rewrite_map:
                return self._apply_rewrites(pool, final, rewrite_map,
                                            now + ttl, shards)
            return {c: [pool[c][i] for i in final] for c in POOL_COLS}
        if cfg.check:
            keep = candidate_keep_mask(pool["host"], pool["proxy"], cfg)
            return {c: [pool[c][i] for i in range(n) if keep[i]]
                    for c in POOL_COLS}
        return pool

    def _apply_rewrites(self, pool: dict[str, list], final: list[int],
                        rewrite_map: dict[int, str], lease_score: float,
                        shards: list) -> dict[str, list]:
        """CHECK_NG redirect rewrite (ref darc/parse.py:236-241): the
        probed candidate is replaced by the probe's final URL
        (``parse_link(response.request.url)``).  Queue accounting (the
        part the reference leaves implicit): the OLD hash is dropped
        from the frontier and the final URL is enqueued leased
        (score=now+ttl), so the frontier tracks what is actually being
        crawled.  Pool rows deduplicate by new hash, first (pop-order)
        wins.  Returns the filtered+rewritten pool."""
        import ray

        pool = {c: [pool[c][i] for i in final] for c in POOL_COLS}
        pos = [p for p, i in enumerate(final) if i in rewrite_map]
        new_urls = [rewrite_map[final[p]] for p in pos]
        cols = parse_batch(new_urls)
        hashes = sha256_hex(new_urls)
        old_hashes = sorted({pool["url_hash"][p] for p in pos})
        for k, p in enumerate(pos):
            pool["url"][p] = new_urls[k]
            pool["url_hash"][p] = hashes[k]
            pool["proxy"][p] = cols["proxy"][k]
            pool["scheme"][p] = cols["scheme"][k]
            pool["host"][p] = cols["host"][k]
            pool["base_host"][p] = cols["base_host"][k]
            # backref / depth / score inherited from the original row
        # dedupe (a rewrite target may collide with another pool row)
        seen: set[str] = set()
        keep_rows = []
        for p in range(len(pool["url_hash"])):
            hh = pool["url_hash"][p]
            if hh not in seen:
                seen.add(hh)
                keep_rows.append(p)
        if len(keep_rows) != len(pool["url_hash"]):
            pool = {c: [pool[c][p] for p in keep_rows] for c in POOL_COLS}
        # frontier accounting: drop old hashes, enqueue finals leased
        sid = shard_of(old_hashes, len(shards))
        futures = []
        for s, idx in enumerate(group_indices(sid, len(shards))):
            if len(idx):
                futures.append(shards[s].drop.remote(
                    [old_hashes[i] for i in idx]))
        by_hash = {pool["url_hash"][p]: p for p in range(len(pool["url_hash"]))}
        sub = {"url_hash": hashes, "url": new_urls,
               "proxy": list(cols["proxy"]), "scheme": list(cols["scheme"]),
               "host": list(cols["host"]), "base_host": list(cols["base_host"]),
               "backref": [pool["backref"][by_hash[h]] if h in by_hash else ""
                           for h in hashes],
               "depth": [pool["depth"][by_hash[h]] if h in by_hash else 0
                         for h in hashes]}
        nsid = shard_of(hashes, len(shards))
        for s, idx in enumerate(group_indices(nsid, len(shards))):
            if len(idx):
                futures.append(shards[s].upsert.remote(
                    {c: [sub[c][i] for i in idx] for c in
                     ("url_hash", "url", "proxy", "scheme", "host",
                      "base_host", "backref", "depth")},
                    lease_score, False))
        ray.get(futures)
        return pool

    def _scatter_scores_on(self, shards: list, hashes: list[str], score: float) -> None:
        import ray

        sid = shard_of(hashes, len(shards))
        arr = np.asarray(hashes, dtype=object)
        futures = []
        for s, idx in enumerate(group_indices(sid, len(shards))):
            if len(idx):
                futures.append(shards[s].set_scores.remote(arr[idx].tolist(), score))
        ray.get(futures)

    # ------------------------------------------------------------------
    def _take_allowance(self, wants: dict[str, int], now: float) -> dict[str, int]:
        import ray

        if not wants:
            return {}
        hosts = sorted(wants)
        sid = host_shard_of(hosts, len(self.hosts))
        futures, order = [], []
        for s in range(len(self.hosts)):
            hs = [h for i, h in enumerate(hosts) if sid[i] == s]
            if not hs:
                continue
            futures.append(self.hosts[s].take_allowance.remote(
                hs, [wants[h] for h in hs], now, self.cfg.per_host_cap))
            order.append(hs)
        out: dict[str, int] = {}
        for hs, got in zip(order, ray.get(futures)):
            out.update(zip(hs, got))
        return out

    def _bootstrap_hosts(self, pool: dict[str, list], now: float
                         ) -> tuple[pa.Table | None, int, int]:
        """have_hostname + new-host robots/sitemap/hosts.txt for the
        round's fetchable hosts; returns (candidate rows (now_replace),
        new-host count, partial-failure count — partial hostnames are
        dropped shard-side for retry, ref darc/crawl.py:158-166)."""
        import ray

        reps: dict[str, tuple[str, str, int]] = {}   # host → (proxy, rep url, rep depth)
        for i in range(len(pool["url"])):
            if pool["scheme"][i] in ("http", "https"):
                h = pool["host"][i] or ""
                if h and h not in reps:
                    reps[h] = (pool["proxy"][i], pool["url"][i], int(pool["depth"][i]))
        if not reps:
            return None, 0, 0
        hosts = sorted(reps)
        sid = host_shard_of(hosts, len(self.hosts))
        futures, order = [], []
        for s in range(len(self.hosts)):
            hs = [h for i, h in enumerate(hosts) if sid[i] == s]
            if not hs:
                continue
            futures.append(self.hosts[s].have_hostnames.remote(
                hs, [reps[h][0] for h in hs], now,
                self.cfg.host_ttl if self.cfg.host_ttl is not None else self.cfg.time_cache))
            order.append((s, hs))
        boot_by_shard: dict[int, list[str]] = {}
        n_new = 0
        for (s, hs), (have, force) in zip(order, ray.get(futures)):
            fresh = [h for h, hv, fc in zip(hs, have, force) if (not hv) or fc]
            n_new += len(fresh)
            if fresh:
                boot_by_shard[s] = fresh
        if not boot_by_shard:
            return None, 0, 0
        futures = [self.hosts[s].bootstrap_hosts.remote(
            hs, [reps[h][0] for h in hs], [reps[h][1] for h in hs], now)
            for s, hs in sorted(boot_by_shard.items())]
        urls: list[str] = []
        backrefs: list[str] = []
        depths: list[int] = []
        n_partial = 0
        for (s, hs), got in zip(sorted(boot_by_shard.items()), ray.get(futures)):
            rep_depth = {reps[h][1]: reps[h][2] for h in hs}
            n_partial += len(got.get("partial", []))
            for u, b in zip(got["url"], got["backref"]):
                urls.append(u)
                backrefs.append(b)
                depths.append(rep_depth.get(b, 0) + 1)
        if not urls:
            return None, n_new, n_partial
        ev_like = pa.Table.from_pydict({
            "cand_url": urls, "cand_backref": backrefs, "cand_depth": depths,
            "cand_mode": ["now_replace"] * len(urls)})
        return (parse_candidates(ev_like, self.cfg.num_partitions,
                                 self.cfg.seen_shards), n_new, n_partial)

    def _scatter_scores(self, hashes: list[str], score: float) -> None:
        """Fire-and-forget: actor mailbox order guarantees every later
        driver message to the same shard (spec pop, flush, drain)
        observes the score writes, and the round's flush ``ray.get``
        doubles as the per-shard barrier — so the driver never blocks
        on lease/requeue round-trips (~0.1 s/round of pure serial wait
        at 16 shards, measured).  ``set_scores`` is a pure dict update;
        a dropped ObjectRef does not cancel an actor task."""
        sid = shard_of(hashes, self.cfg.seen_shards)
        arr = np.asarray(hashes, dtype=object)
        for s, idx in enumerate(group_indices(sid, self.cfg.seen_shards)):
            if len(idx):
                self.frontier[s].set_scores.remote(arr[idx].tolist(), score)

    def _scatter_drops(self, hashes: list[str]) -> None:
        """Fire-and-forget, same ordering argument as _scatter_scores
        (the commit drain enqueued after this is the barrier)."""
        sid = shard_of(hashes, self.cfg.seen_shards)
        arr = np.asarray(hashes, dtype=object)
        for s, idx in enumerate(group_indices(sid, self.cfg.seen_shards)):
            if len(idx):
                self.frontier[s].drop.remote(arr[idx].tolist())

    def _correct_spec_pops(self, cand: list[dict[str, list]],
                           flush_fix: list[dict[str, list]] | None,
                           req_fix: list[str], drop_fix: list[str],
                           prev_now: float, now: float, ttl: float,
                           budget: int) -> list[dict[str, list]] | None:
        """Patch the speculative per-shard pops (computed mid-round t-1,
        before that round's flush/requeues/drops landed) into exactly
        what a fresh pop would return now, or ``None`` when exactness
        cannot be proven (caller falls back to a fresh pop).

        Let E be a shard's eligible set at speculation time and P its
        pop (the |P| = min(|E|, budget) smallest rows by (score, hash)).
        The corrections, applied in the round's own mutation order
        (flush upserts → requeues → drops → eligibility re-filter):

        * APPENDING a row (flush insert, re-insert of a dropped hash,
          eligible requeue missing from P) only moves the per-shard
          cutoff down, so rows outside P stay outside: top(P ∪ adds) is
          exact even when P was truncated.
        * LOWERING a score of a row in P (requeue: leased prev_now+ttl
          → prev_now) keeps the top set unchanged — every excluded row
          still sorts at/after P's non-increasing maximum.
        * REMOVING or RAISING an original row of a TRUNCATED P (drop,
          replace-mode score bump, re-filter) can admit the unseen
          (k+1)-th row → ``None``.  On an untruncated P (|P| = |E|)
          the same edits are exact — there is nothing unseen.
        * A requeued hash absent from P while eligible re-enters from
          the round's own pool attrs; if the pool no longer carries it
          (CHECK rewrite renamed the hash) → ``None``.

        Per-shard output order is irrelevant — the global
        (score, url_hash) merge + budget cap in :func:`_merge_pops`
        runs downstream, identical to the fresh-pop path."""
        if flush_fix is None:
            return None
        if not req_fix and not drop_fix and not any(
                f["url_hash"] for f in flush_fix):
            return cand
        S = self.cfg.seen_shards
        req_by: dict[int, list[str]] = {}
        for hh, s in zip(req_fix, shard_of(req_fix, S)):
            req_by.setdefault(int(s), []).append(hh)
        drop_by: dict[int, list[str]] = {}
        for hh, s in zip(drop_fix, shard_of(drop_fix, S)):
            drop_by.setdefault(int(s), []).append(hh)
        max_score = now - ttl
        req_eligible = prev_now <= max_score
        pool_pos: dict[str, int] | None = None     # round-t pool, lazy
        out: list[dict[str, list]] = []
        for s, p in enumerate(cand):
            fl = flush_fix[s]
            reqs = req_by.get(s, [])
            drops = drop_by.get(s, [])
            n_fl = len(fl["url_hash"])
            if not n_fl and not reqs and not drops:
                out.append(p)
                continue
            q = {c: list(p[c]) for c in POOL_COLS}
            pos = {hh: i for i, hh in enumerate(q["url_hash"])}
            orig_len = len(p["url_hash"])
            truncated = orig_len >= budget
            # 1) flush upserts, in delta order (later op wins)
            for i in range(n_fl):
                hh = fl["url_hash"][i]
                j = pos.get(hh)
                if j is None:
                    pos[hh] = len(q["url_hash"])
                    for c in POOL_COLS:
                        q[c].append(fl[c][i])
                else:
                    if truncated and j < orig_len and fl["score"][i] > q["score"][j]:
                        return None    # raised original row of a full pop
                    for c in POOL_COLS:
                        if c != "url_hash":
                            q[c][j] = fl[c][i]
            # 2) requeues → score = prev_now (lease released)
            for hh in reqs:
                j = pos.get(hh)
                if j is not None:
                    q["score"][j] = prev_now
                elif req_eligible:
                    if pool_pos is None:
                        pool_pos = {h: i for i, h in
                                    enumerate(self._last_pool["url_hash"])}
                    pj = pool_pos.get(hh)
                    if pj is None:
                        return None    # CHECK-rewritten; attrs not at hand
                    pos[hh] = len(q["url_hash"])
                    for c in POOL_COLS:
                        q[c].append(prev_now if c == "score"
                                    else self._last_pool[c][pj])
            # 3) drops + 4) eligibility re-filter, one keep pass
            drop_idx = {pos[hh] for hh in drops if hh in pos}
            keep = [i for i in range(len(q["url_hash"]))
                    if i not in drop_idx and q["score"][i] <= max_score]
            removed = len(q["url_hash"]) - len(keep)
            if removed:
                if truncated and any(i in drop_idx or q["score"][i] > max_score
                                     for i in range(orig_len)):
                    return None        # original row left a full pop
                q = {c: [q[c][i] for i in keep] for c in POOL_COLS}
            out.append(q)
        return out

    # ------------------------------------------------------------------
    def _commit(self, t: int, now: float, round_dir: str, metrics: dict[str, int]) -> None:
        """Fire round ``t``'s checkpoint writes (actor-side delta
        drains + host snapshots) without blocking; the previous round's
        in-flight commit is finished first, so at most one commit is
        outstanding and its writes overlap the NEXT round's compute.
        The manifest is only written once the writes are durable
        (:meth:`_finish_pending_commit`), preserving resume semantics:
        a crash mid-commit re-runs the round, deterministically.
        Per-round delta attribution is safe because the drain RPCs are
        enqueued before any round-(t+1) actor message (mailbox order)."""
        self._finish_pending_commit()
        os.makedirs(os.path.join(round_dir, "frontier_delta"), exist_ok=True)
        os.makedirs(os.path.join(round_dir, "host_state"), exist_ok=True)
        futures = [s.drain_delta_to.remote(
            os.path.join(round_dir, "frontier_delta", f"shard_{i}"))
            for i, s in enumerate(self.frontier)]
        if self.render_frontier:
            os.makedirs(os.path.join(round_dir, "render_delta"), exist_ok=True)
            futures += [s.drain_delta_to.remote(
                os.path.join(round_dir, "render_delta", f"shard_{i}"))
                for i, s in enumerate(self.render_frontier)]
        futures += [h.snapshot_to.remote(
            os.path.join(round_dir, "host_state", f"shard_{i}"))
            for i, h in enumerate(self.hosts)]
        snapshot = (self.cfg.snapshot_every > 0
                    and t > 0 and t % self.cfg.snapshot_every == 0)
        if snapshot:
            os.makedirs(os.path.join(round_dir, "frontier_snapshot"), exist_ok=True)
            futures += [s.snapshot_to.remote(
                os.path.join(round_dir, "frontier_snapshot", f"shard_{i}"))
                for i, s in enumerate(self.frontier)]
            if self.render_frontier:
                os.makedirs(os.path.join(round_dir, "render_snapshot"), exist_ok=True)
                futures += [s.snapshot_to.remote(
                    os.path.join(round_dir, "render_snapshot", f"shard_{i}"))
                    for i, s in enumerate(self.render_frontier)]
        self._pending_commit = (futures, t, now, dict(metrics), snapshot)
        if not self.cfg.overlap_rounds:
            self._finish_pending_commit()

    def _finish_pending_commit(self) -> None:
        import ray

        if self._pending_commit is None:
            return
        futures, t, now, metrics, snapshot = self._pending_commit
        self._pending_commit = None
        ray.get(futures)
        manifest = {
            "round": t, "now": now, "metrics": metrics, "complete": True,
            "config_fp": self.cfg.fingerprint(), "snapshot": snapshot,
            "corpus_path": self.corpus_path,
            "lineage": {"input": f"rounds/r{t - 1:05d}" if t else "seed",
                        "shards": self.cfg.seen_shards},
        }
        tmp = os.path.join(self.out_dir, f".manifest_r{t:05d}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.out_dir, f"manifest_r{t:05d}.json"))

    # ------------------------------------------------------------------
    @classmethod
    def resume(cls, corpus_path: str, out_dir: str, cfg: CrawlConfig | None = None
               ) -> "CrawlEngine":
        """Rebuild actor state from the last complete round manifest:
        latest frontier snapshot + delta replay, host snapshots."""
        import ray

        eng = cls(corpus_path, out_dir, cfg)
        manifests = []
        for name in sorted(os.listdir(out_dir)):
            if name.startswith("manifest_r") and name.endswith(".json"):
                with open(os.path.join(out_dir, name)) as f:
                    m = json.load(f)
                if m.get("complete"):
                    manifests.append(m)
        if not manifests:
            return eng
        last = max(m["round"] for m in manifests)
        snap_rounds = [m["round"] for m in manifests if m.get("snapshot")
                       and m["round"] <= last]
        snap_at = max(snap_rounds) if snap_rounds else -1

        futures = []
        for s in range(eng.cfg.seen_shards):
            snap = None
            if snap_at >= 0:
                p = os.path.join(out_dir, "rounds", f"r{snap_at:05d}",
                                 "frontier_snapshot", f"shard_{s}")
                snap = read_table(p)
            deltas = []
            lo = snap_at + 1
            for r in range(lo, last + 1):
                p = os.path.join(out_dir, "rounds", f"r{r:05d}",
                                 "frontier_delta", f"shard_{s}")
                if os.path.exists(p) or os.path.exists(p + ".parquet"):
                    deltas.append(read_table(p))
            futures.append(eng.frontier[s].restore.remote(snap, deltas))
        if eng.cfg.render_enabled:
            for s in range(eng.cfg.seen_shards):
                snap = None
                if snap_at >= 0:
                    p = os.path.join(out_dir, "rounds", f"r{snap_at:05d}",
                                     "render_snapshot", f"shard_{s}")
                    if os.path.exists(p) or os.path.exists(p + ".parquet"):
                        snap = read_table(p)
                deltas = []
                for r in range(snap_at + 1, last + 1):
                    p = os.path.join(out_dir, "rounds", f"r{r:05d}",
                                     "render_delta", f"shard_{s}")
                    if os.path.exists(p) or os.path.exists(p + ".parquet"):
                        deltas.append(read_table(p))
                futures.append(eng.render_frontier[s].restore.remote(snap, deltas))
        for h in range(eng.cfg.host_shards):
            p = os.path.join(out_dir, "rounds", f"r{last:05d}", "host_state", f"shard_{h}")
            futures.append(eng.hosts[h].restore.remote(read_table(p)))
        ray.get(futures)
        eng.next_round = last + 1
        return eng

    # ------------------------------------------------------------------
    def finalize(self) -> None:
        """Public flush point for callers driving :meth:`run_round`
        directly with ``overlap_rounds`` on: finishes any pending
        (non-blocking) checkpoint commit so every manifest is durable.
        :meth:`run`, :meth:`stop` and :meth:`shutdown` call this
        implicitly, as do the inspection accessors below."""
        self._finish_pending_commit()

    # ------------------------------------------------------------------
    # conformance / inspection helpers (driver-side; test-scale use)
    def seen_hashes(self) -> list[str]:
        self._finish_pending_commit()
        import ray

        out: set[str] = set()
        for part in ray.get([s.seen_hashes.remote() for s in self.frontier]):
            out.update(part)
        return sorted(out)

    def counts(self) -> dict[str, int]:
        import ray

        self._finish_pending_commit()
        live = ever = 0
        for c in ray.get([s.counts.remote() for s in self.frontier]):
            live += c["live"]
            ever += c["ever"]
        return {"live": live, "ever": ever}

    def _gather(self, sub: str, columns: list[str] | None = None) -> pa.Table | None:
        import glob

        self._finish_pending_commit()

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(self.out_dir, "rounds", "*", sub,
                                              "**", "*.parquet"), recursive=True))
        files += sorted(glob.glob(os.path.join(self.out_dir, "rounds", "*",
                                               f"{sub}.parquet")))
        if not files:
            return None
        tables = [pq.read_table(f, columns=columns) for f in files]
        return pa.concat_tables(tables, promote_options="default")

    def pages_table(self) -> pa.Table | None:
        return self._gather("pages")

    def artifacts_table(self) -> pa.Table | None:
        return self._gather("artifacts")

    def render_table(self) -> pa.Table | None:
        return self._gather("render")

    def pop_table(self) -> pa.Table | None:
        return self._gather("pop")

    def link_csv_table(self) -> pa.Table | None:
        """The reference's ``data/link.csv`` (proxy,scheme,host,hash,url —
        darc/save.py:111-133) derived from crawled pages; distinct rows,
        no lock-append file needed."""
        pages = self._gather("pages", columns=["proxy", "url", "host", "url_hash"])
        if pages is None:
            return None
        from darc_ray.functions.link import split_url

        urls = pages.column("url").to_pylist()
        schemes = [split_url(u)[0] for u in urls]
        t = pa.Table.from_pydict({
            "proxy": pages.column("proxy").to_pylist(),
            "scheme": schemes,
            "host": pages.column("host").to_pylist(),
            "hash": pages.column("url_hash").to_pylist(),
            "url": urls,
        })
        return t.group_by(["proxy", "scheme", "host", "hash", "url"]).aggregate([])

    def rendered_table(self) -> pa.Table | None:
        return self._gather("rendered")

    def render_seen(self) -> list[str]:
        import ray

        out: set[str] = set()
        for part in ray.get([s.seen_hashes.remote() for s in self.render_frontier]):
            out.update(part)
        return sorted(out)

    def render_live(self) -> dict[str, tuple[float, str]]:
        import ray

        live: dict[str, tuple[float, str]] = {}
        for s in self.render_frontier:
            for r in ray.get(s.live_table.remote()).to_pylist():
                live[r["url_hash"]] = (r["score"], r["url"])
        return live

    def hosts_table(self) -> pa.Table | None:
        """The HOSTS logical table (A2-A4 source): latest host-state
        snapshot across shards (host, proxy, discovery, last_seen,
        alive, robots, sitemaps, …)."""
        import glob

        rounds = sorted(glob.glob(os.path.join(self.out_dir, "rounds", "r*")))
        for rdir in reversed(rounds):
            files = sorted(glob.glob(os.path.join(rdir, "host_state", "*.parquet")))
            if files:
                import pyarrow.parquet as pq

                return pa.concat_tables([pq.read_table(f) for f in files],
                                        promote_options="default")
        return None
