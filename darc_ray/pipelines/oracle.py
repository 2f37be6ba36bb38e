"""Reference-semantics oracle: a deliberately simple single-threaded
simulator of the crawl loop (SURVEY §5/§7.1-7).

It replays the reference's round semantics (pop ≤ budget oldest
eligible by ``(score, url_hash)``, lease to now+ttl, crawler state
machine per link, score arithmetic of darc/db.py) over the synthetic
corpus using plain dicts and lists — no Ray, no actors, no batching —
and the engine's two *documented* determinism rules (new-host robots
resolved before the round's fetches; candidate first-wins by canonical
``min(backref, depth)`` winner; requeues then drops applied at round
end).  The distributed engine must reproduce this oracle's outputs
exactly: final URL-seen set, crawl ordering, pages, edges, artifacts,
robots blocks.

Shared pure kernels (parse_one, extract_from_html, RobotsRules,
sitemap readers, filters) are unit-tested independently; what this
oracle checks is the *distributed orchestration* — leases, sharding,
dedup, politeness, ordering, checkpoint replay.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Any

from darc_ray.config import CrawlConfig
from darc_ray.functions.content import HTML_MIMES, parse_data_uri
from darc_ray.functions.extract import extract_from_html
from darc_ray.functions.filters import keep_host_mask, keep_mime_mask, keep_proxy_mask
from darc_ray.functions.link import parse_one, urljoin
from darc_ray.functions.robots import RobotsRules
from darc_ray.functions.sitemap import (
    child_sitemaps, hosts_txt_urls, maybe_gunzip, sitemap_urls, sitemaps_from_robots,
)
from darc_ray.pipelines.corpus import Corpus
from darc_ray.stages.fetch import ARTIFACT_PROXIES, request_meta
from darc_ray.stages.render import SE_EMPTY, synth_screenshot, window_height


def _sha(u: str) -> str:
    return hashlib.sha256(u.encode("utf-8", "surrogatepass")).hexdigest()


@dataclass
class OracleResult:
    seen: set[str] = field(default_factory=set)                 # url_hash ever enqueued
    pop_order: list[tuple[int, str]] = field(default_factory=list)   # (round, url)
    pages: list[dict[str, Any]] = field(default_factory=list)
    edges: set[tuple[str, str]] = field(default_factory=set)    # (parent_hash, child_hash)
    artifacts: list[tuple[str, str, str]] = field(default_factory=list)  # (kind, src, url)
    robots_blocked: list[tuple[int, str]] = field(default_factory=list)
    render: set[str] = field(default_factory=set)               # url_hash promoted
    frontier: dict[str, list] = field(default_factory=dict)     # live rows at end
    metrics: list[dict[str, int]] = field(default_factory=list)
    # second-stage (loader) outputs, when cfg.render_enabled
    rendered: list[dict[str, Any]] = field(default_factory=list)
    render_pop_order: list[tuple[int, str]] = field(default_factory=list)
    render_seen: set[str] = field(default_factory=set)
    render_frontier: dict[str, list] = field(default_factory=dict)


def simulate(corpus: Corpus, cfg: CrawlConfig, max_rounds: int,
             bootstrap_fetch=None) -> OracleResult:
    """``bootstrap_fetch`` overrides the fabric for the new-host
    bootstrap fetches only (robots/sitemap/hosts.txt) — used to mirror
    engine-side fetch-failure injection for the partial-failure-retry
    conformance test (ref darc/crawl.py:158-166)."""
    res = OracleResult()
    ttl = cfg.time_cache
    budget = cfg.max_pool * cfg.workers
    boot_lookup = bootstrap_fetch if bootstrap_fetch is not None else corpus.lookup

    # frontier: url_hash → [url, proxy, scheme, host, base_host, backref, score, depth]
    frontier: dict[str, list] = {}
    render_frontier: dict[str, list] = {}
    host_state: dict[str, dict[str, Any]] = {}

    def upsert(url: str, backref: str, depth: int, score: float, nx: bool) -> None:
        hh = _sha(url)
        if nx and hh in frontier:
            return
        p = parse_one(url)
        frontier[hh] = [url, p.proxy, p.scheme, p.host, p.base_host, backref,
                        score, depth]
        res.seen.add(hh)

    def render_upsert(url: str, backref: str, depth: int, score: float, nx: bool) -> None:
        hh = _sha(url)
        if nx and hh in render_frontier:
            return
        p = parse_one(url)
        render_frontier[hh] = [url, p.proxy, p.scheme, p.host, p.base_host, backref,
                               score, depth]
        res.render_seen.add(hh)

    def host_st(host: str, proxy: str, now: float) -> dict[str, Any]:
        st = host_state.get(host)
        if st is None:
            st = {"proxy": proxy, "score": None, "robots": None,
                  "tokens": 1.0, "last_now": None}
            host_state[host] = st
        return st

    for url in corpus.seeds:
        upsert(url, "", 0, 0.0, nx=True)

    for t in range(max_rounds):
        now = ttl + t * cfg.tick
        max_score = now - ttl
        metrics = {"popped": 0, "taken": 0, "pages": 0, "enqueued": 0}

        # ---- pop: (score, url_hash) asc, limit budget
        eligible = sorted(((row[6], hh) for hh, row in frontier.items()
                           if row[6] <= max_score))
        popped = [hh for _, hh in eligible[:budget]]
        metrics["popped"] = len(popped)

        # ---- politeness allowance (identical token-bucket rule)
        wants: dict[str, int] = {}
        for hh in popped:
            row = frontier[hh]
            if row[2] in ("http", "https"):
                wants[row[3] or ""] = wants.get(row[3] or "", 0) + 1
        allowed: dict[str, int] = {}
        for host in wants:
            st = host_state.get(host)
            delay = 0.0
            if st is not None and st.get("robots"):
                delay = RobotsRules(st["robots"]).effective_delay()
            if st is None or delay <= 0:
                allowed[host] = min(wants[host], cfg.per_host_cap)
                continue
            if st["last_now"] is not None and now > st["last_now"]:
                st["tokens"] = min(float(cfg.per_host_cap),
                                   st["tokens"] + (now - st["last_now"]) / delay)
            st["last_now"] = now
            take = min(wants[host], int(st["tokens"]), cfg.per_host_cap)
            st["tokens"] -= take
            allowed[host] = take

        used: dict[str, int] = {}
        taken: list[str] = []
        for hh in popped:
            row = frontier[hh]
            if row[2] not in ("http", "https"):
                taken.append(hh)
                continue
            h = row[3] or ""
            if used.get(h, 0) < allowed.get(h, 0):
                used[h] = used.get(h, 0) + 1
                taken.append(hh)
        metrics["taken"] = len(taken)
        res.pop_order.extend((t, frontier[hh][0]) for hh in taken)

        # ---- lease
        for hh in taken:
            frontier[hh][6] = now + ttl

        rows = {hh: list(frontier[hh]) for hh in taken}   # fetch-time view

        # ---- CHECK-time filter (leased but not crawled); CHECK_NG adds
        # the HEAD-probed mime filter (_check_ng, parse.py:186-241)
        if cfg.check_ng:
            keep_h = keep_host_mask([rows[hh][3] for hh in taken], cfg)
            keep_p = keep_proxy_mask([rows[hh][1] for hh in taken], cfg)
            kept = [hh for i, hh in enumerate(taken)
                    if keep_h[i] and keep_p[i] and rows[hh][2] in ("http", "https")]
            taken = []
            taken_set: set[str] = set()
            for hh in kept:
                status, mime, _b, _h2 = corpus.lookup(rows[hh][0])
                if status == 0:
                    continue
                if not keep_mime_mask([mime], cfg)[0]:
                    continue
                # CHECK_NG redirect rewrite (parse.py:236-241): replace
                # the candidate by the probe's final URL; drop old hash,
                # enqueue final leased
                if cfg.check_ng_rewrite:
                    final_url = corpus.resolve(rows[hh][0])
                    if final_url != rows[hh][0]:
                        old = rows[hh]
                        new_hh = _sha(final_url)
                        frontier.pop(hh, None)
                        # first pool occurrence wins the rewritten row's
                        # attrs (engine _apply_rewrites dedupe): never
                        # overwrite a target already taken this round
                        if new_hh not in taken_set:
                            p = parse_one(final_url)
                            frontier[new_hh] = [final_url, p.proxy, p.scheme,
                                                p.host, p.base_host, old[5],
                                                now + ttl, old[7]]
                            res.seen.add(new_hh)
                            rows[new_hh] = list(frontier[new_hh])
                        hh = new_hh
                if hh in taken_set:          # rewrite collisions: first wins
                    continue
                taken_set.add(hh)
                taken.append(hh)
        elif cfg.check:
            keep_h = keep_host_mask([rows[hh][3] for hh in taken], cfg)
            keep_p = keep_proxy_mask([rows[hh][1] for hh in taken], cfg)
            taken = [hh for i, hh in enumerate(taken) if keep_h[i] and keep_p[i]]

        # ---- new-host bootstrap before fetches (engine rule)
        now_cands: list[tuple[str, str, int]] = []        # (url, backref, depth)
        seen_hosts_this_round: set[str] = set()
        for hh in taken:
            url, proxy, scheme, host, base_host, backref, _, depth = rows[hh]
            if scheme not in ("http", "https") or not host or host in seen_hosts_this_round:
                continue
            seen_hosts_this_round.add(host)
            st = host_st(host, proxy, now)
            if st["score"] is None:
                st["score"] = now
                is_new, force = True, False
            else:
                host_ttl = cfg.host_ttl if cfg.host_ttl is not None else ttl
                force = st["score"] < now - host_ttl
                if force:
                    st["score"] = now
                is_new = False
            if not (is_new or force):
                continue
            if proxy in ("zeronet", "freenet"):
                continue
            # partial-failure retry (ref crawl.py:158-166): an exception
            # escaping the bootstrap fetches drops the hostname from the
            # seen set so the next encounter retries; candidates
            # gathered before the failure still enqueue
            partial = False
            try:
                # robots fetch
                r_status, r_mime, r_body, _ = boot_lookup(urljoin(url, "/robots.txt"))
                robots = (r_body.decode("utf-8", "replace")
                          if 200 <= r_status < 300 and r_mime in ("text/plain", "text/text")
                          else "")
                st["robots"] = robots
                # sitemap BFS
                queue = list(sitemaps_from_robots(url, robots))
                seen_sm: set[str] = set()
                while queue:
                    sm = queue.pop(0)
                    if sm in seen_sm:
                        continue
                    seen_sm.add(sm)
                    s_status, s_mime, s_body, _ = boot_lookup(sm)
                    if not (200 <= s_status < 300):
                        continue
                    if s_mime == "application/gzip":
                        text = maybe_gunzip(s_body, s_mime)
                    elif s_mime in ("text/xml", "text/html"):
                        text = s_body.decode("utf-8", "replace")
                    else:
                        continue
                    queue.extend(child_sitemaps(sm, text))
                    for u in sitemap_urls(url, text):
                        now_cands.append((u, url, depth + 1))
            except Exception:
                partial = True
            if proxy == "i2p":
                try:
                    h_status, h_mime, h_body, _ = boot_lookup(urljoin(url, "/hosts.txt"))
                    if 200 <= h_status < 300 and h_mime in ("text/plain", "text/text"):
                        for u in hosts_txt_urls(h_body.decode("utf-8", "replace")):
                            now_cands.append((u, url, depth + 1))
                except Exception:
                    partial = True
            if partial:
                st["score"] = None          # drop_hostname analog → retry

        # ---- fetch each taken row (sequential; round-batched effects)
        nx_cands: list[tuple[str, str, int]] = []
        requeues: list[str] = []
        drops: list[str] = []
        promotions: list[tuple[str, str, int]] = []
        for hh in taken:
            url, proxy, scheme, host, base_host, backref, _, depth = rows[hh]
            if not keep_proxy_mask([proxy], cfg)[0] or not keep_host_mask([host], cfg)[0]:
                drops.append(hh)
                continue
            kind = ARTIFACT_PROXIES.get(proxy)
            if kind is not None:
                if proxy == "data" and parse_data_uri(url) is None:
                    drops.append(hh)
                    continue
                res.artifacts.append((kind, backref, url))
                drops.append(hh)
                continue
            if scheme not in ("http", "https"):
                res.artifacts.append(("invalid", backref, url))
                drops.append(hh)
                continue
            if not cfg.force:
                st = host_state.get(host or "")
                robots = st["robots"] if st else None
                if robots and not RobotsRules(robots).can_fetch(url):
                    res.robots_blocked.append((t, url))
                    continue
            status, mime, body, history = corpus.lookup(url)
            if status == 0:
                requeues.append(hh)
                continue
            if mime not in HTML_MIMES:
                if proxy == "i2p" and mime in ("text/plain", "text/text"):
                    for u in hosts_txt_urls(body.decode("utf-8", "replace")):
                        now_cands.append((u, url, depth + 1))
                if not keep_mime_mask([mime], cfg)[0]:
                    drops.append(hh)
                    continue
                phash, psnr_ok = 0, True
                if mime in ("image/png", "image/jpeg") and body:
                    from darc_ray.stages.fetch import check_image_payload

                    phash, psnr_ok = check_image_payload(body, mime)
                res.pages.append({"url_hash": hh, "url": url, "status": status,
                                  "mime": mime, "is_html": False, "phash": phash,
                                  "psnr_ok": psnr_ok,
                                  "body_digest": _sha_bytes(body), "round": t,
                                  **request_meta(mime, body, history,
                                                 corpus.resolve(url) if history
                                                 else url)})
                if backref:
                    res.edges.add((_sha(backref), hh))
                continue
            if not body:
                requeues.append(hh)
                continue
            res.pages.append({"url_hash": hh, "url": url, "status": status,
                              "mime": mime, "is_html": True, "phash": 0,
                              "psnr_ok": True,
                              "body_digest": _sha_bytes(body), "round": t,
                              **request_meta(mime, body, history,
                                             corpus.resolve(url) if history
                                             else url)})
            if backref:
                res.edges.add((_sha(backref), hh))
            for u in extract_from_html(url, body.decode("utf-8", "replace")):
                nx_cands.append((u, url, depth + 1))
            if 200 <= status < 400:
                res.render.add(hh)
                promotions.append((url, backref, depth))
            else:
                requeues.append(hh)
        metrics["pages"] = len(res.pages)

        # ---- round-end frontier effects (engine order):
        # 1. candidate upserts with canonical winner per (url, mode)
        def dedup(cands: list[tuple[str, str, int]]) -> list[tuple[str, str, int]]:
            best: dict[str, tuple[str, int]] = {}
            for u, b, d in cands:
                cur = best.get(u)
                if cur is None or (b, d) < cur:
                    best[u] = (b, d)
            return [(u, b, d) for u, (b, d) in best.items()]

        before = len(res.seen)
        for u, b, d in dedup(nx_cands):
            upsert(u, b, d, 0.0, nx=True)
        for u, b, d in dedup(now_cands):
            upsert(u, b, d, now, nx=False)
        metrics["enqueued"] = len(res.seen) - before
        # 2. requeues, 3. drops
        for hh in requeues:
            if hh in frontier:
                frontier[hh][6] = now
        for hh in drops:
            frontier.pop(hh, None)

        # ---- render (loader) phase: same round, after crawl effects
        if cfg.render_enabled:
            for u, b, d in dedup(promotions):
                render_upsert(u, b, d, 0.0, nx=True)
            r_eligible = sorted(((row[6], hh) for hh, row in render_frontier.items()
                                 if row[6] <= max_score))
            r_taken = [hh for _, hh in r_eligible[:budget]]
            res.render_pop_order.extend((t, render_frontier[hh][0]) for hh in r_taken)
            for hh in r_taken:
                render_frontier[hh][6] = now + ttl
            r_rows = {hh: list(render_frontier[hh]) for hh in r_taken}
            # load_selenium(check=CHECK) → _check → _check_ng when
            # CHECK_NG is set (db.py:1060, parse.py:244-273)
            if cfg.check_ng:
                kh = keep_host_mask([r_rows[hh][3] for hh in r_taken], cfg)
                kp = keep_proxy_mask([r_rows[hh][1] for hh in r_taken], cfg)
                kept = [hh for i, hh in enumerate(r_taken)
                        if kh[i] and kp[i] and r_rows[hh][2] in ("http", "https")]
                r_taken = []
                r_taken_set: set[str] = set()
                for hh in kept:
                    status, mime, _b, _h2 = corpus.lookup(r_rows[hh][0])
                    if status == 0 or not keep_mime_mask([mime], cfg)[0]:
                        continue
                    if cfg.check_ng_rewrite:
                        final_url = corpus.resolve(r_rows[hh][0])
                        if final_url != r_rows[hh][0]:
                            old = r_rows[hh]
                            new_hh = _sha(final_url)
                            render_frontier.pop(hh, None)
                            if new_hh not in r_taken_set:   # first wins
                                p = parse_one(final_url)
                                render_frontier[new_hh] = [final_url, p.proxy,
                                                           p.scheme, p.host,
                                                           p.base_host, old[5],
                                                           now + ttl, old[7]]
                                res.render_seen.add(new_hh)
                                r_rows[new_hh] = list(render_frontier[new_hh])
                            hh = new_hh
                    if hh in r_taken_set:
                        continue
                    r_taken_set.add(hh)
                    r_taken.append(hh)
            elif cfg.check:
                kh = keep_host_mask([r_rows[hh][3] for hh in r_taken], cfg)
                kp = keep_proxy_mask([r_rows[hh][1] for hh in r_taken], cfg)
                r_taken = [hh for i, hh in enumerate(r_taken) if kh[i] and kp[i]]
            r_cands: list[tuple[str, str, int]] = []
            r_requeues: list[str] = []
            r_drops: list[str] = []
            for hh in r_taken:
                url, proxy, scheme, host, base_host, backref, _, depth = r_rows[hh]
                if proxy in ARTIFACT_PROXIES or scheme not in ("http", "https"):
                    r_drops.append(hh)
                    continue
                status, mime, body, _h = corpus.lookup(url)
                if status == 0:
                    r_requeues.append(hh)
                    continue
                doc = body.decode("utf-8", "replace")
                if not doc or doc == SE_EMPTY:
                    r_requeues.append(hh)
                    continue
                height = window_height(doc)
                res.rendered.append({
                    "url_hash": hh, "url": url, "round": t,
                    "doc_digest": _sha_bytes(doc.encode("utf-8", "replace")),
                    "screenshot_digest": _sha_bytes(synth_screenshot(hh, height)),
                    "width": 1024, "height": height})
                for u in extract_from_html(url, doc):
                    r_cands.append((u, url, depth + 1))
            for u, b, d in dedup(r_cands):
                upsert(u, b, d, 0.0, nx=True)
            for hh in r_requeues:
                if hh in render_frontier:
                    render_frontier[hh][6] = now
            for hh in r_drops:
                render_frontier.pop(hh, None)

        res.metrics.append(metrics)

    res.frontier = frontier
    res.render_frontier = render_frontier
    return res


def _sha_bytes(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()
