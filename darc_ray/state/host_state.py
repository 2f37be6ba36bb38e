"""Sharded host state: hostname-seen TTL, robots cache, politeness.

Replaces the reference's ``queue_hostname`` sorted set
(``/root/reference/darc/db.py:222-318``, Redis flavor semantics: first
encounter inserts score=now → (have=False, force=False); later
encounters → (True, score < now − ttl)), its per-host robots.txt file
cache (``darc/parse.py:175-182`` re-parses per call — we parse once),
and adds the politeness budget the north rule requires (the reference
parses crawl-delay/request-rate but never enforces them; enforcement
semantics here are *defined by this engine* and mirrored exactly by
the conformance oracle):

politeness: per host, a token bucket seeded with 1 token; each round
``tokens += (now − last_now) / delay`` capped at ``per_host_cap``;
a round may take ``min(want, floor(tokens), per_host_cap)`` URLs in
global ``(score, url_hash)`` order; deferred rows are not leased and
stay eligible.  ``delay = max(crawl-delay, request-rate spacing)``;
hosts without robots rules have delay 0 and are capped only by
``per_host_cap``.

Shards also run the **new-host bootstrap** (darc/crawl.py:140-166):
robots fetch (saved only when HTTP-ok and text/plain,
null.py:256-283), sitemap BFS (sitemapindex recursion + gzip,
null.py:286-332; skipped for zeronet/freenet, crawl.py:147), i2p
hosts.txt subscription (i2p.py:310-362).  Running it in the shard
actor serializes per-host bootstrap deterministically; returned
candidate URLs enqueue with ``score=now`` replace semantics
(``save_requests`` defaults, null.py:332 / crawl.py:202).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Callable

import pyarrow as pa

from darc_ray.functions.link import urljoin
from darc_ray.functions.robots import RobotsRules
from darc_ray.functions.sitemap import (
    child_sitemaps, hosts_txt_urls, maybe_gunzip, sitemap_urls, sitemaps_from_robots,
)

HOST_STATE_SCHEMA = pa.schema([
    pa.field("host", pa.string()),
    pa.field("proxy", pa.string()),
    pa.field("score", pa.float64()),        # hostname-seen timestamp (queue_hostname)
    pa.field("discovery", pa.float64()),
    pa.field("last_seen", pa.float64()),
    pa.field("alive", pa.bool_()),
    pa.field("robots", pa.string()),        # "" = fetched-but-absent, null = never fetched
    pa.field("sitemaps", pa.list_(pa.string())),
    pa.field("tokens", pa.float64()),
    pa.field("last_now", pa.float64()),
])


@lru_cache(maxsize=4096)
def _rules(text: str) -> RobotsRules:
    return RobotsRules(text)


class HostShard:
    """One host-state shard; wrap with ``ray.remote`` for actors.

    ``fetch_fn(url) -> (status, mime, body, history)`` is the fetch
    fabric — the synthetic corpus in tests, real HTTP in production.
    """

    def __init__(self, shard_id: int,
                 fetch_fn: Callable[[str], tuple[int, str, bytes, list]] | None = None) -> None:
        self.shard_id = shard_id
        self.fetch_fn = fetch_fn
        self.hosts: dict[str, dict[str, Any]] = {}

    def set_fetch_fn(self, fetch_fn) -> None:
        self.fetch_fn = fetch_fn

    def _state(self, host: str, proxy: str, now: float) -> dict[str, Any]:
        st = self.hosts.get(host)
        if st is None:
            st = {"proxy": proxy, "score": None, "discovery": now, "last_seen": now,
                  "alive": True, "robots": None, "sitemaps": [],
                  "tokens": 1.0, "last_now": None}
            self.hosts[host] = st
        return st

    # -- hostname-seen (Redis semantics, db.py:279-318) --------------------
    def have_hostnames(self, hosts: list[str], proxies: list[str], now: float,
                       ttl: float | None) -> tuple[list[bool], list[bool]]:
        have, force = [], []
        threshold = -math.inf if ttl is None else now - ttl
        for host, proxy in zip(hosts, proxies):
            st = self._state(host, proxy, now)
            st["last_seen"] = now
            if st["score"] is None:
                st["score"] = now
                have.append(False)
                force.append(False)
            else:
                f = st["score"] < threshold
                if f:
                    st["score"] = now      # redis_update only on refetch
                have.append(True)
                force.append(f)
        return have, force

    # -- new-host bootstrap -------------------------------------------------
    def bootstrap_hosts(self, hosts: list[str], proxies: list[str],
                        root_urls: list[str], now: float) -> dict[str, list]:
        """Run robots+sitemap(+i2p hosts.txt) for hosts claimed new or
        force-refetch.  Returns candidate URL columns (url, backref)
        to enqueue with score=now replace semantics, plus the hosts
        whose bootstrap PARTIALLY failed.

        Partial-failure retry (ref darc/crawl.py:158-166 +
        submit.py:273 ``$PARTIAL$``): an exception escaping the
        sitemap/hosts fetch marks the bootstrap partial — the hostname
        is dropped from the seen set (``drop_hostname`` analog:
        score=None) so the next encounter retries it.  Candidates
        gathered before the failure still enqueue (the reference's
        ``save_requests`` runs per sitemap inside the loop).  The
        fabric's status-0/non-ok responses map to the reference's
        *caught* ``RequestException`` paths (robots → empty rules,
        sitemap → skip) and are NOT partial; only raised exceptions
        (the reference's uncaught/unexpected errors) are."""
        out_urls: list[str] = []
        out_backrefs: list[str] = []
        out_partial: list[str] = []
        for host, proxy, root in zip(hosts, proxies, root_urls):
            st = self._state(host, proxy, now)
            if proxy in ("zeronet", "freenet"):
                continue  # crawl.py:147: no sitemap branch
            partial = False
            try:
                robots_text = self._fetch_robots(root)
                st["robots"] = robots_text
                # sitemap BFS (cycle-guarded; reference has no guard but no cycles either)
                sitemaps = list(sitemaps_from_robots(root, robots_text or ""))
                seen_sm: set[str] = set()
                st_sitemaps: list[str] = []
                while sitemaps:
                    sm_url = sitemaps.pop(0)
                    if sm_url in seen_sm:
                        continue
                    seen_sm.add(sm_url)
                    text = self._fetch_sitemap(sm_url)
                    if text is None:
                        continue
                    st_sitemaps.append(sm_url)
                    sitemaps.extend(child_sitemaps(sm_url, text))
                    for u in sitemap_urls(root, text):
                        out_urls.append(u)
                        out_backrefs.append(root)
                st["sitemaps"] = st_sitemaps
            except Exception:
                partial = True
            if proxy == "i2p":
                try:
                    for u in self._fetch_hosts_txt(root):
                        out_urls.append(u)
                        out_backrefs.append(root)
                except Exception:
                    partial = True
            if partial:
                st["score"] = None          # drop for retry next encounter
                out_partial.append(host)
        return {"url": out_urls, "backref": out_backrefs,
                "partial": out_partial}

    def _fetch_robots(self, root_url: str) -> str:
        if self.fetch_fn is None:
            return ""
        url = urljoin(root_url, "/robots.txt")
        status, mime, body, _ = self.fetch_fn(url)
        if 200 <= status < 300 and mime in ("text/plain", "text/text"):
            return body.decode("utf-8", "replace")
        return ""   # null.py:268-283: non-ok / wrong type → empty rules

    def _fetch_sitemap(self, sm_url: str) -> str | None:
        if self.fetch_fn is None:
            return None
        status, mime, body, _ = self.fetch_fn(sm_url)
        if not (200 <= status < 300):
            return None
        if mime == "application/gzip":
            return maybe_gunzip(body, mime)
        if mime in ("text/xml", "text/html"):
            return body.decode("utf-8", "replace")
        return None   # null.py:320-325: unresolved type → skip

    def _fetch_hosts_txt(self, root_url: str) -> list[str]:
        if self.fetch_fn is None:
            return []
        url = urljoin(root_url, "/hosts.txt")
        status, mime, body, _ = self.fetch_fn(url)
        if 200 <= status < 300 and mime in ("text/plain", "text/text"):
            return hosts_txt_urls(body.decode("utf-8", "replace"))
        return []

    # -- robots gate --------------------------------------------------------
    def robots_allow(self, hosts: list[str], urls: list[str]) -> list[bool]:
        """can_fetch per url using the cached parsed rules; hosts with
        no fetched robots allow everything (incl. zeronet/freenet)."""
        out = []
        for host, url in zip(hosts, urls):
            st = self.hosts.get(host)
            text = st["robots"] if st else None
            out.append(_rules(text).can_fetch(url) if text else True)
        return out

    # -- HEAD probe (CHECK_NG, darc/parse.py:186-241) ------------------------
    def probe_mime(self, urls: list[str]) -> list[tuple[int, str, str]]:
        """HEAD-request analog over the fetch fabric: (status, mime,
        final_url) per url, redirects followed.  ``final_url`` is the
        probe's post-redirect URL; the engine rewrites the candidate to
        it only when ``check_ng_rewrite`` is set (ref darc/parse.py:240
        — queue accounting resolved by drop-old/enqueue-new)."""
        out = []
        for u in urls:
            if self.fetch_fn is None:
                out.append((0, "", u))
                continue
            status, mime, _body, _h = self.fetch_fn(u)
            final = u
            resolve = getattr(self.fetch_fn, "resolve", None)
            if resolve is not None:
                final = resolve(u)
            out.append((status, mime, final))
        return out

    # -- politeness ---------------------------------------------------------
    def take_allowance(self, hosts: list[str], wants: list[int], now: float,
                       per_host_cap: int) -> list[int]:
        out = []
        for host, want in zip(hosts, wants):
            st = self.hosts.get(host)
            delay = 0.0
            if st is not None and st.get("robots"):
                delay = _rules(st["robots"]).effective_delay()
            if st is None or delay <= 0:
                out.append(min(want, per_host_cap))
                continue
            if st["last_now"] is not None and now > st["last_now"]:
                st["tokens"] = min(float(per_host_cap),
                                   st["tokens"] + (now - st["last_now"]) / delay)
            st["last_now"] = now
            allowed = min(want, int(st["tokens"]), per_host_cap)
            st["tokens"] -= allowed
            out.append(allowed)
        return out

    def mark_dead(self, hosts: list[str]) -> None:
        for h in hosts:
            if h in self.hosts:
                self.hosts[h]["alive"] = False

    # -- durability ---------------------------------------------------------
    def snapshot(self) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in HOST_STATE_SCHEMA}
        for host, st in self.hosts.items():
            cols["host"].append(host)
            cols["proxy"].append(st["proxy"])
            cols["score"].append(st["score"] if st["score"] is not None else float("nan"))
            cols["discovery"].append(st["discovery"])
            cols["last_seen"].append(st["last_seen"])
            cols["alive"].append(st["alive"])
            cols["robots"].append(st["robots"])
            cols["sitemaps"].append(st["sitemaps"])
            cols["tokens"].append(st["tokens"])
            cols["last_now"].append(st["last_now"] if st["last_now"] is not None
                                    else float("nan"))
        return pa.Table.from_pydict(cols, schema=HOST_STATE_SCHEMA)

    def snapshot_to(self, path: str) -> int:
        from darc_ray.sources.table_io import write_table

        t = self.snapshot()
        write_table(t, path)
        return t.num_rows

    def restore(self, snapshot: pa.Table) -> None:
        self.hosts.clear()
        for row in snapshot.to_pylist():
            self.hosts[row["host"]] = {
                "proxy": row["proxy"],
                "score": None if math.isnan(row["score"]) else row["score"],
                "discovery": row["discovery"],
                "last_seen": row["last_seen"],
                "alive": row["alive"],
                "robots": row["robots"],
                "sitemaps": list(row["sitemaps"] or []),
                "tokens": row["tokens"],
                "last_now": None if math.isnan(row["last_now"]) else row["last_now"],
            }

    def counts(self) -> dict[str, int]:
        return {"hosts": len(self.hosts)}
