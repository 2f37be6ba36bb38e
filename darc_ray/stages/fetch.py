"""The fetch/route stage: darc's ``crawler(link)`` state machine
(``/root/reference/darc/crawl.py:44-251``) decomposed into a
batch-at-a-time actor-pool stage.

One frontier row in → zero or more **event rows** out, on a superset
schema (``EVENT_SCHEMA``); downstream stages filter by ``kind``:

| kind            | reference path                               | frontier effect (applied at round commit) |
|-----------------|----------------------------------------------|-------------------------------------------|
| ``page``        | submit_requests (crawl.py:210,221)           | none (stays leased → re-crawl after TTL)  |
| ``candidate``   | extract_links → save_requests (crawl.py:225) | upsert score=0 nx / score=now replace     |
| ``artifact``    | site hooks → misc sinks + LinkNoReturn       | drop                                       |
| ``drop``        | match_proxy/match_host/mime (crawl.py:119-127,205) | drop                                 |
| ``requeue``     | fetch error / empty body / !ok (crawl.py:184,219,229) | score=now replace                  |
| ``render``      | save_selenium promote (crawl.py:233)         | none (second-stage queue append)           |
| ``robots_blocked`` | robots gate return (crawl.py:168-170)     | none (stays leased)                        |

The actor holds per-worker state built once in ``__init__`` (St4
analog): the synthetic fetch fabric index, compiled extraction
patterns, the config.  Robots gating consults the host-state shards
in one batched RPC per (shard × batch).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from darc_ray.config import CrawlConfig
from darc_ray.functions.content import HTML_MIMES, parse_data_uri
from darc_ray.functions.extract import extract_from_html
from darc_ray.functions.filters import keep_host_mask, keep_proxy_mask, keep_mime_mask
from darc_ray.functions.hashing import host_shard_of
from darc_ray.functions.sitemap import hosts_txt_urls

# proxy classes routed straight to artifact sinks via site hooks
# (darc/sites/__init__.py:46-57); wss shares the ws sink.
ARTIFACT_PROXIES = {
    "data": "data", "bitcoin": "bitcoin", "ethereum": "ethereum", "ed2k": "ed2k",
    "magnet": "magnet", "mail": "mail", "tel": "tel", "irc": "irc",
    "ws": "ws", "wss": "ws",
}

EVENT_SCHEMA = pa.schema([
    pa.field("kind", pa.string()),
    pa.field("url_hash", pa.string()),
    pa.field("url", pa.string()),
    pa.field("host", pa.string()),
    pa.field("proxy", pa.string()),
    pa.field("round", pa.int32()),
    pa.field("ts", pa.float64()),
    pa.field("status", pa.int32()),
    pa.field("reason", pa.string()),
    pa.field("mime", pa.string()),
    pa.field("is_html", pa.bool_()),
    pa.field("body", pa.large_binary()),
    pa.field("history", pa.list_(pa.struct([
        pa.field("url", pa.string()), pa.field("status", pa.int32())]))),
    pa.field("backref", pa.string()),
    pa.field("backref_hash", pa.string()),
    pa.field("cand_url", pa.string()),
    pa.field("cand_backref", pa.string()),
    pa.field("cand_depth", pa.int32()),
    pa.field("cand_mode", pa.string()),
    pa.field("artifact_kind", pa.string()),
    pa.field("payload", pa.large_binary()),
    pa.field("artifact_mime", pa.string()),
])

_DEFAULTS: dict[str, Any] = {
    "status": 0, "reason": "", "mime": "", "is_html": False, "body": b"",
    "history": [], "backref": "", "backref_hash": "", "cand_url": "",
    "cand_backref": "", "cand_depth": 0, "cand_mode": "", "artifact_kind": "",
    "payload": b"", "artifact_mime": "", "host": "", "proxy": "",
}

_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
            500: "Internal Server Error", 0: "Connection Error"}


def _sha(url: str) -> str:
    import hashlib

    return hashlib.sha256(url.encode("utf-8", "surrogatepass")).hexdigest() if url else ""


class CorpusFetchFn:
    """Picklable synthetic fetch fabric: lazy-loads the corpus index
    once per process (shared by fetcher + host-shard actors)."""

    def __init__(self, corpus_path: str) -> None:
        self.corpus_path = corpus_path
        self._corpus = None

    def __call__(self, url: str) -> tuple[int, str, bytes, list[tuple[str, int]]]:
        if self._corpus is None:
            from darc_ray.pipelines.corpus import Corpus

            self._corpus = Corpus.load(self.corpus_path)
            self._corpus.index()
        return self._corpus.lookup(url)


class _Events:
    """Column accumulator for EVENT_SCHEMA rows."""

    def __init__(self) -> None:
        self.cols: dict[str, list] = {f.name: [] for f in EVENT_SCHEMA}

    def emit(self, kind: str, url_hash: str, url: str, rnd: int, ts: float, **kw) -> None:
        c = self.cols
        c["kind"].append(kind)
        c["url_hash"].append(url_hash)
        c["url"].append(url)
        c["round"].append(rnd)
        c["ts"].append(ts)
        for name, default in _DEFAULTS.items():
            c[name].append(kw.get(name, default))

    def table(self) -> pa.Table:
        return pa.Table.from_pydict(self.cols, schema=EVENT_SCHEMA)


class Fetcher:
    """``map_batches`` actor: fetch + route one pool batch."""

    def __init__(self, cfg: CrawlConfig, fetch_fn, host_shards: list) -> None:
        self.cfg = cfg
        self.fetch_fn = fetch_fn
        self.host_shards = host_shards     # ray actor handles (or local HostShards in tests)

    # -- robots gate: one batched call per involved shard ------------------
    def _robots_allowed(self, hosts: list[str], urls: list[str]) -> list[bool]:
        import ray

        shard_ids = host_shard_of(hosts, len(self.host_shards))
        result = [True] * len(urls)
        by_shard: dict[int, list[int]] = {}
        for i, s in enumerate(shard_ids):
            by_shard.setdefault(int(s), []).append(i)
        futures = {}
        for s, idxs in by_shard.items():
            shard = self.host_shards[s]
            h = [hosts[i] for i in idxs]
            u = [urls[i] for i in idxs]
            method = shard.robots_allow
            if hasattr(method, "remote"):                      # ray actor handle
                futures[s] = method.remote(h, u)
            else:                                              # local object (unit tests)
                futures[s] = method(h, u)
        for s, idxs in by_shard.items():
            got = futures[s]
            if not isinstance(got, list):
                got = ray.get(got)
            for i, allowed in zip(idxs, got):
                result[i] = allowed
        return result

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        cols = batch.to_pydict()
        n = len(cols["url"])
        ev = _Events()

        keep_p = keep_proxy_mask(cols["proxy"], cfg)
        keep_h = keep_host_mask(cols["host"], cfg)

        # robots gate inputs (fetchable rows only)
        fetch_idx = [i for i in range(n)
                     if keep_p[i] and keep_h[i] and cols["scheme"][i] in ("http", "https")]
        if cfg.force:
            allowed = {i: True for i in fetch_idx}
        else:
            got = self._robots_allowed([cols["host"][i] for i in fetch_idx],
                                       [cols["url"][i] for i in fetch_idx])
            allowed = dict(zip(fetch_idx, got))

        for i in range(n):
            url = cols["url"][i]
            hh = cols["url_hash"][i]
            rnd = int(cols["round"][i])
            now = float(cols["now"][i])
            host = cols["host"][i] or ""
            proxy = cols["proxy"][i]
            scheme = cols["scheme"][i]
            backref = cols["backref"][i] or ""
            depth = int(cols["depth"][i])

            # crawler-time filters (crawl.py:119-127): drop, no artifact
            if not keep_p[i] or not keep_h[i]:
                ev.emit("drop", hh, url, rnd, now, host=host, proxy=proxy)
                continue

            # site-hook artifact sinks (sentinel hosts)
            kind = ARTIFACT_PROXIES.get(proxy)
            if kind is not None:
                payload, amime = b"", ""
                if proxy == "data":
                    parsed = parse_data_uri(url)
                    if parsed is None:      # save_data ValueError → drop only
                        ev.emit("drop", hh, url, rnd, now, host=host, proxy=proxy)
                        continue
                    amime, payload = parsed
                ev.emit("artifact", hh, url, rnd, now, host=host, proxy=proxy,
                        artifact_kind=kind, payload=payload, artifact_mime=amime,
                        backref=backref)
                continue

            # non-http(s) schemes requests can't fetch → invalid sink (crawl.py:177-181)
            if scheme not in ("http", "https"):
                ev.emit("artifact", hh, url, rnd, now, host=host, proxy=proxy,
                        artifact_kind="invalid", backref=backref)
                continue

            # robots gate (crawl.py:168-170): blocked rows stay leased
            if not allowed.get(i, True):
                ev.emit("robots_blocked", hh, url, rnd, now, host=host, proxy=proxy)
                continue

            status, mime, body, history = self.fetch_fn(url)
            if status == 0:                 # RequestException (crawl.py:182-184)
                ev.emit("requeue", hh, url, rnd, now, host=host, proxy=proxy)
                continue

            reason = _REASONS.get(status, "")
            hist = [{"url": hu, "status": hs} for hu, hs in history]

            if mime not in HTML_MIMES:
                # i2p hosts.txt side-channel (crawl.py:200-203)
                if proxy == "i2p" and mime in ("text/plain", "text/text"):
                    for u in hosts_txt_urls(body.decode("utf-8", "replace")):
                        ev.emit("candidate", hh, url, rnd, now, cand_url=u,
                                cand_backref=url, cand_depth=depth + 1,
                                cand_mode="now_replace")
                if not keep_mime_mask([mime], cfg)[0]:     # crawl.py:205-207
                    ev.emit("drop", hh, url, rnd, now, host=host, proxy=proxy)
                    continue
                ev.emit("page", hh, url, rnd, now, host=host, proxy=proxy,
                        status=status, reason=reason, mime=mime, is_html=False,
                        body=body, history=hist, backref=backref,
                        backref_hash=_sha(backref))
                continue

            if not body:                    # empty response (crawl.py:216-219)
                ev.emit("requeue", hh, url, rnd, now, host=host, proxy=proxy)
                continue

            ev.emit("page", hh, url, rnd, now, host=host, proxy=proxy,
                    status=status, reason=reason, mime=mime, is_html=True,
                    body=body, history=hist, backref=backref,
                    backref_hash=_sha(backref))

            html = body.decode("utf-8", "replace")
            for u in extract_from_html(url, html):
                ev.emit("candidate", hh, url, rnd, now, cand_url=u, cand_backref=url,
                        cand_depth=depth + 1, cand_mode="zero_nx")

            if 200 <= status < 400:         # response.ok → promote (crawl.py:231-233)
                ev.emit("render", hh, url, rnd, now, host=host, proxy=proxy)
            else:                           # 4xx/5xx → requeue (crawl.py:227-230)
                ev.emit("requeue", hh, url, rnd, now, host=host, proxy=proxy)

        return ev.table()
