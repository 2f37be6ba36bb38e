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
from darc_ray.hooks import LinkNoReturn, site_for

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
    # requests metadata (ref darc/submit.py:415-482, darc/model/web/
    # requests.py:36-103): method, response/session cookies, request/
    # response headers; history carries per-hop reason + headers
    pa.field("method", pa.string()),
    pa.field("request_headers", pa.map_(pa.string(), pa.string())),
    pa.field("response_headers", pa.map_(pa.string(), pa.string())),
    pa.field("cookies", pa.map_(pa.string(), pa.string())),
    pa.field("session_cookies", pa.map_(pa.string(), pa.string())),
    pa.field("history", pa.list_(pa.struct([
        pa.field("url", pa.string()), pa.field("status", pa.int32()),
        pa.field("reason", pa.string()),
        pa.field("headers", pa.map_(pa.string(), pa.string()))]))),
    pa.field("backref", pa.string()),
    pa.field("backref_hash", pa.string()),
    pa.field("cand_url", pa.string()),
    pa.field("cand_backref", pa.string()),
    pa.field("cand_depth", pa.int32()),
    pa.field("cand_mode", pa.string()),
    pa.field("artifact_kind", pa.string()),
    pa.field("payload", pa.large_binary()),
    pa.field("artifact_mime", pa.string()),
    pa.field("phash", pa.int64()),          # image payloads: perceptual hash
    pa.field("psnr_ok", pa.bool_()),        # image payloads: re-encode PSNR >= 40 dB
])

_DEFAULTS: dict[str, Any] = {
    "status": 0, "reason": "", "mime": "", "is_html": False, "body": b"",
    "method": "", "request_headers": [], "response_headers": [],
    "cookies": [], "session_cookies": [],
    "history": [], "backref": "", "backref_hash": "", "cand_url": "",
    "cand_backref": "", "cand_depth": 0, "cand_mode": "", "artifact_kind": "",
    "payload": b"", "artifact_mime": "", "host": "", "proxy": "", "phash": 0,
    "psnr_ok": True,
}

_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
            500: "Internal Server Error", 0: "Connection Error"}


def request_meta(mime: str, body: bytes, history: list, final_url: str,
                 extras: dict | None = None) -> dict[str, Any]:
    """Deterministic requests metadata (ref darc/submit.py:415-482):
    method, request/response headers, response/session cookies, and the
    per-hop redirect history with each hop's defining headers.  The
    synthetic fabric carries no cookie state, so cookie maps default
    empty; a site/proxy hook may return a 5th ``extras`` dict to
    override any field (mirroring demo/docs/mysite.py's
    ``session.cookies.set``)."""
    from darc_ray.functions.robots import USER_AGENT

    extras = extras or {}
    chain = [hu for hu, _ in history] + [final_url]
    hops = [{"url": hu, "status": hs, "reason": _REASONS.get(hs, ""),
             "headers": [("Location", chain[i + 1])]}
            for i, (hu, hs) in enumerate(history)]
    meta: dict[str, Any] = {
        "method": "GET",
        "request_headers": [("User-Agent", USER_AGENT), ("Accept", "*/*")],
        "response_headers": [("Content-Type", mime),
                             ("Content-Length", str(len(body)))],
        "cookies": [],
        "session_cookies": [],
        "history": hops,
    }
    for k in list(meta):
        if k in extras:
            v = extras[k]
            meta[k] = sorted(v.items()) if isinstance(v, dict) else v
    return meta


def _sha(url: str) -> str:
    import hashlib

    return hashlib.sha256(url.encode("utf-8", "surrogatepass")).hexdigest() if url else ""


def compute_body_phash(body: bytes, mime: str) -> int:
    """Decode an image payload and compute its 64-bit perceptual hash;
    0 when undecodable."""
    from darc_ray.functions import image as img

    try:
        return img.phash64(img.decode(body, mime.split("/", 1)[1]))
    except Exception:
        return 0


def check_image_payload(body: bytes, mime: str) -> tuple[int, bool]:
    """The input_hint per-row invariant, enforced at fetch time:
    decode → phash, and verify a re-encode round-trip stays within the
    PSNR ≥ 40 dB gate (bit-exact PNG ⇒ PSNR = inf).  Returns
    (phash, psnr_ok); undecodable payloads → (0, False)."""
    from darc_ray.functions import image as img

    try:
        fmt = mime.split("/", 1)[1]
        pix = img.decode(body, fmt)
        ph = img.phash64(pix)
        if fmt == "png":
            # PNG re-encode is bit-exact by construction (lossless
            # codec, round-trip unit-tested) — PSNR would always be
            # inf, so skip the two extra codec passes per row
            return ph, True
        rt = img.lossy_roundtrip(pix, body, fmt)
        p = img.psnr(pix, rt)
        return ph, bool(p == float("inf") or p >= 40.0)
    except Exception:
        return 0, False


_CORPUS_CACHE: dict[str, Any] = {}

# Worker-process-global per-proxy state (St4/St5 bootstrap seam): the
# stateless task flavor constructs a fresh stage per batch, so sessions/
# drivers built by register_proxy factories live HERE, keyed by
# (kind, proxy, factory fingerprint) — an expensive factory (tor daemon
# bootstrap, Chrome launch) runs once per worker process, never once per
# batch (ref darc/proxy/__init__.py:29-50, darc/proxy/tor.py:82-174).
_PROXY_STATE_CACHE: dict[tuple, Any] = {}


def proxy_state_for(kind: str, proxy: str, factory, base):
    """Resolve a per-proxy session/driver once per worker process.

    The factory arrives freshly unpickled in every stateless task, so
    identity can't key the cache; a content fingerprint (cloudpickle
    bytes, stable across unpicklings of the same driver-side snapshot)
    can.  ``factory is None`` short-circuits to the base fetch fabric
    (itself cached via ``_CORPUS_CACHE``)."""
    if factory is None:
        return base
    tok = getattr(factory, "_darc_ray_token", None)
    if tok is None:
        import hashlib

        from ray import cloudpickle

        tok = hashlib.sha256(cloudpickle.dumps(factory)).hexdigest()[:16]
        try:
            factory._darc_ray_token = tok
        except (AttributeError, TypeError):
            pass                       # partials etc.: recompute per batch (cheap)
    key = (kind, proxy, tok)
    s = _PROXY_STATE_CACHE.get(key)
    if s is None:
        s = factory(base)
        _PROXY_STATE_CACHE[key] = s
    return s


class _TableFetchIndex:
    """Redirect-following lookup over a (url, status, mime, body,
    redirect_to) Arrow table.  The table stays zero-copy in the object
    store; only the url → row-index dict is per-process."""

    def __init__(self, table: pa.Table) -> None:
        # single-chunk Arrays: ChunkedArray.__getitem__ is ~60x slower
        # per lookup than Array.__getitem__ (chunk search + wrapper)
        table = table.combine_chunks()
        self.status = table.column("status").chunk(0)
        self.mime = table.column("mime").chunk(0)
        self.body = table.column("body").chunk(0)
        self.redirect = table.column("redirect_to").chunk(0)
        self.ix = {u: i for i, u in enumerate(table.column("url").to_pylist())}

    def lookup(self, url: str, max_hops: int = 5):
        history: list[tuple[str, int]] = []
        cur = url
        for _ in range(max_hops):
            i = self.ix.get(cur)
            if i is None:
                return 404, "text/html", b"<html><body>not found</body></html>", history
            redirect = self.redirect[i].as_py()
            if redirect:
                history.append((cur, self.status[i].as_py()))
                cur = redirect
                continue
            return (self.status[i].as_py(), self.mime[i].as_py(),
                    self.body[i].as_py(), history)
        return 508, "text/html", b"", history


class CorpusFetchFn:
    """Picklable synthetic fetch fabric.

    The web table is broadcast ONCE via ``ray.put`` (zero-copy Arrow in
    the object store, shared by all workers on the node); each worker
    process builds only the light url → row index, cached in a
    process-global so rounds and stages reuse it.  Constructing from a
    path (no Ray session, unit tests) falls back to a direct load."""

    def __init__(self, corpus_path: str, web_ref=None) -> None:
        self.corpus_path = corpus_path
        self.web_ref = web_ref

    @classmethod
    def broadcast(cls, corpus_path: str) -> "CorpusFetchFn":
        import os

        import ray

        from darc_ray.sources.table_io import read_table

        web = read_table(os.path.join(corpus_path, "web"))
        return cls(corpus_path, ray.put(web))

    def _index(self) -> _TableFetchIndex:
        idx = _CORPUS_CACHE.get(self.corpus_path)
        if idx is None:
            if self.web_ref is not None:
                import ray

                table = ray.get(self.web_ref)
            else:
                import os

                from darc_ray.sources.table_io import read_table

                table = read_table(os.path.join(self.corpus_path, "web"))
            idx = _TableFetchIndex(table)
            _CORPUS_CACHE[self.corpus_path] = idx
        return idx

    def __call__(self, url: str) -> tuple[int, str, bytes, list[tuple[str, int]]]:
        return self._index().lookup(url)

    def resolve(self, url: str, max_hops: int = 5) -> str:
        """Final URL after following the fabric's redirect chain — the
        HEAD probe's ``response.request.url`` (ref darc/parse.py:240)."""
        idx = self._index()
        cur = url
        for _ in range(max_hops):
            i = idx.ix.get(cur)
            if i is None:
                return cur
            nxt = idx.redirect[i].as_py()
            if not nxt:
                return cur
            cur = nxt
        return cur


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

    def emit_candidates(self, url_hash: str, url: str, rnd: int, ts: float,
                        cand_urls: list[str], backref: str, depth: int,
                        mode: str) -> None:
        """Bulk emit for the dominant event kind — column-level extends
        instead of per-row dict traffic."""
        m = len(cand_urls)
        if not m:
            return
        c = self.cols
        c["kind"].extend(["candidate"] * m)
        c["url_hash"].extend([url_hash] * m)
        c["url"].extend([url] * m)
        c["round"].extend([rnd] * m)
        c["ts"].extend([ts] * m)
        c["cand_url"].extend(cand_urls)
        c["cand_backref"].extend([backref] * m)
        c["cand_depth"].extend([depth] * m)
        c["cand_mode"].extend([mode] * m)
        for name, default in _DEFAULTS.items():
            if not name.startswith("cand_"):
                c[name].extend([default] * m)

    def table(self) -> pa.Table:
        return pa.Table.from_pydict(self.cols, schema=EVENT_SCHEMA)


class Fetcher:
    """``map_batches`` actor: fetch + route one pool batch.

    Site/proxy customisations (SURVEY §2.10) resolve here: ``site_map``
    is the engine's snapshot of :data:`darc_ray.hooks.SITE_REGISTRY`
    (per-hostname crawler hooks, ref darc/sites/__init__.py:124-144);
    ``proxy_map`` snapshots :data:`~darc_ray.hooks.PROXY_REGISTRY` —
    each proxy type's session factory runs once per worker (St4, ref
    darc/proxy/__init__.py:29-50) and is the bootstrap point for proxy
    daemons (St5) in live deployments."""

    def __init__(self, cfg: CrawlConfig, fetch_fn, host_shards: list,
                 site_map: dict | None = None,
                 proxy_map: dict | None = None) -> None:
        self.cfg = cfg
        self.fetch_fn = fetch_fn
        self.host_shards = host_shards     # ray actor handles (or local HostShards in tests)
        self.site_map = site_map or {}
        self.proxy_map = proxy_map or {}
        self._sessions: dict[str, Any] = {}

    def _session_for(self, proxy: str):
        """Per-proxy session, built once per worker PROCESS (St4): the
        factory result lands in the worker-global
        :data:`_PROXY_STATE_CACHE`, so both the actor-pool flavor and
        the stateless-task flavor (fresh stage per batch) bootstrap
        expensive sessions/daemons exactly once per worker."""
        s = self._sessions.get(proxy)
        if s is None:
            factory = self.proxy_map.get(proxy, (None, None))[0]
            s = proxy_state_for("session", proxy, factory, self.fetch_fn)
            self._sessions[proxy] = s
        return s

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

            # site-hook dispatch (crawl.py:172-190): custom crawler per
            # hostname; LinkNoReturn drops (drop=True) or leaves leased
            # (drop=False → "skipped"); other hook errors requeue like
            # the reference's catch-all (crawl.py:234-249)
            site = site_for(host, self.site_map)
            session = self._session_for(proxy)
            extras: dict[str, Any] = {}
            try:
                if site is None:
                    # default GET; a register_proxy session may raise
                    # (requests errors in live deployments) — requeue
                    # the link, never the whole task (crawl.py:182-184)
                    result = session(url)
                else:
                    row = {"url": url, "url_hash": hh, "host": host,
                           "proxy": proxy, "scheme": scheme,
                           "backref": backref, "depth": depth}
                    result = site.crawler(now, session, row)
                # hooks may return (status, mime, body, history, extras)
                # where extras overrides requests metadata fields;
                # unpacking stays INSIDE the try so a hook returning a
                # malformed value (None, wrong arity) requeues that one
                # link instead of killing the whole batch
                if len(result) == 5:
                    status, mime, body, history, extras = result
                else:
                    status, mime, body, history = result
            except LinkNoReturn as e:
                ev.emit("drop" if e.drop else "skipped", hh, url, rnd, now,
                        host=host, proxy=proxy)
                continue
            except Exception:
                ev.emit("requeue", hh, url, rnd, now, host=host, proxy=proxy)
                continue
            if status == 0:                 # RequestException (crawl.py:182-184)
                ev.emit("requeue", hh, url, rnd, now, host=host, proxy=proxy)
                continue

            reason = _REASONS.get(status, "")
            # the redirect chain's terminal URL (response.url): resolve
            # through the session when it followed redirects, so the
            # last hop's Location header points at the real target
            final_url = url
            if history:
                resolve = getattr(session, "resolve", None) or \
                    getattr(self.fetch_fn, "resolve", None)
                if resolve is not None:
                    final_url = resolve(url)
            meta = request_meta(mime, body, history, final_url, extras)

            if mime not in HTML_MIMES:
                # i2p hosts.txt side-channel (crawl.py:200-203)
                if proxy == "i2p" and mime in ("text/plain", "text/text"):
                    ev.emit_candidates(hh, url, rnd, now,
                                       hosts_txt_urls(body.decode("utf-8", "replace")),
                                       url, depth + 1, "now_replace")
                if not keep_mime_mask([mime], cfg)[0]:     # crawl.py:205-207
                    ev.emit("drop", hh, url, rnd, now, host=host, proxy=proxy)
                    continue
                # image payloads: decode + perceptual hash inline (the
                # input_hint fetch→decode hop; engine extension — the
                # reference stores the blob opaquely)
                phash, psnr_ok = 0, True
                if mime in ("image/png", "image/jpeg") and body:
                    phash, psnr_ok = check_image_payload(body, mime)
                ev.emit("page", hh, url, rnd, now, host=host, proxy=proxy,
                        status=status, reason=reason, mime=mime, is_html=False,
                        body=body, backref=backref,
                        backref_hash=_sha(backref), phash=phash, psnr_ok=psnr_ok,
                        **meta)
                continue

            if not body:                    # empty response (crawl.py:216-219)
                ev.emit("requeue", hh, url, rnd, now, host=host, proxy=proxy)
                continue

            ev.emit("page", hh, url, rnd, now, host=host, proxy=proxy,
                    status=status, reason=reason, mime=mime, is_html=True,
                    body=body, backref=backref,
                    backref_hash=_sha(backref), **meta)

            html = body.decode("utf-8", "replace")
            ev.emit_candidates(hh, url, rnd, now, extract_from_html(url, html),
                               url, depth + 1, "zero_nx")

            if 200 <= status < 400:         # response.ok → promote (crawl.py:231-233)
                ev.emit("render", hh, url, rnd, now, host=host, proxy=proxy,
                        backref=backref, cand_url=url, cand_backref=backref,
                        cand_depth=depth, cand_mode="zero_nx")
            else:                           # 4xx/5xx → requeue (crawl.py:227-230)
                ev.emit("requeue", hh, url, rnd, now, host=host, proxy=proxy)

        return ev.table()


PAGE_COLS = ["url_hash", "url", "host", "proxy", "round", "ts", "status", "reason",
             "mime", "is_html", "body", "method", "request_headers",
             "response_headers", "cookies", "session_cookies", "history",
             "backref", "backref_hash", "phash", "psnr_ok"]
ARTIFACT_COLS = ["artifact_kind", "backref", "url", "payload", "artifact_mime",
                 "round", "url_hash"]
RENDER_COLS = ["url_hash", "url", "host", "proxy", "round", "ts"]

# per-round driver summary: detail rows only for kinds whose url_hash
# the driver must act on (requeue → score=now, drop/artifact → drop);
# everything else returns as one (kind, n) count row per task, so
# driver traffic is O(pool), not O(extraction fan-out)
SUMMARY_SCHEMA = pa.schema([
    pa.field("kind", pa.string()),
    pa.field("url_hash", pa.string()),
    pa.field("n", pa.int64()),
])
_DETAIL_KINDS = ("requeue", "drop", "artifact")


def summarize_events(events: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    kinds = events.column("kind")
    detail_mask = pc.is_in(kinds, value_set=pa.array(_DETAIL_KINDS))
    detail = events.filter(detail_mask)
    vc = pc.value_counts(kinds.filter(pc.invert(detail_mask)))
    out_kind = detail.column("kind").to_pylist() + [v["values"] for v in vc.to_pylist()]
    out_hash = detail.column("url_hash").to_pylist() + [""] * len(vc)
    out_n = [1] * detail.num_rows + [v["counts"] for v in vc.to_pylist()]
    return pa.Table.from_pydict(
        {"kind": out_kind, "url_hash": out_hash, "n": out_n}, schema=SUMMARY_SCHEMA)


class FetchProcessStage(Fetcher):
    """Fused per-round stage: fetch/route (Fetcher) + sink writes +
    candidate buffering, one Dataset execution per round.

    Per batch: pages/artifacts/render rows are written directly as
    parquet part files under the round directory (one file per batch —
    the resumable per-partition layout), candidate rows are pushed to
    the frontier shards' round buffers (acknowledged before the task
    returns, so the driver's flush is ordered after them), and only a
    tiny (kind, url_hash) summary flows back for counters and
    requeue/drop application.  This keeps bodies out of the driver and
    collapses what was six Dataset passes into one.
    """

    def __init__(self, cfg, fetch_fn, host_shards: list, frontier_shards: list,
                 num_shards: int, round_dir: str,
                 render_shards: list | None = None,
                 site_map: dict | None = None,
                 proxy_map: dict | None = None) -> None:
        super().__init__(cfg, fetch_fn, host_shards, site_map, proxy_map)
        self.frontier_shards = frontier_shards
        self.num_shards = num_shards
        self.round_dir = round_dir
        self.render_shards = render_shards or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import time
        import uuid

        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import ray

        from darc_ray.functions.hashing import group_indices, shard_of
        from darc_ray.stages.parse import parse_candidates

        _marks = [time.perf_counter()]
        events = super().__call__(batch)
        _marks.append(time.perf_counter())
        kinds = events.column("kind")
        part = uuid.uuid4().hex[:12]

        for kind, cols, sub in (("page", PAGE_COLS, "pages"),
                                ("artifact", ARTIFACT_COLS, "artifacts"),
                                ("render", RENDER_COLS, "render")):
            t = events.filter(pc.equal(kinds, kind))
            if t.num_rows == 0:
                continue
            t = t.select(cols)
            if kind == "artifact":
                t = t.rename_columns(["proxy", "src", "url", "payload", "mime",
                                      "round", "url_hash"])
            d = os.path.join(self.round_dir, sub)
            os.makedirs(d, exist_ok=True)
            pq.write_table(t, os.path.join(d, f"part-{part}.parquet"))
        _marks.append(time.perf_counter())

        cand = events.filter(pc.equal(kinds, "candidate"))
        if cand.num_rows:
            # in-task winner pre-merge: min (backref, depth) per
            # (url, mode) is commutative with the shard-side merge, so
            # deduping locally first shrinks parse work and RPC payload
            # ~3x (pages repeatedly discover the same URLs)
            best: dict = {}
            c_urls = cand.column("cand_url").to_pylist()
            c_backs = cand.column("cand_backref").to_pylist()
            c_depths = cand.column("cand_depth").to_pylist()
            c_modes = cand.column("cand_mode").to_pylist()
            for u, b, d, mo in zip(c_urls, c_backs, c_depths, c_modes):
                key = (u, mo)
                cur = best.get(key)
                if cur is None or (b, d) < cur:
                    best[key] = (b, d)
            merged = pa.Table.from_pydict({
                "cand_url": [k[0] for k in best],
                "cand_backref": [v[0] for v in best.values()],
                "cand_depth": [v[1] for v in best.values()],
                "cand_mode": [k[1] for k in best]})
            parsed = parse_candidates(merged, self.cfg.num_partitions, self.num_shards)
            cols = parsed.to_pydict()
            sid = shard_of(cols["url_hash"], self.num_shards)
            arrs = {c: __import__("numpy").asarray(cols[c], dtype=object)
                    for c in ("url_hash", "url", "proxy", "scheme", "host",
                              "base_host", "backref", "depth", "mode")}
            futures = []
            for s, idx in enumerate(group_indices(sid, self.num_shards)):
                if not len(idx):
                    continue
                sub_cols = {c: arrs[c][idx].tolist() for c in arrs}
                method = self.frontier_shards[s].buffer_candidates
                if hasattr(method, "remote"):
                    futures.append(method.remote(sub_cols))
                else:
                    method(sub_cols)
            if futures:
                ray.get(futures)    # ack before return -> flush is ordered after

        if self.render_shards:
            # save_selenium(single, score=0, nx=True) (crawl.py:233):
            # promotions enter the render frontier via the same
            # commutative candidate buffers
            ren = events.filter(pc.equal(kinds, "render"))
            if ren.num_rows:
                parsed = parse_candidates(ren, self.cfg.num_partitions,
                                          len(self.render_shards))
                rcols = parsed.to_pydict()
                rsid = shard_of(rcols["url_hash"], len(self.render_shards))
                rarrs = {c: __import__("numpy").asarray(rcols[c], dtype=object)
                         for c in ("url_hash", "url", "proxy", "scheme", "host",
                                   "base_host", "backref", "depth", "mode")}
                futures = []
                for s, idx in enumerate(group_indices(rsid, len(self.render_shards))):
                    if not len(idx):
                        continue
                    sub_cols = {c: rarrs[c][idx].tolist() for c in rarrs}
                    method = self.render_shards[s].buffer_candidates
                    if hasattr(method, "remote"):
                        futures.append(method.remote(sub_cols))
                    else:
                        method(sub_cols)
                if futures:
                    ray.get(futures)
        _marks.append(time.perf_counter())

        log_dir = os.environ.get("DARC_RAY_TASKLOG")
        if log_dir:
            spans = [round(b - a, 3) for a, b in zip(_marks, _marks[1:])]
            with open(os.path.join(log_dir, f"{os.getpid()}.det"), "a") as f:
                f.write(f"{batch.num_rows} fetch={spans[0]} write={spans[1]} "
                        f"cand={spans[2]}\n")

        return summarize_events(events)


def fetch_process_batch(batch: pa.Table, *, cfg, fetch_fn, host_shards,
                        frontier_shards, num_shards, round_dir,
                        render_shards=None, site_map=None,
                        proxy_map=None) -> pa.Table:
    """Stateless-task flavor of :class:`FetchProcessStage` — construction
    is trivial (the corpus index AND per-proxy sessions live in
    worker-process-global caches, so St4/St5 state survives across
    batches here too), and plain tasks on warm workers beat a per-round
    actor-pool spin-up.  Deployments that want sessions owned by
    long-lived actors (explicit lifecycle, per-actor teardown) use the
    actor-pool flavor instead (``CrawlConfig.fetch_use_actors``)."""
    import os
    import time

    t0 = time.perf_counter()
    stage = FetchProcessStage(cfg, fetch_fn, host_shards, frontier_shards,
                              num_shards, round_dir, render_shards,
                              site_map, proxy_map)
    out = stage(batch)
    log_dir = os.environ.get("DARC_RAY_TASKLOG")
    if log_dir:
        with open(os.path.join(log_dir, f"{os.getpid()}.log"), "a") as f:
            f.write(f"{batch.num_rows} {time.perf_counter() - t0:.3f} "
                    f"{time.time():.3f}\n")
    return out
