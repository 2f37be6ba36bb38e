"""The render (loader) stage: darc's second-stage selenium worker
(``/root/reference/darc/crawl.py:254-354``) as a batch stage.

Semantics mirrored:

* the render queue is a full frontier (same score/lease/nx arithmetic,
  ``darc/db.py:665-865``); promotion enqueues ``score=0, nx``
  (crawl.py:233); a successful render is NOT dropped (re-rendered after
  the TTL), failures/empty pages requeue ``score=now``
  (crawl.py:311-337).
* the rendered ``page_source`` is submitted with a full-page PNG
  screenshot whose window rule is the reference's
  (1024 × ⌈max(h, 1000)·1.1⌉, crawl.py:332-343).
* extracted links go back to the **requests** frontier (``score=0 nx``,
  crawl.py:349) — the two queues form the reference's
  producer/consumer cycle.

**The browser is a STUB** (no Chrome in this environment): page_source
is the fetch fabric's body (our synthetic DOM needs no JS), and the
screenshot is a deterministic seeded PNG standing in for CDP capture —
the queue plumbing, schema, scheduling and extraction are real; the
pixels are not a browser's.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from darc_ray.hooks import LinkNoReturn, site_for

SE_EMPTY = "<html><head></head><body></body></html>"   # darc/const.py:149-150

RENDERED_COLS = ["url_hash", "url", "host", "proxy", "round", "ts", "doc",
                 "screenshot", "width", "height"]

RENDER_SUMMARY_SCHEMA = pa.schema([
    pa.field("kind", pa.string()),       # rendered | requeue | drop | candidate-count rows
    pa.field("url_hash", pa.string()),
])


def synth_screenshot(url_hash: str, height: int) -> bytes:
    """Deterministic PNG stand-in for the CDP full-page capture
    (STUB — see module docstring); seeded by the url hash so renders
    are reproducible and conformance-checkable."""
    from darc_ray.functions.image import png_encode

    rng = np.random.default_rng(int(url_hash[:12], 16))
    h = min(96, max(16, height // 32))
    w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 90 * np.sin(2 * np.pi * (xx + yy) / (w / 2))
    pix = np.clip(base[..., None] + rng.integers(-15, 16, (h, w, 3)),
                  0, 255).astype(np.uint8)
    return png_encode(pix)


def window_height(doc: str) -> int:
    """The reference's sizing rule with document length standing in for
    ``document.body.scrollHeight`` (no browser): ⌈max(h, 1000)·1.1⌉."""
    return math.ceil(max(len(doc), 1000) * 1.1)


class RenderProcessStage:
    """Fused render round stage: render + write + candidate buffering,
    mirroring :class:`~darc_ray.stages.fetch.FetchProcessStage`.

    Loader-side site hooks dispatch per hostname from ``site_map``
    (ref darc/crawl.py:306, loader_hook); ``proxy_map`` driver
    factories resolve once per worker — the seam where a real
    ``selenium.Chrome`` with proxy capabilities plugs in (ref
    darc/selenium.py:47-240; the browser itself is stubbed here)."""

    def __init__(self, cfg, fetch_fn, requests_shards: list, num_shards: int,
                 round_dir: str, site_map: dict | None = None,
                 proxy_map: dict | None = None) -> None:
        self.cfg = cfg
        self.fetch_fn = fetch_fn
        self.requests_shards = requests_shards
        self.num_shards = num_shards
        self.round_dir = round_dir
        self.site_map = site_map or {}
        self.proxy_map = proxy_map or {}
        self._drivers: dict = {}

    def _driver_for(self, proxy: str):
        """Per-proxy driver, built once per worker PROCESS: resolved
        through the worker-global proxy-state cache (shared with the
        fetch stage), so a real ``register_proxy`` driver factory
        (Chrome launch, ref darc/selenium.py:47-69) runs once per
        worker even in the stateless-task flavor where this stage is
        constructed per batch."""
        from darc_ray.stages.fetch import proxy_state_for

        d = self._drivers.get(proxy)
        if d is None:
            factory = self.proxy_map.get(proxy, (None, None))[1]
            d = proxy_state_for("driver", proxy, factory, self.fetch_fn)
            self._drivers[proxy] = d
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        import uuid

        import pyarrow.parquet as pq
        import ray

        from darc_ray.functions.extract import extract_from_html
        from darc_ray.functions.hashing import group_indices, shard_of
        from darc_ray.stages.fetch import ARTIFACT_PROXIES
        from darc_ray.stages.parse import parse_candidates

        cols = batch.to_pydict()
        n = len(cols["url"])
        out_kind: list[str] = []
        out_hash: list[str] = []
        rendered = {c: [] for c in RENDERED_COLS}
        cand = {"cand_url": [], "cand_backref": [], "cand_depth": [],
                "cand_mode": []}

        for i in range(n):
            url = cols["url"][i]
            hh = cols["url_hash"][i]
            proxy = cols["proxy"][i]
            rnd = int(cols["round"][i])
            now = float(cols["now"][i])
            depth = int(cols["depth"][i])

            # sentinel sites raise LinkNoReturn in their loader hooks →
            # drop (darc/sites/*.py:46-54); unreachable for normal flow
            if proxy in ARTIFACT_PROXIES or cols["scheme"][i] not in ("http", "https"):
                out_kind.append("drop")
                out_hash.append(hh)
                continue

            # loader-side site hook (crawl.py:306): custom loader per
            # hostname; LinkNoReturn drops/keeps; other errors requeue
            # (WebDriverException analog, crawl.py:311-321)
            site = site_for(cols["host"][i], self.site_map)
            driver = self._driver_for(proxy)
            try:
                if site is None:
                    status, _mime, body, _h = driver(url)
                    if status == 0:
                        raise ConnectionError(url)
                    doc = body.decode("utf-8", "replace")
                else:
                    row = {"url": url, "url_hash": hh, "host": cols["host"][i],
                           "proxy": proxy, "scheme": cols["scheme"][i],
                           "backref": cols["backref"][i], "depth": depth}
                    doc = site.loader(now, driver, row)
            except LinkNoReturn as e:
                out_kind.append("drop" if e.drop else "skipped")
                out_hash.append(hh)
                continue
            except Exception:
                out_kind.append("requeue")
                out_hash.append(hh)
                continue
            if not doc or doc == SE_EMPTY:        # SE_EMPTY check (crawl.py:327-330)
                out_kind.append("requeue")
                out_hash.append(hh)
                continue

            height = window_height(doc)
            rendered["url_hash"].append(hh)
            rendered["url"].append(url)
            rendered["host"].append(cols["host"][i] or "")
            rendered["proxy"].append(proxy)
            rendered["round"].append(rnd)
            rendered["ts"].append(now)
            rendered["doc"].append(doc)
            rendered["screenshot"].append(synth_screenshot(hh, height))
            rendered["width"].append(1024)
            rendered["height"].append(height)
            out_kind.append("rendered")
            out_hash.append(hh)

            for u in extract_from_html(url, doc):  # → requests queue (crawl.py:349)
                cand["cand_url"].append(u)
                cand["cand_backref"].append(url)
                cand["cand_depth"].append(depth + 1)
                cand["cand_mode"].append("zero_nx")

        if rendered["url_hash"]:
            d = os.path.join(self.round_dir, "rendered")
            os.makedirs(d, exist_ok=True)
            t = pa.Table.from_pydict({
                **{c: rendered[c] for c in ("url_hash", "url", "host", "proxy")},
                "round": pa.array(rendered["round"], type=pa.int32()),
                "ts": pa.array(rendered["ts"], type=pa.float64()),
                "doc": pa.array(rendered["doc"], type=pa.large_string()),
                "screenshot": pa.array(rendered["screenshot"], type=pa.binary()),
                "width": pa.array(rendered["width"], type=pa.int32()),
                "height": pa.array(rendered["height"], type=pa.int32()),
            })
            pq.write_table(t, os.path.join(d, f"part-{uuid.uuid4().hex[:12]}.parquet"))

        if cand["cand_url"]:
            # in-task winner pre-merge (commutative; see FetchProcessStage)
            best: dict = {}
            for u, b, dd, mo in zip(cand["cand_url"], cand["cand_backref"],
                                    cand["cand_depth"], cand["cand_mode"]):
                key = (u, mo)
                cur = best.get(key)
                if cur is None or (b, dd) < cur:
                    best[key] = (b, dd)
            merged = pa.Table.from_pydict({
                "cand_url": [k[0] for k in best],
                "cand_backref": [v[0] for v in best.values()],
                "cand_depth": [v[1] for v in best.values()],
                "cand_mode": [k[1] for k in best]})
            parsed = parse_candidates(merged, self.cfg.num_partitions, self.num_shards)
            pc = parsed.to_pydict()
            sid = shard_of(pc["url_hash"], self.num_shards)
            arrs = {c: np.asarray(pc[c], dtype=object)
                    for c in ("url_hash", "url", "proxy", "scheme", "host",
                              "base_host", "backref", "depth", "mode")}
            futures = []
            for s, idx in enumerate(group_indices(sid, self.num_shards)):
                if not len(idx):
                    continue
                sub = {c: arrs[c][idx].tolist() for c in arrs}
                method = self.requests_shards[s].buffer_candidates
                if hasattr(method, "remote"):
                    futures.append(method.remote(sub))
                else:
                    method(sub)
            if futures:
                ray.get(futures)

        return pa.Table.from_pydict({"kind": out_kind, "url_hash": out_hash},
                                    schema=RENDER_SUMMARY_SCHEMA)


def render_process_batch(batch: pa.Table, *, cfg, fetch_fn, requests_shards,
                         num_shards, round_dir, site_map=None,
                         proxy_map=None) -> pa.Table:
    """Stateless-task flavor of :class:`RenderProcessStage` — stage
    construction is trivial because all per-proxy driver state resolves
    through the worker-global cache (``fetch.proxy_state_for``); live
    browser deployments use the actor-pool flavor
    (``CrawlConfig.fetch_use_actors``) instead, mirroring the fetch
    stage's two flavors."""
    return RenderProcessStage(cfg, fetch_fn, requests_shards, num_shards,
                              round_dir, site_map, proxy_map)(batch)
