"""Canonical Arrow schemas for every logical table the engine touches.

These replace the reference's peewee models + Redis sorted sets
(``/root/reference/darc/model/tasks/*.py``, ``darc/model/web/*.py``) and
its per-page filesystem layout (``darc/save.py:9-40``) with columnar
tables.  One ``ray.data.Dataset`` per logical table; blocks are Arrow.

The ``IMAGES`` schema is the authoritative payload shape from
``BASELINE.json`` ``input_hint``.
"""

from __future__ import annotations

import pyarrow as pa

# The frontier: one row per pending URL (reference: queue_requests —
# darc/model/tasks/requests.py:31-42 + Redis zset semantics darc/db.py:644-651).
# ``score`` is the priority timestamp; ``url_hash`` the sha256 of the url
# (darc/link.py:394); ``partition`` = hash64(url_hash) % P for layout.
FRONTIER = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("url_hash", pa.string()),
        pa.field("proxy", pa.string()),
        pa.field("scheme", pa.string()),
        pa.field("host", pa.string()),
        pa.field("backref", pa.string()),       # provenance (darc/link.py:197); "" for seeds
        pa.field("score", pa.float64()),
        pa.field("depth", pa.int32()),
        pa.field("partition", pa.int32()),
    ]
)

# Second-stage (render) queue — same shape as FRONTIER
# (reference: queue_selenium, darc/model/tasks/selenium.py).
RENDER_QUEUE = FRONTIER

# Fetched pages (reference: RequestsModel + RequestsHistoryModel,
# darc/model/web/requests.py:36-103, plus the save_headers JSON sink
# darc/save.py:136-220).
PAGES = pa.schema(
    [
        pa.field("url_hash", pa.string()),
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("proxy", pa.string()),
        pa.field("round", pa.int32()),
        pa.field("ts", pa.float64()),           # logical or wall-clock fetch time
        pa.field("status", pa.int32()),
        pa.field("reason", pa.string()),
        pa.field("mime", pa.string()),
        pa.field("is_html", pa.bool_()),
        pa.field("body", pa.large_binary()),
        pa.field("history", pa.list_(pa.struct([
            pa.field("url", pa.string()),
            pa.field("status", pa.int32()),
        ]))),
        pa.field("partition", pa.int32()),
    ]
)

# The link graph (reference: URLThroughModel unique (parent, child),
# darc/model/web/url.py:111-123).
EDGES = pa.schema(
    [
        pa.field("parent_hash", pa.string()),
        pa.field("child_hash", pa.string()),
    ]
)

# Per-host facts (reference: HostnameModel darc/model/web/hostname.py:43-105
# + RobotsModel / SitemapModel / HostsModel artifact docs).
HOSTS = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("proxy", pa.string()),
        pa.field("discovery", pa.float64()),    # first-seen ts (A2)
        pa.field("last_seen", pa.float64()),
        pa.field("alive", pa.bool_()),
        pa.field("robots", pa.string()),
        pa.field("sitemaps", pa.list_(pa.string())),
    ]
)

# Non-fetchable address sinks (reference: the ten misc JSONL sinks,
# darc/proxy/bitcoin.py:27-42 pattern + data-URI sink darc/proxy/data.py:33-56).
ARTIFACTS = pa.schema(
    [
        pa.field("proxy", pa.string()),         # bitcoin/ethereum/ed2k/magnet/mail/tel/irc/ws/script/data/invalid
        pa.field("src", pa.string()),           # backref url ("" if none)
        pa.field("url", pa.string()),
        pa.field("payload", pa.large_binary()), # decoded data-URI bytes; empty otherwise
        pa.field("mime", pa.string()),          # data-URI declared mime; "" otherwise
    ]
)

# The image+caption payload table (authoritative: BASELINE.json input_hint).
IMAGES = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
    ]
)

# Per-round, per-stage metrics (north rule: per-partition lineage + metrics).
METRICS = pa.schema(
    [
        pa.field("round", pa.int32()),
        pa.field("stage", pa.string()),
        pa.field("partition", pa.int32()),      # -1 = whole round
        pa.field("key", pa.string()),
        pa.field("value", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
