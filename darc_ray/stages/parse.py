"""Candidate parse + canonical first-wins dedup.

``parse_candidates`` vectorizes ``parse_link`` over the round's
candidate events (M1, darc/link.py:228-404) and adds hash / shard /
partition columns; ``winner_rows`` reduces duplicate discoveries of the
same URL within a round to ONE deterministic winner row.

The reference's first-wins is its sequential extraction order (Redis
``SET NX`` + ``ZADD NX``, darc/db.py:644-651); with concurrent
workers that order is racy there too.  We replace it with a canonical
rule — winner = min ``(backref, depth)`` per ``(url_hash, mode)`` —
applied identically by the conformance oracle, so engine runs are
bit-reproducible at any concurrency.  Seen-set and crawl ordering are
unaffected by the rule choice (score does not depend on the winner).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from darc_ray.functions.hashing import partition_of, sha256_hex, shard_of
from darc_ray.functions.link import parse_batch

CANDIDATE_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("url_hash", pa.string()),
    pa.field("proxy", pa.string()),
    pa.field("scheme", pa.string()),
    pa.field("host", pa.string()),
    pa.field("base_host", pa.string()),
    pa.field("backref", pa.string()),
    pa.field("depth", pa.int32()),
    pa.field("partition", pa.int32()),
    pa.field("shard", pa.int32()),
    pa.field("mode", pa.string()),          # zero_nx | now_replace
])


def parse_candidates(events: pa.Table, num_partitions: int, num_shards: int) -> pa.Table:
    """Candidate event rows → classified frontier candidate rows."""
    urls = events.column("cand_url").to_pylist()
    cols = parse_batch(urls)
    hashes = sha256_hex(urls)
    return pa.Table.from_pydict(
        {
            "url": urls,
            "url_hash": hashes,
            "proxy": cols["proxy"],
            "scheme": cols["scheme"],
            "host": cols["host"],
            "base_host": cols["base_host"],
            "backref": events.column("cand_backref").to_pylist(),
            "depth": events.column("cand_depth").to_pylist(),
            "partition": partition_of(hashes, num_partitions),
            "shard": shard_of(hashes, num_shards),
            "mode": events.column("cand_mode").to_pylist(),
        },
        schema=CANDIDATE_SCHEMA,
    )


def winner_rows(group: pd.DataFrame) -> pd.DataFrame:
    """Per (url_hash, mode): keep the canonical winner row."""
    g = group.sort_values(["mode", "backref", "depth"], kind="mergesort")
    return g.drop_duplicates(subset=["mode"], keep="first")
