"""Candidate parse: vectorizes ``parse_link`` over the round's
candidate events (M1, darc/link.py:228-404) and adds hash / shard /
partition columns.

First-wins determinism: the reference's first-wins is its sequential
extraction order (Redis ``SET NX`` + ``ZADD NX``, darc/db.py:644-651);
with concurrent workers that order is racy there too.  This engine
replaces it with a canonical rule — winner = min ``(backref, depth)``
per ``(url_hash, mode)`` — applied by the frontier shards' round
buffers (``FrontierShard.buffer_candidates``, a commutative min-merge)
and identically by the conformance oracle, so engine runs are
bit-reproducible at any concurrency.  Seen-set and crawl ordering are
unaffected by the rule choice (the score does not depend on the
winner).
"""

from __future__ import annotations

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
