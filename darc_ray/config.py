"""Engine configuration.

Mirrors the reference's environment-driven constants
(``/root/reference/darc/const.py:88-158``, ``darc/db.py:96-101``) as one
explicit, picklable dataclass that is broadcast to every stage (it rides
along inside task/actor closures; it is tiny).

Time semantics: the reference uses wall-clock ``time.time()`` for queue
scores and visibility leases (``darc/db.py:637-638,918-977``).  For
deterministic conformance against the oracle simulator we run on a
*logical clock*: each crawl round ``t`` advances ``now`` by exactly
``tick`` seconds.  Wall-clock mode is just ``logical_clock=False``.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field, asdict


@dataclass
class CrawlConfig:
    # --- filter lists (reference: darc/const.py:88-133, darc/parse.py:62-155)
    link_white_list: list[str] = field(default_factory=list)   # host regexes
    link_black_list: list[str] = field(default_factory=list)
    link_fallback: bool = False
    mime_white_list: list[str] = field(default_factory=list)   # mime regexes
    mime_black_list: list[str] = field(default_factory=list)
    mime_fallback: bool = False
    proxy_white_list: list[str] = field(default_factory=list)  # literal proxy types
    proxy_black_list: list[str] = field(default_factory=list)
    proxy_fallback: bool = False

    # --- queue semantics (reference: darc/db.py:96-101, darc/const.py:133-139)
    max_pool: int = 100          # links leased per round per worker (DARC_MAX_POOL)
    time_cache: float = 60.0     # visibility lease / re-crawl TTL seconds (TIME_CACHE)
    host_ttl: float | None = None  # hostname-seen refetch TTL; None = time_cache
                                   # (the reference couples both to TIME_CACHE)
    bulk_size: int = 1000        # write chunking (DARC_BULK_SIZE)

    # --- crawl behaviour (reference: darc/const.py:141-150, darc/crawl.py:168-170)
    force: bool = False          # ignore robots.txt (FORCE)
    check: bool = False          # filter candidates before enqueue (CHECK; ref default 0 —
                                 # filters then apply at fetch time, darc/crawl.py:119-127)
    check_ng: bool = False       # HEAD-probe content-type pre-filter (CHECK_NG,
                                 # darc/parse.py:186-241); implies check
    check_ng_rewrite: bool = False  # replace a probed candidate by the HEAD
                                 # probe's final (post-redirect) URL, ref
                                 # darc/parse.py:240 parse_link(response.
                                 # request.url); queue accounting: old hash
                                 # dropped, final URL enqueued leased
    max_depth: int = -1          # -1 = unbounded (engine extension; reference has none)

    # --- engine layout (Ray-native knobs; no reference equivalent)
    num_partitions: int = 16     # frontier hash partitions (url_hash % P)
    seen_shards: int = 8         # URL-seen actor shards
    host_shards: int = 4         # host-state actor shards
    fetch_concurrency: int = 8   # fetcher actor pool size / max parallel fetch tasks
    fetch_batch_size: int = 256  # frontier rows per fetch batch
    fetch_use_actors: bool = False  # actor pool (session-holding deployments) vs
                                    # stateless tasks (synthetic fetch fabric)
    per_host_cap: int = 64       # max URLs taken per host per round (skew guard)
    workers: int = 1             # multiplies max_pool for the per-round lease budget
    frontier_resident_rows: int = 1_000_000  # per-shard hot-row cap before the
                                 # attr store spills to sorted parquet runs
                                 # (the (score, url_hash) index stays in memory)

    # --- second-stage (render/loader) worker (reference -t loader)
    render_enabled: bool = False  # run the loader phase after each crawl phase

    # --- clock
    logical_clock: bool = True   # deterministic round clock for conformance
    tick: float = 1.0            # seconds a round advances the logical clock

    # --- checkpointing
    snapshot_every: int = 20     # full frontier snapshot cadence (rounds);
                                 # deltas are written every round

    # --- round pipelining: overlap next round's frontier pop with this
    # round's fetch (optimistic, auto-invalidated on ANY frontier
    # mutation — exact fallback) and this round's checkpoint writes
    # with the next round's compute (manifest lands only after its
    # writes are durable, so resume semantics are unchanged)
    overlap_rounds: bool = True

    def fingerprint(self) -> str:
        """Stable hash of the config for checkpoint lineage manifests."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    # Compiled-regex views (compiled lazily, cached per process/actor).
    def compiled_link_white(self) -> list[re.Pattern[str]]:
        return _compile_cached(tuple(self.link_white_list))

    def compiled_link_black(self) -> list[re.Pattern[str]]:
        return _compile_cached(tuple(self.link_black_list))

    def compiled_mime_white(self) -> list[re.Pattern[str]]:
        return _compile_cached(tuple(self.mime_white_list))

    def compiled_mime_black(self) -> list[re.Pattern[str]]:
        return _compile_cached(tuple(self.mime_black_list))


_COMPILE_CACHE: dict[tuple[str, ...], list[re.Pattern[str]]] = {}


def _compile_cached(patterns: tuple[str, ...]) -> list[re.Pattern[str]]:
    got = _COMPILE_CACHE.get(patterns)
    if got is None:
        # reference compiles with re.IGNORECASE (darc/const.py:91,97)
        got = [re.compile(p, re.IGNORECASE) for p in patterns]
        _COMPILE_CACHE[patterns] = got
    return got
