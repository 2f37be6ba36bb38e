"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in ``darc_ray``) initialises or shuts down Ray.

* ``entry()``      — flagship pipeline smoke: a deterministic
  mini-crawl through the full engine (frontier shards → politeness →
  fetch actor pool → extract → enqueue → commit) plus a read of
  ``/root/testdata/sf0.001``; returns the crawled pages table.
* ``queries()``    — one callable per implemented operator family from
  SURVEY.md §2 (see ``darc_ray/pipelines/queries.py`` for the op
  mapping and scale notes).
* ``oracle_sql()`` — DuckDB-equivalent SQL for the relational subset;
  omitted entries are non-SQL-expressible (seeded-LSH/IVF ANN, the
  crawl loop, pixel/PCM feature stages) and get the rows-only check —
  sketches (HLL/CMS/histogram) and the multimodal header scans ARE
  SQL-backed via bit-reproducible integer/hex oracles.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Mini-crawl over the deterministic synthetic corpus; returns the
    pages table as a pandas DataFrame (stable schema, ≥ 0 rows)."""
    import ray.data as rd

    from darc_ray.pipelines.queries import q_crawl_pages

    # touch the driver tables (flagship consumers read sf0.001 too)
    n_docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                             columns=["doc_id"]).count()
    pages = q_crawl_pages("/root/testdata/sf0.001")
    pages = pages.copy()
    pages["corpus_docs"] = n_docs
    return pages


def _ensure_fixture_files() -> None:
    """Many operator families compare Ray and SQL over deterministic
    fixed-path parquet fixtures under /tmp; (re)write ALL of them here
    so the oracle side works no matter which side the driver runs
    first, or whether /tmp was cleared.  Enumerated dynamically —
    every ``ensure_*_fixture()`` in the two fixture modules follows
    the same zero-required-arg ``(path: str = CONST)`` contract, so a
    newly added family can never be silently missing from this list
    again (the round-5 hand-maintained list had drifted 23 fixtures
    behind)."""
    from darc_ray.functions import text as _text
    from darc_ray.stages import multimodal as _mm

    for mod in (_text, _mm):
        for name in sorted(vars(mod)):
            if name.startswith("ensure_") and name.endswith("_fixture"):
                getattr(mod, name)()


def queries() -> dict[str, Callable[[str], Any]]:
    from darc_ray.pipelines.queries import QUERIES

    _ensure_fixture_files()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from darc_ray.pipelines.queries import ORACLE_SQL

    _ensure_fixture_files()
    return dict(ORACLE_SQL)
