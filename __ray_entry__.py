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
    """The multimodal header-scan families (image/audio/video_metadata)
    compare Ray and SQL over deterministic fixed-path parquet fixtures
    under /tmp; (re)write them here so the oracle side works no matter
    which side the driver runs first, or whether /tmp was cleared."""
    from darc_ray.functions.text import (ensure_html_fixture,
                                         ensure_lines_fixture,
                                         ensure_pii_fixture,
                                         ensure_repetition_fixture)
    from darc_ray.stages.multimodal import (ensure_audio_meta_fixture,
                                            ensure_audio_pcm_fixture,
                                            ensure_caption_tokens_fixture,
                                            ensure_image_aesthetic_fixture,
                                            ensure_image_blocky_fixture,
                                            ensure_image_borders_fixture,
                                            ensure_image_caption_fixture,
                                            ensure_image_dhash_fixture,
                                            ensure_image_exposure_fixture,
                                            ensure_image_logo_fixture,
                                            ensure_image_meta_fixture,
                                            ensure_image_pixels_fixture,
                                            ensure_image_rot_fixture,
                                            ensure_image_tiles_fixture,
                                            ensure_video_meta_fixture)

    ensure_image_meta_fixture()
    ensure_image_pixels_fixture()
    ensure_image_borders_fixture()
    ensure_image_blocky_fixture()
    ensure_image_exposure_fixture()
    ensure_image_aesthetic_fixture()
    ensure_image_caption_fixture()
    ensure_image_dhash_fixture()
    ensure_image_logo_fixture()
    ensure_image_rot_fixture()
    ensure_image_tiles_fixture()
    ensure_audio_meta_fixture()
    ensure_audio_pcm_fixture()
    ensure_caption_tokens_fixture()
    ensure_video_meta_fixture()
    ensure_pii_fixture()
    ensure_lines_fixture()
    ensure_repetition_fixture()
    ensure_html_fixture()


def queries() -> dict[str, Callable[[str], Any]]:
    from darc_ray.pipelines.queries import QUERIES

    _ensure_fixture_files()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from darc_ray.pipelines.queries import ORACLE_SQL

    _ensure_fixture_files()
    return dict(ORACLE_SQL)
