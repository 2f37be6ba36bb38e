"""darc_ray — a Ray-Data-native crawl/data-processing engine.

A from-scratch reimplementation of the query & data-processing
capabilities of JarryShaw/darc (reference at /root/reference, studied
for *behavior only*) re-expressed as idiomatic Ray Data pipelines:

* ``darc_ray.functions`` — pure, vectorizable kernels (URL parsing /
  classification, link extraction, filters, robots rules, sitemaps,
  image codecs, text analysis, hashing / sketches).
* ``darc_ray.sources``   — table IO (Lance-or-Parquet shim), seed readers.
* ``darc_ray.state``     — stateful services as Ray actors (sharded
  URL-seen set, host-state / politeness shards, checkpoint manifests).
* ``darc_ray.stages``    — ``Dataset.map_batches`` stage callables
  (parse, gate, fetch, render, dedup, ANN, multimodal).
* ``darc_ray.pipelines`` — the crawl round-loop engine, the synthetic
  deterministic web corpus, the single-threaded reference-semantics
  oracle, and the driver-contract queries.

Library surface (the reference's ``from darc import darc, register_*``
embedding, darc/__init__.py:48-52)::

    from darc_ray import CrawlConfig, CrawlEngine, make_corpus
    from darc_ray import BaseSite, register_sites      # per-hostname hooks
    from darc_ray import register_proxy                # session/driver factories
    from darc_ray import register_hooks, WorkerBreak   # between-round hooks
    from darc_ray import register_url_pattern          # DARC_URL_PAT hook

Nothing in this package calls ``ray.init()`` — sessions are owned by
the caller (driver harness, ``bench.py``, CLI, or the pytest fixture).
"""

__version__ = "0.1.0"

from darc_ray.config import CrawlConfig                          # noqa: E402
from darc_ray.functions.extract import register_url_pattern      # noqa: E402
from darc_ray.hooks import (                                     # noqa: E402
    BaseSite, LinkNoReturn, WorkerBreak, register_hooks, register_proxy,
    register_sites,
)


def __getattr__(name):
    # heavier symbols resolved lazily so `import darc_ray` stays light
    if name == "CrawlEngine":
        from darc_ray.pipelines.crawl import CrawlEngine

        return CrawlEngine
    if name == "make_corpus":
        from darc_ray.pipelines.corpus import make_corpus

        return make_corpus
    if name == "simulate":
        from darc_ray.pipelines.oracle import simulate

        return simulate
    raise AttributeError(name)


__all__ = ["CrawlConfig", "CrawlEngine", "make_corpus", "simulate",
           "register_url_pattern", "BaseSite", "LinkNoReturn", "WorkerBreak",
           "register_sites", "register_proxy", "register_hooks", "__version__"]
