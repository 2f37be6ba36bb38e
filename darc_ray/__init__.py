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
  (parse, gate, fetch, route, extract, dedup, ANN).
* ``darc_ray.pipelines`` — the crawl round-loop engine, the synthetic
  deterministic web corpus, and the single-threaded reference-semantics
  oracle used for conformance testing.

Nothing in this package calls ``ray.init()`` — sessions are owned by
the caller (driver harness, ``bench.py``, or the pytest fixture).
"""

__version__ = "0.1.0"
