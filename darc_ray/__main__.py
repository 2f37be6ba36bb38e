"""CLI — the ``python -m darc -t crawler`` surface (reference:
``/root/reference/darc/__main__.py:82-175``) re-expressed for the
Ray-Data engine.

Subcommands::

    python -m darc_ray gen-corpus --out DIR [--seed 42 --hosts 20 --pages 25]
    python -m darc_ray crawl --corpus DIR --out DIR [--rounds N] [--resume]
        [--seeds FILE] [--max-pool N] [--check] [--force] [--cpus N]
    python -m darc_ray status --out DIR

Seed files follow the reference format: one URL per line, blanks and
``#`` comments skipped (``darc/__main__.py:145-157``).  This module is
one of the three allowed Ray-session owners (CLI, bench, tests).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _read_seed_file(path: str) -> list[str]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


def cmd_gen_corpus(args: argparse.Namespace) -> int:
    from darc_ray.pipelines.corpus import make_corpus

    corpus = make_corpus(seed=args.seed, n_hosts=args.hosts,
                         pages_per_host=args.pages)
    corpus.save(args.out)
    print(json.dumps({"out": args.out, "pages": corpus.web.num_rows,
                      "images": corpus.images.num_rows, "seeds": len(corpus.seeds)}))
    return 0


def cmd_crawl(args: argparse.Namespace) -> int:
    import ray

    from darc_ray.config import CrawlConfig
    from darc_ray.pipelines.corpus import Corpus
    from darc_ray.pipelines.crawl import CrawlEngine

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    cfg = CrawlConfig(max_pool=args.max_pool, check=args.check, force=args.force,
                      time_cache=args.ttl, render_enabled=args.render,
                      fetch_concurrency=max(4, args.cpus * 3 // 4))
    if args.resume:
        eng = CrawlEngine.resume(args.corpus, args.out, cfg)
    else:
        eng = CrawlEngine(args.corpus, args.out, cfg)
        if args.seeds:
            seeds = _read_seed_file(args.seeds)
        else:
            seeds = Corpus.load(args.corpus).seeds
        eng.seed(seeds)
    totals = eng.run(args.rounds, stop_on_idle=args.stop_on_idle)
    counts = eng.counts()
    eng.shutdown()
    ray.shutdown()
    print(json.dumps({"rounds": totals.get("rounds"), "taken": totals.get("taken"),
                      "pages": totals.get("pages"), "seen": counts["ever"],
                      "live": counts["live"], "out": args.out}))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run one operator query (optionally against its DuckDB oracle)."""
    import ray

    from darc_ray.pipelines.queries import ORACLE_SQL, QUERIES

    if args.name == "list":
        for name in sorted(QUERIES):
            print(f"{name}\t{'sql-oracle' if name in ORACLE_SQL else 'rows-only'}")
        return 0
    if args.name not in QUERIES:
        print(json.dumps({"error": f"unknown query {args.name!r}"}))
        return 2
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import time as _time

    t0 = _time.perf_counter()
    out = QUERIES[args.name](args.sf_dir)
    if not hasattr(out, "columns"):
        out = out.to_pandas()
    sec = round(_time.perf_counter() - t0, 3)
    result = {"query": args.name, "rows": len(out),
              "columns": list(out.columns), "sec": sec}
    if args.check and args.name in ORACLE_SQL:
        import duckdb

        con = duckdb.connect()
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{args.sf_dir}/{t}.parquet')")
        want = con.sql(ORACLE_SQL[args.name]).df()
        result["oracle_rows"] = len(want)
        result["rows_match"] = len(out) == len(want)
    if owns_ray:           # never tear down a programmatic caller's session
        ray.shutdown()
    print(json.dumps(result))
    if args.head:
        print(out.head(args.head).to_string(index=False))
    return 0


def cmd_status(args: argparse.Namespace) -> int:
    manifests = sorted(n for n in os.listdir(args.out)
                       if n.startswith("manifest_r") and n.endswith(".json"))
    if not manifests:
        print(json.dumps({"rounds_complete": 0}))
        return 0
    with open(os.path.join(args.out, manifests[-1])) as f:
        last = json.load(f)
    print(json.dumps({"rounds_complete": len(manifests),
                      "last_round": last["round"], "metrics": last["metrics"]}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="darc_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-corpus", help="generate the synthetic deterministic web")
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--hosts", type=int, default=20)
    g.add_argument("--pages", type=int, default=25)
    g.set_defaults(fn=cmd_gen_corpus)

    c = sub.add_parser("crawl", help="run the crawl round loop")
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--seeds", help="seed file (default: corpus seed list)")
    c.add_argument("--rounds", type=int, default=8)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--stop-on-idle", action="store_true")
    c.add_argument("--max-pool", type=int, default=1000)
    c.add_argument("--ttl", type=float, default=2.0)
    c.add_argument("--check", action="store_true", help="CHECK-time candidate filter")
    c.add_argument("--force", action="store_true", help="ignore robots.txt")
    c.add_argument("--render", action="store_true",
                   help="run the second-stage loader phase each round (-t loader)")
    c.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    c.set_defaults(fn=cmd_crawl)

    q = sub.add_parser("query", help="run one operator query ('list' to enumerate)")
    q.add_argument("name", help="query name from the registry, or 'list'")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    q.add_argument("--check", action="store_true",
                   help="also run the DuckDB oracle and compare row counts")
    q.add_argument("--head", type=int, default=0, help="print the first N rows")
    q.set_defaults(fn=cmd_query)

    s = sub.add_parser("status", help="checkpoint status of an output dir")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_status)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
