"""Distributed graph kernels over edge Datasets.

Link-graph analytics for the crawl's `edges` table (parent_hash →
child_hash; ref darc stores it as ``URLThroughModel``,
``darc/model/web/url.py:111-123``) at web scale, where NO driver-side
structure may grow with node or edge cardinality:

* :func:`dedup_edges` — exact distinct (src, dst) with a combiner pass
  before ONE pair-key hash shuffle.
* :func:`out_degrees` — exact per-src out-degree via partial counts +
  src-keyed hash shuffle (never a whole-graph driver combine).
* :func:`degree_histogram` — (out_degree, n_srcs) profile; only the
  tiny per-partition histogram partials reach the driver.
* :func:`pagerank` — synchronous iterations with the rank vector kept
  as a DISTRIBUTED Dataset: per iteration one src-keyed hash join
  (ranks onto edges) and one dst-keyed shuffle (contribution sums).
  All arithmetic is scaled-integer (``r // outdeg`` per edge,
  ``base + damping·Σ // 100``), so sums are order-independent and the
  result is bit-identical to the broadcast-vector flavor in
  ``pipelines/queries.py`` and to the unrolled SQL oracle on any
  partitioning.

Dangling nodes (no out-edges) contribute no mass — the same
simplification as the broadcast flavor and the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["dedup_edges", "out_degrees", "degree_histogram",
           "degree_histogram_raw", "pagerank", "hits_two_step"]


def _hash_parts(ds, keys: list[str], n_blocks: int):
    """Hash-repartition so every row of a key lands in one partition."""
    from ray.data.context import ShuffleStrategy

    parts = ds.repartition(num_blocks=n_blocks, keys=keys, sort=False)
    parts.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return parts


def dedup_edges(ds, src_col: str, dst_col: str, n_blocks: int = 16):
    """Exact distinct (src, dst) edge set as a Dataset[src, dst].

    Combiner dedup inside map_batches first (drops the bulk of
    duplicates pre-shuffle), then ONE pair-key hash shuffle and a
    per-partition exact dedup — each partition owns every copy of its
    pairs, so the result is globally distinct without a sorted groupby.
    """
    combined = ds.map_batches(
        lambda t: t.group_by([src_col, dst_col]).aggregate([]),
        batch_format="pyarrow", batch_size=65536)
    parts = _hash_parts(combined, [src_col, dst_col], n_blocks)
    return parts.map_batches(
        lambda t: (t.group_by([src_col, dst_col]).aggregate([])
                   .rename_columns(["src", "dst"])),
        batch_format="pyarrow", batch_size=None).materialize()


def out_degrees(edges, n_blocks: int = 16):
    """Exact per-src out-degree as Dataset[src, d] over a distinct edge
    set — per-batch partial counts, then a src-keyed hash shuffle and a
    per-partition vectorized sum.  Nothing node-sized touches the
    driver."""
    partials = edges.map_batches(
        lambda t: (t.group_by("src").aggregate([("dst", "count")])
                   .rename_columns(["src", "d"])),
        batch_format="pyarrow", batch_size=65536)
    parts = _hash_parts(partials, ["src"], n_blocks)
    return parts.map_batches(
        lambda t: (t.group_by("src").aggregate([("d", "sum")])
                   .rename_columns(["src", "d"])),
        batch_format="pyarrow", batch_size=None).materialize()


def degree_histogram(edges, n_blocks: int = 16) -> pd.DataFrame:
    """(out_degree, n_srcs) histogram of a distinct edge set.

    Degrees are computed exactly by :func:`out_degrees` (src-keyed
    shuffle); each degree partition then emits its own tiny
    (out_degree, n) partial, so the driver combine is bounded by
    n_blocks × distinct-degree-values — independent of node count."""
    deg = out_degrees(edges, n_blocks)
    partials = (deg.map_batches(
        lambda t: (t.group_by("d").aggregate([("src", "count")])
                   .rename_columns(["out_degree", "n_srcs"])),
        batch_format="pyarrow", batch_size=None).to_pandas())
    out = partials.groupby("out_degree", as_index=False)["n_srcs"].sum()
    out["out_degree"] = out["out_degree"].astype("int64")
    out["n_srcs"] = out["n_srcs"].astype("int64")
    return out.sort_values("out_degree").reset_index(drop=True)


def degree_histogram_raw(ds, src_col: str, dst_col: str,
                         n_blocks: int = 16) -> pd.DataFrame:
    """(out_degree, n_srcs) straight from a RAW (duplicated) edge
    stream in ONE src-keyed shuffle: a partition that owns every row
    of a src can dedup that src's pairs and count its distinct dsts
    locally, so the separate pair-keyed distinct pass (and its whole
    extra shuffle) is unnecessary.  Per-batch drop_duplicates is the
    pre-shuffle combiner; only n_blocks × distinct-degree-values
    partial rows reach the driver — independent of node count."""
    combined = ds.map_batches(
        lambda t: t.group_by([src_col, dst_col]).aggregate([]),
        batch_format="pyarrow", batch_size=65536)
    parts = _hash_parts(combined, [src_col], n_blocks)

    def hist_of_partition(t):
        deg = (t.group_by([src_col, dst_col]).aggregate([])
               .group_by(src_col).aggregate([(dst_col, "count")]))
        return (deg.group_by(f"{dst_col}_count")
                .aggregate([(src_col, "count")])
                .rename_columns(["out_degree", "n_srcs"]))

    partials = (parts.map_batches(hist_of_partition, batch_format="pyarrow",
                                  batch_size=None).to_pandas())
    out = partials.groupby("out_degree", as_index=False)["n_srcs"].sum()
    out["out_degree"] = out["out_degree"].astype("int64")
    out["n_srcs"] = out["n_srcs"].astype("int64")
    return out.sort_values("out_degree").reset_index(drop=True)


def pagerank(edges, iterations: int = 4, scale: int = 1_000_000,
             damping_num: int = 85, damping_den: int = 100,
             n_blocks: int = 16, topk: int = 20) -> pd.DataFrame:
    """Distributed integer PageRank over a distinct edge Dataset.

    The rank vector is a Dataset[node, r] for the whole run; per
    iteration:

    1. src-keyed hash join of ranks onto (src, dst, d) edge rows,
    2. per-batch partial contribution sums ``c = r // d`` per dst,
    3. union with per-node zero rows (so rank-less nodes keep the
       base term — replaces a left-outer join with pure inner
       machinery), one dst-keyed hash shuffle, per-partition sum,
    4. ``r' = base + damping·Σ // den`` vectorized per partition.

    Only the final top-k leaves the cluster: each rank partition emits
    its local top-k and the driver merges ≤ n_blocks·k rows.
    """
    base = (scale * (damping_den - damping_num)) // damping_den

    deg = out_degrees(edges, n_blocks)
    edges_deg = (edges.join(deg, "inner", n_blocks, on=("src",))
                 .select_columns(["src", "dst", "d"]).materialize())

    import pyarrow as pa

    def side(col):
        return lambda t: (t.group_by(col).aggregate([])
                          .rename_columns(["node"]))

    nodes = (_hash_parts(
        edges.map_batches(side("src"), batch_format="pyarrow",
                          batch_size=65536)
        .union(edges.map_batches(side("dst"), batch_format="pyarrow",
                                 batch_size=65536)),
        ["node"], n_blocks)
        .map_batches(lambda t: t.group_by("node").aggregate([]),
                     batch_format="pyarrow", batch_size=None).materialize())

    def const_col(name, val):
        return lambda t: t.append_column(
            name, pa.array(np.full(t.num_rows, val, dtype=np.int64),
                           type=pa.int64()))

    ranks = nodes.map_batches(const_col("r", scale),
                              batch_format="pyarrow",
                              batch_size=None).materialize()
    zeros = nodes.map_batches(const_col("s", 0),
                              batch_format="pyarrow",
                              batch_size=None).materialize()

    def contrib(t: pa.Table) -> pa.Table:
        c = (t.column("r").to_numpy(zero_copy_only=False)
             // t.column("d").to_numpy(zero_copy_only=False))
        part = pa.table({"node": t.column("dst"),
                         "s": pa.array(c, type=pa.int64())})
        return (part.group_by("node").aggregate([("s", "sum")])
                .rename_columns(["node", "s"]))

    def update(t: pa.Table) -> pa.Table:
        g = (t.group_by("node").aggregate([("s", "sum")])
             .rename_columns(["node", "s"]))
        r = base + (damping_num
                    * g.column("s").to_numpy(zero_copy_only=False)
                    ) // damping_den
        return pa.table({"node": g.column("node"),
                         "r": pa.array(r, type=pa.int64())})

    for _ in range(iterations):
        joined = (edges_deg.join(ranks, "inner", n_blocks,
                                 on=("src",), right_on=("node",))
                  .select_columns(["dst", "d", "r"]))
        partial = joined.map_batches(contrib, batch_format="pyarrow",
                                     batch_size=65536)
        ranks = (_hash_parts(partial.union(zeros), ["node"], n_blocks)
                 .map_batches(update, batch_format="pyarrow",
                              batch_size=None).materialize())

    def local_top(t: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            t, sort_keys=[("r", "descending"), ("node", "ascending")])
        return t.take(idx[:topk])

    out = (ranks.map_batches(local_top, batch_format="pyarrow",
                             batch_size=None).to_pandas()
           .sort_values(["r", "node"], ascending=[False, True],
                        kind="mergesort").head(topk))
    return (out.rename(columns={"node": "node", "r": "rank"})
            .astype({"node": "int64", "rank": "int64"})
            .reset_index(drop=True))


def hits_two_step(edges, k: int = 20, n_blocks: int = 16) -> pd.DataFrame:
    """Two-step UNNORMALIZED integer HITS over a distinct (src, dst)
    edge Dataset — the hub/authority complement to :func:`pagerank`
    whose recursion stays in exact int64 (a₀ ≡ 1, so h₁ = outdeg,
    a₂(d) = Σ_{(s,d)} outdeg(s), h₃(s) = Σ_{(s,d)} a₂(d); no damping,
    no normalization, no float anywhere — order-independent sums make
    the result bit-identical on any partitioning and let a plain-join
    SQL oracle hash-match).  Three key exchanges, zero broadcasts:

    1. src-keyed — a partition owning every edge of a src attaches
       outdeg in place;
    2. dst-keyed — a partition owning every edge of a dst computes
       a₂ exactly AND emits a tagged union: per-partition top-k auth
       rows (kind 1) + per-edge (src, a₂) hub contributions (kind 0);
    3. src-keyed over the kind-0 rows — exact h₃ + per-partition
       top-k.

    Driver traffic is k·n_blocks candidate rows per side — independent
    of node and edge cardinality.  Ties break toward the smaller node
    id under a (score desc, node asc) total order."""
    import pyarrow as pa

    parts = _hash_parts(edges, ["src"], n_blocks)

    def attach_w(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return pa.table({"src": pa.array([], type=pa.int64()),
                             "dst": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        w = df.groupby("src")["dst"].transform("size")
        return pa.table({"src": df["src"].astype("int64"),
                         "dst": df["dst"].astype("int64"),
                         "w": w.astype("int64")})

    wed = parts.map_batches(attach_w, batch_format="pyarrow",
                            batch_size=None)

    parts2 = _hash_parts(wed, ["dst"], n_blocks)

    def auth_union(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        empty = {"kind": pa.array([], type=pa.int64()),
                 "node": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.int64())}
        if not len(df):
            return pa.table(empty)
        a2 = df.groupby("dst", as_index=False)["w"].sum() \
               .rename(columns={"dst": "node", "w": "score"})
        top = a2.sort_values(["score", "node"],
                             ascending=[False, True]).head(k)
        contrib = df.merge(a2, left_on="dst", right_on="node")
        return pa.table({
            "kind": pa.array(np.concatenate([
                np.ones(len(top), dtype=np.int64),
                np.zeros(len(contrib), dtype=np.int64)])),
            "node": pa.array(np.concatenate([
                top["node"].to_numpy(np.int64),
                contrib["src"].to_numpy(np.int64)])),
            "score": pa.array(np.concatenate([
                top["score"].to_numpy(np.int64),
                contrib["score"].to_numpy(np.int64)]))})

    un = parts2.map_batches(auth_union, batch_format="pyarrow",
                            batch_size=None).materialize()

    auth = (un.filter(expr="kind == 1").to_pandas()
            .sort_values(["score", "node"], ascending=[False, True])
            .head(k).reset_index(drop=True))

    hub_parts = _hash_parts(un.filter(expr="kind == 0"), ["node"],
                            n_blocks)

    def hub_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return pa.table({"node": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.int64())})
        h3 = df.groupby("node", as_index=False)["score"].sum()
        top = h3.sort_values(["score", "node"],
                             ascending=[False, True]).head(k)
        return pa.table({"node": top["node"].to_numpy(np.int64),
                         "score": top["score"].to_numpy(np.int64)})

    hub = (hub_parts.map_batches(hub_topk, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
           .sort_values(["score", "node"], ascending=[False, True])
           .head(k).reset_index(drop=True))

    auth.insert(0, "side", "auth")
    hub.insert(0, "side", "hub")
    out = pd.concat([auth[["side", "node", "score"]],
                     hub[["side", "node", "score"]]], ignore_index=True)
    return (out.sort_values(["side", "score", "node"],
                            ascending=[True, False, True])
            .reset_index(drop=True))
