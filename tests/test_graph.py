"""Distributed graph kernels (stages/graph.py) and their routing.

Covers the round-4 scale fixes: pagerank's no-broadcast path,
degree_hist's src-keyed reduce, dedup_clusters' distributed
connected-components rung, and pointer-doubling convergence on a
planted 10^5-link chain."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return (df.sort_values(list(df.columns), kind="mergesort")
            .reset_index(drop=True))


def test_dedup_edges_and_out_degrees_match_pandas(ray_session):
    import ray.data as rd

    from darc_ray.stages.graph import dedup_edges, out_degrees

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"s": rng.integers(0, 40, 5000),
                       "t": rng.integers(100, 160, 5000)})
    edges = dedup_edges(rd.from_pandas(df), "s", "t", n_blocks=4)
    got = _sorted(edges.to_pandas())
    want = _sorted(df.drop_duplicates().rename(columns={"s": "src",
                                                        "t": "dst"}))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got_deg = _sorted(out_degrees(edges, n_blocks=4).to_pandas())
    want_deg = _sorted(want.groupby("src", as_index=False)
                       .agg(d=("dst", "size")))
    pd.testing.assert_frame_equal(got_deg, want_deg, check_dtype=False)


def test_degree_histogram_matches_pandas(ray_session):
    import ray.data as rd

    from darc_ray.stages.graph import dedup_edges, degree_histogram

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"s": rng.integers(0, 300, 20000),
                       "t": rng.integers(0, 500, 20000)})
    edges = dedup_edges(rd.from_pandas(df), "s", "t", n_blocks=4)
    got = degree_histogram(edges, n_blocks=4)
    deg = (df.drop_duplicates().groupby("s").size())
    want = (deg.value_counts().rename_axis("out_degree")
            .reset_index(name="n_srcs").sort_values("out_degree")
            .reset_index(drop=True).astype("int64"))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pagerank_distributed_matches_broadcast_and_sql(
        ray_session, monkeypatch):
    """Force the no-broadcast path (threshold 0) and require the exact
    rows the broadcast flavor + unrolled SQL oracle produce — integer
    arithmetic makes all three bit-identical."""
    from darc_ray.pipelines.queries import SQL_PAGERANK, q_pagerank

    broadcast = q_pagerank(SF_DIR)

    monkeypatch.setenv("DARC_RAY_PAGERANK_MAX_BROADCAST_EDGES", "0")
    distributed = q_pagerank(SF_DIR)
    pd.testing.assert_frame_equal(distributed, broadcast,
                                  check_dtype=False)

    con = duckdb.connect()
    for t in ("lineitem",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    want = con.sql(SQL_PAGERANK).df()
    pd.testing.assert_frame_equal(_sorted(distributed), _sorted(want),
                                  check_dtype=False)


def test_dedup_clusters_distributed_matches_driver(
        ray_session, monkeypatch):
    from darc_ray.pipelines.queries import q_dedup_clusters

    driver = q_dedup_clusters(SF_DIR)
    monkeypatch.setenv("DARC_RAY_CC_MAX_DRIVER_PAIRS", "0")
    distributed = q_dedup_clusters(SF_DIR)
    pd.testing.assert_frame_equal(distributed, driver, check_dtype=False)


@pytest.mark.slow
def test_planted_chain_1e5_converges_distributed(ray_session):
    """A single 10^5-link chain: worst case for plain label
    propagation (diameter = n).  Pointer doubling must collapse it to
    one component in O(log n) rounds without driver-resident
    union-find."""
    from darc_ray.stages.dedup import connected_components_distributed

    import ray.data as rd

    n = 100_000
    pairs = pd.DataFrame({"a": np.arange(n, dtype=np.int64),
                          "b": np.arange(1, n + 1, dtype=np.int64)})
    # feed the pairs as a DATASET — the scale-path input (pair stream
    # never driver-resident); the DataFrame flavor is equality-tested
    # against union-find in test_dedup_ann
    labels = connected_components_distributed(
        rd.from_pandas(pairs).repartition(num_blocks=4), n_blocks=4,
        max_iters=40).to_pandas()
    assert len(labels) == n + 1
    assert (labels["label"].to_numpy() == 0).all()


def test_tri_pair_expand_matches_itertools():
    """The vectorized within-group pair expansion (triangle_count's
    wedge/pair kernel) against itertools on ragged groups, including
    size-1 (no pairs) and empty-tail cases."""
    from itertools import combinations

    from darc_ray.pipelines.queries import _tri_pair_expand

    groups = [[3, 7, 9], [1], [2, 5], [10, 11, 12, 13]]
    p = np.asarray([x for g in groups for x in g], dtype=np.int64)
    starts, sizes, off = [], [], 0
    for g in groups:
        starts.append(off)
        sizes.append(len(g))
        off += len(g)
    a, b = _tri_pair_expand(p, np.asarray(starts), np.asarray(sizes))
    want = [pair for g in groups for pair in combinations(g, 2)]
    assert list(zip(a.tolist(), b.tolist())) == want
    # all-singleton input → zero pairs
    a, b = _tri_pair_expand(np.asarray([1, 2], dtype=np.int64),
                            np.asarray([0, 1]), np.asarray([1, 1]))
    assert len(a) == 0 and len(b) == 0


def test_triangle_count_planted_k4_plus_pendant(ray_session, tmp_path,
                                                monkeypatch):
    """A planted graph with a known closed form: K4 on parts {1,2,3,4}
    (each edge = one 2-line order) plus a pendant edge (4,5).
    Triangles = C(4,3) = 4; wedges = 3·C(3,2) + C(4,2) + 0 = 15;
    closure_milli = 12000 // 15 = 800.  Both rungs (packed-u64
    broadcast and forced co-shuffled (wu,wv) join) must agree on the
    exact row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from darc_ray.pipelines.queries import q_triangle_count

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    ok, pk = [], []
    for i, (u, v) in enumerate(edges):
        ok += [i, i]
        pk += [u, v]
    pq.write_table(pa.table({"l_orderkey": np.asarray(ok, dtype=np.int64),
                             "l_partkey": np.asarray(pk, dtype=np.int64)}),
                   tmp_path / "lineitem.parquet")
    want = {"n_nodes": 5, "n_edges": 7, "n_wedges": 15,
            "n_triangles": 4, "closure_milli": 800}
    got = q_triangle_count(str(tmp_path)).iloc[0].to_dict()
    assert got == want
    monkeypatch.setenv("DARC_RAY_TRI_CAP", "0")
    got_join = q_triangle_count(str(tmp_path)).iloc[0].to_dict()
    assert got_join == want


def test_edge_embeddedness_planted_k4_plus_pendant(ray_session, tmp_path,
                                                   monkeypatch):
    """K4 ⊕ pendant closed form: every K4 edge has exactly 2 common
    neighbors, the pendant (4,5) has 0 — both rungs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from darc_ray.pipelines.queries import q_edge_embeddedness

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    ok, pk = [], []
    for i, (u, v) in enumerate(edges):
        ok += [i, i]
        pk += [u, v]
    pq.write_table(pa.table({"l_orderkey": np.asarray(ok, dtype=np.int64),
                             "l_partkey": np.asarray(pk, dtype=np.int64)}),
                   tmp_path / "lineitem.parquet")
    want = [(1, 2, 2), (1, 3, 2), (1, 4, 2), (2, 3, 2), (2, 4, 2),
            (3, 4, 2), (4, 5, 0)]
    got = q_edge_embeddedness(str(tmp_path))
    assert list(map(tuple, got.values.tolist())) == want
    monkeypatch.setenv("DARC_RAY_TRI_CAP", "0")
    got_join = q_edge_embeddedness(str(tmp_path))
    assert list(map(tuple, got_join.values.tolist())) == want
