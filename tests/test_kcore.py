"""kcore_census planted closed form: a 6-node path glued to a triangle
peels ITERATIVELY at k = 2 — each round only exposes the next pair of
path ends, so the census proves multi-round cascade semantics (a
one-shot degree filter would remove only the outermost ends):
rounds (edges, nodes) = (8,9) → (6,7) → (4,5) → (3,3) → fixpoint (the
triangle survives, copied forward to round 8)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_path_plus_triangle_peels_iteratively(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_kcore_census

    # one 2-part order per desired co-purchase edge
    path = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    tri = [(7, 8), (8, 9), (7, 9)]
    ok, pk = [], []
    for i, (a, b) in enumerate(path + tri):
        ok.extend([100 + i, 100 + i])
        pk.extend([a, b])
    pq.write_table(pa.table({
        "l_orderkey": np.asarray(ok, dtype=np.int64),
        "l_partkey": np.asarray(pk, dtype=np.int64)}),
        tmp_path / "lineitem.parquet")

    got = q_kcore_census(str(tmp_path), k=2, rounds=8)
    curve = [(8, 9), (6, 7), (4, 5), (3, 3)] + [(3, 3)] * 5
    want = pd.DataFrame({
        "round": np.arange(9, dtype=np.int64),
        "n_edges": np.asarray([c[0] for c in curve], dtype=np.int64),
        "n_nodes": np.asarray([c[1] for c in curve], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)


def test_forced_attach_rung_matches(ray_session, tmp_path, monkeypatch):
    """DARC_RAY_KCORE_CAP=0 forces the no-broadcast attach-exchange
    rung through the same cascade — identical census."""
    from darc_ray.pipelines.queries import q_kcore_census

    path = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    tri = [(7, 8), (8, 9), (7, 9)]
    ok, pk = [], []
    for i, (a, b) in enumerate(path + tri):
        ok.extend([100 + i, 100 + i])
        pk.extend([a, b])
    pq.write_table(pa.table({
        "l_orderkey": np.asarray(ok, dtype=np.int64),
        "l_partkey": np.asarray(pk, dtype=np.int64)}),
        tmp_path / "lineitem.parquet")

    monkeypatch.setenv("DARC_RAY_KCORE_CAP", "0")
    got = q_kcore_census(str(tmp_path), k=2, rounds=4)
    curve = [(8, 9), (6, 7), (4, 5), (3, 3), (3, 3)]
    want = pd.DataFrame({
        "round": np.arange(5, dtype=np.int64),
        "n_edges": np.asarray([c[0] for c in curve], dtype=np.int64),
        "n_nodes": np.asarray([c[1] for c in curve], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
