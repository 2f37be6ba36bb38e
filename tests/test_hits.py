"""hits_scores closed form on a planted star-plus-pendant bipartite
graph: o1 → p1..p4 (outdeg 4), o2 → p1 (outdeg 1, duplicated rows to
prove edge dedup) ⇒ a₂(p1) = 5, a₂(p2..p4) = 4 (ties ordered by node),
h₃(o1) = 5+4+4+4 = 17, h₃(o2) = 5 — every score hand-derived."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_hits_closed_form(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_hits_scores

    o = [1, 1, 1, 1, 2, 2, 2]          # o2→p1 appears 3× (dup rows)
    p = [101, 102, 103, 104, 101, 101, 101]
    pq.write_table(pa.table({
        "l_orderkey": np.asarray(o, dtype=np.int64),
        "l_partkey": np.asarray(p, dtype=np.int64)}),
        tmp_path / "lineitem.parquet")

    got = q_hits_scores(str(tmp_path))
    want = pd.DataFrame({
        "side": ["auth"] * 4 + ["hub"] * 2,
        "node": [101, 102, 103, 104, 1, 2],
        "score": [5, 4, 4, 4, 17, 5]})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)
    assert got["score"].dtype.kind == "i"
