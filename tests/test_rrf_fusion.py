"""rrf_fusion planted closed form with a DELIBERATE cross-list tie:
the L2 list ranks (c1, c2, c3) while the dot list ranks (c2, c1, c3),
so c1 and c2 both score 10⁶//61 + 10⁶//62 = 32522 and the tie must
fall to the smaller neighbor id; c3 trails at 2·(10⁶//63) = 31746 —
all hand-derived."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def _vec(axis, s):
    v = np.zeros(DIM)
    v[axis] = s
    return v.tolist()


def test_cross_list_tie_breaks_by_neighbor(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_rrf_fusion

    vecs = [_vec(0, 1.0),      # id 0: the query
            _vec(0, 0.9),      # id 1: closest by L2, 2nd by dot
            _vec(0, 2.0),      # id 2: 1st by dot, 2nd by L2
            _vec(1, 1.0)]      # id 3: last in both lists
    pq.write_table(pa.table({
        "vec_id": np.arange(4, dtype=np.int64),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32()))}),
        tmp_path / "embeddings.parquet")

    got = q_rrf_fusion(str(tmp_path), query_ids=(0,))
    want = pd.DataFrame({
        "query_id": np.zeros(3, dtype=np.int64),
        "rank": np.asarray([1, 2, 3], dtype=np.int64),
        "neighbor_id": np.asarray([1, 2, 3], dtype=np.int64),
        "rrf_score": np.asarray([32522, 32522, 31746],
                                dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
