"""knn_label_audit planted closed forms: (1) two 6-clusters with one
mislabeled member — the label-0 members see 4 agreeing neighbours (the
mislabeled twin pollutes every list), the mislabeled vector itself sees
0, the clean cluster sees 5; (2) a rank-5 DISTANCE TIE resolved by the
(d2, qb) total order — verified against the DuckDB oracle so both
engines must pick the same tied neighbour."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def _write(tmp_path, vecs, labels):
    pq.write_table(pa.table({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": np.asarray(labels, dtype=np.int32)}),
        tmp_path / "embeddings.parquet")


def _vec(*coords):
    v = np.zeros(DIM, dtype=np.float64)
    for c, s in coords:
        v[c] = s
    return v


def test_mislabeled_cluster_member(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_knn_label_audit

    vecs, labels = [], []
    for i in range(6):                       # cluster A, id5 mislabeled
        vecs.append(_vec((0, 0.1), (2, 0.001 * i)))
        labels.append(0 if i < 5 else 1)
    for i in range(6):                       # cluster B, clean
        vecs.append(_vec((1, 0.1), (3, 0.001 * i)))
        labels.append(1)
    _write(tmp_path, vecs, labels)

    got = q_knn_label_audit(str(tmp_path))
    want = pd.DataFrame({"label": np.asarray([0, 1, 1], dtype=np.int64),
                         "n_agree": np.asarray([4, 0, 5], dtype=np.int64),
                         "n_vecs": np.asarray([5, 1, 6], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_rank5_tie_matches_oracle(ray_session, tmp_path):
    from darc_ray.pipelines.queries import (ORACLE_SQL,
                                            q_knn_label_audit)

    # query id0 at origin; ids 1-4 at distances 1..4 steps; ids 5,6,7
    # all EXACTLY at step 5 (a three-way tie for ranks 5-7: only id5
    # may enter the top-5 under the (d2, qb) order).  Labels make the
    # choice observable: id5 is label 0 (agrees with id0), ids 6-7 are
    # label 1 — a wrong tie-break changes id0's n_agree.
    vecs = [_vec()]
    for i in range(1, 5):
        vecs.append(_vec((i, 0.001 * i)))
    for j, axis in enumerate((10, 11, 12)):
        vecs.append(_vec((axis, 0.005)))
    labels = [0, 0, 0, 0, 0, 0, 1, 1]
    _write(tmp_path, vecs, labels)

    got = q_knn_label_audit(str(tmp_path))
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    want = con.sql(ORACLE_SQL["knn_label_audit"]).df()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    # id0's row: 5 NN = ids 1,2,3,4 (label 0) + the tie winner id5
    # (label 0) → n_agree 5 appears for label 0
    assert ((got["label"] == 0) & (got["n_agree"] == 5)).any()
