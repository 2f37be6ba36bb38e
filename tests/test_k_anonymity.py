"""k_anonymity planted census: engineered quasi-identifier classes of
sizes 1, 2, and 6 give the exact histogram with at_risk flagged below
k = 5 and row counts = size × class count."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_k_anonymity_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_k_anonymity

    # classes: (0,A)=6 rows, (1,A)=2, (1,B)=2, (2,C)=1
    cells = [(0, "A")] * 6 + [(1, "A")] * 2 + [(1, "B")] * 2 + [(2, "C")]
    pq.write_table(pa.table({
        "c_custkey": np.arange(len(cells), dtype=np.int64),
        "c_name": [f"c{i}" for i in range(len(cells))],
        "c_nationkey": np.asarray([c[0] for c in cells], dtype=np.int64),
        "c_acctbal": np.zeros(len(cells)),
        "c_mktsegment": [c[1] for c in cells]}),
        tmp_path / "customer.parquet")

    got = q_k_anonymity(str(tmp_path))
    want = pd.DataFrame({
        "class_size": np.asarray([1, 2, 6], dtype=np.int64),
        "n_classes": np.asarray([1, 2, 1], dtype=np.int64),
        "n_rows": np.asarray([1, 4, 6], dtype=np.int64),
        "at_risk": np.asarray([1, 1, 0], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
