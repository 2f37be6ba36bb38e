"""rfm_segments planted ladder: 8 customers engineered so every
dimension's exact k-th order statistics (k = ceil(q·8/4) = 2/4/6) fall
on the pair boundaries — each customer pair lands in one diagonal cell
(1,1,1) … (4,4,4) with exactly 2 customers, and tied values share a
code (the partitioning-independence guarantee)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_rfm_segments_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_rfm_segments

    base = pd.Timestamp("2024-06-01")
    f_per = [1, 1, 2, 2, 3, 3, 4, 4]
    days = [0, 0, 10, 10, 20, 20, 30, 30]
    price = [100.0, 100.0, 120.0, 120.0, 150.0, 150.0, 200.0, 200.0]
    rows = []
    ok = 0
    for c in range(8):
        for j in range(f_per[c]):
            # the LAST order sits at base - days[c]; earlier ones before
            rows.append((ok, c, price[c],
                         base - pd.Timedelta(days=days[c] + 40 * j)))
            ok += 1
    pq.write_table(pa.table({
        "o_orderkey": np.asarray([r[0] for r in rows], dtype=np.int64),
        "o_custkey": np.asarray([r[1] for r in rows], dtype=np.int64),
        "o_orderstatus": ["F"] * len(rows),
        "o_totalprice": np.asarray([r[2] for r in rows]),
        "o_orderdate": pa.array([r[3] for r in rows]),
        "o_orderpriority": ["1-URGENT"] * len(rows)}),
        tmp_path / "orders.parquet")

    got = q_rfm_segments(str(tmp_path))
    want = pd.DataFrame({
        "r_q": np.asarray([1, 2, 3, 4], dtype=np.int64),
        "f_q": np.asarray([1, 2, 3, 4], dtype=np.int64),
        "m_q": np.asarray([1, 2, 3, 4], dtype=np.int64),
        "n_customers": np.asarray([2, 2, 2, 2], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
