"""open_orders_timeline planted backlog: two orders / three lines with
hand-traced +1/−1 events give the exact curve 2 → 3 → 1 → 0, and the
final backlog is zero because every line ships."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_open_orders_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_open_orders_timeline

    base = pd.Timestamp("2024-03-01")
    E = base.value // 86_400_000_000_000
    pq.write_table(pa.table({
        "o_orderkey": np.asarray([1, 2], dtype=np.int64),
        "o_custkey": np.asarray([1, 1], dtype=np.int64),
        "o_orderstatus": ["F", "F"],
        "o_totalprice": np.ones(2),
        "o_orderdate": pa.array([base, base + pd.Timedelta(days=1)]),
        "o_orderpriority": ["1", "1"]}),
        tmp_path / "orders.parquet")
    ship = [base + pd.Timedelta(days=2), base + pd.Timedelta(days=5),
            base + pd.Timedelta(days=2)]
    pq.write_table(pa.table({
        "l_orderkey": np.asarray([1, 1, 2], dtype=np.int64),
        "l_partkey": np.asarray([1, 1, 1], dtype=np.int64),
        "l_suppkey": np.asarray([1, 1, 1], dtype=np.int64),
        "l_linenumber": np.asarray([1, 2, 1], dtype=np.int64),
        "l_quantity": np.ones(3), "l_extendedprice": np.ones(3),
        "l_discount": np.zeros(3), "l_tax": np.zeros(3),
        "l_returnflag": ["N"] * 3, "l_linestatus": ["O"] * 3,
        "l_shipdate": pa.array(ship)}),
        tmp_path / "lineitem.parquet")

    got = q_open_orders_timeline(str(tmp_path))
    want = pd.DataFrame({
        "day": np.asarray([E, E + 1, E + 2, E + 5], dtype=np.int64),
        "opened": np.asarray([2, 1, 0, 0], dtype=np.int64),
        "shipped": np.asarray([0, 0, 2, 1], dtype=np.int64),
        "open_lines": np.asarray([2, 3, 1, 0], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
