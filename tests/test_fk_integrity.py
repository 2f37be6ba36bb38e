"""fk_integrity planted orphans: a miniature star schema with real
referential breaks in five of the seven relations — counts are child
ROWS (a lineitem referencing a missing order twice counts twice), and
clean relations measure exactly zero."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_fk_integrity_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_fk_integrity

    def w(name, **cols):
        pq.write_table(pa.table({k: pa.array(v) for k, v in cols.items()}),
                       tmp_path / f"{name}.parquet")

    w("region", r_regionkey=np.asarray([0], dtype=np.int64),
      r_name=["R0"])
    w("nation", n_nationkey=np.asarray([0, 1], dtype=np.int64),
      n_name=["A", "B"],
      n_regionkey=np.asarray([0, 9], dtype=np.int64))     # 1 orphan
    w("customer", c_custkey=np.asarray([10, 11], dtype=np.int64),
      c_name=["c", "d"], c_nationkey=np.asarray([0, 1], dtype=np.int64),
      c_acctbal=np.zeros(2), c_mktsegment=["S", "S"])
    w("supplier", s_suppkey=np.asarray([20, 21], dtype=np.int64),
      s_name=["s", "t"], s_nationkey=np.asarray([0, 7], dtype=np.int64),
      s_acctbal=np.zeros(2))                               # 1 orphan
    w("part", p_partkey=np.asarray([30], dtype=np.int64),
      p_name=["p"], p_brand=["b"], p_type=["t"],
      p_size=np.asarray([1], dtype=np.int64), p_retailprice=np.ones(1))
    w("orders", o_orderkey=np.asarray([40, 41, 42], dtype=np.int64),
      o_custkey=np.asarray([10, 11, 99], dtype=np.int64),  # 1 orphan
      o_orderstatus=["F"] * 3, o_totalprice=np.ones(3),
      o_orderdate=pa.array([pd.Timestamp("2024-01-01")] * 3),
      o_orderpriority=["1"] * 3)
    w("lineitem",
      l_orderkey=np.asarray([40, 77, 77, 41, 42], dtype=np.int64),
      l_partkey=np.asarray([30, 30, 88, 30, 30], dtype=np.int64),
      l_suppkey=np.asarray([20, 21, 20, 20, 21], dtype=np.int64),
      l_linenumber=np.arange(1, 6, dtype=np.int64),
      l_quantity=np.ones(5), l_extendedprice=np.ones(5),
      l_discount=np.zeros(5), l_tax=np.zeros(5),
      l_returnflag=["N"] * 5, l_linestatus=["O"] * 5,
      l_shipdate=pa.array([pd.Timestamp("2024-02-01")] * 5))

    got = q_fk_integrity(str(tmp_path)).set_index("relation")
    assert got.loc["lineitem.orderkey", "n_orphan"] == 2   # 77 twice
    assert got.loc["lineitem.partkey", "n_orphan"] == 1    # 88 once
    assert got.loc["lineitem.suppkey", "n_orphan"] == 0
    assert got.loc["orders.custkey", "n_orphan"] == 1
    assert got.loc["customer.nationkey", "n_orphan"] == 0
    assert got.loc["supplier.nationkey", "n_orphan"] == 1
    assert got.loc["nation.regionkey", "n_orphan"] == 1
    assert got.loc["lineitem.orderkey", "orphan_milli"] == 400
    assert (got["n_child"] >= got["n_orphan"]).all()
