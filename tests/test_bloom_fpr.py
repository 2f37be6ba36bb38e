"""bloom_fpr_audit planted check: a tiny orders table with known
members; the test re-derives the multiply-shift positions with plain
Python ints (independent of the numpy implementation) and predicts the
exact FP count the family must report."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

MULS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _positions(key: int, shift: int):
    return [((key * m) % (1 << 64)) >> shift for m in MULS]


def test_bloom_fpr_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_bloom_fpr_audit

    members = [3, 7, 11, 19]
    probes = list(range(100, 400))
    keys = members + probes
    prices = [500000.0] * len(members) + [10.0] * len(probes)
    pq.write_table(pa.table({
        "o_orderkey": np.asarray(keys, dtype=np.int64),
        "o_custkey": np.ones(len(keys), dtype=np.int64),
        "o_orderstatus": ["F"] * len(keys),
        "o_totalprice": np.asarray(prices),
        "o_orderdate": pa.array([pd.Timestamp("2024-01-01")] * len(keys)),
        "o_orderpriority": ["1"] * len(keys)}),
        tmp_path / "orders.parquet")

    # independent geometry + FP prediction with plain ints
    n = len(members)
    e = max(6, (n * 12 - 1).bit_length())
    shift = 64 - e
    table = set()
    for k in members:
        table.update(_positions(k, shift))
    fp = [p for p in probes
          if all(pos in table for pos in _positions(p, shift))]

    got = q_bloom_fpr_audit(str(tmp_path)).iloc[0]
    assert got["n_members"] == n
    assert got["m_bits"] == 1 << e
    assert got["n_probes"] == len(probes)
    assert got["n_fp"] == len(fp)
    assert got["fpr_milli"] == len(fp) * 1000 // len(probes)
