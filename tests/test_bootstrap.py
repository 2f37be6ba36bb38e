"""bootstrap_subsample planted check: a 6-row fixture whose expected
per-replicate membership is RE-DERIVED independently in the test
(hashlib md5 + plain-int hex parsing and bit tests — no repo helpers),
for ALL 100 replicates including any empty ones (mean defined 0), plus
an exact-value spot check of the revenue-cents quantization."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_membership_rederived_all_replicates(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_bootstrap_subsample

    rows = [(100 + i, 1 + (i % 3), 100.0 + i, 0.1 * (i % 4))
            for i in range(6)]
    pq.write_table(pa.table({
        "l_orderkey": np.asarray([r[0] for r in rows], dtype=np.int64),
        "l_linenumber": np.asarray([r[1] for r in rows],
                                   dtype=np.int32),
        "l_extendedprice": np.asarray([r[2] for r in rows],
                                      dtype=np.float64),
        "l_discount": np.asarray([r[3] for r in rows],
                                 dtype=np.float64)}),
        tmp_path / "lineitem.parquet")

    got = q_bootstrap_subsample(str(tmp_path))
    assert len(got) == 100

    # independent re-derivation
    import math
    cents = [int(math.floor(p * (1 - d) * 100 + 0.5))
             for _, _, p, d in rows]
    digests = [hashlib.md5(f"{ok}:{ln}".encode()).hexdigest()
               for ok, ln, _, _ in rows]
    for b in range(100):
        member = []
        for h in digests:
            half = int(h[:16], 16) if b < 64 else int(h[16:32], 16)
            member.append((half >> (b if b < 64 else b - 64)) & 1 == 1)
        n = sum(member)
        s = sum(c for c, m in zip(cents, member) if m)
        mean = s * 1_000_000 // n if n else 0
        row = got[got["b"] == b].iloc[0]
        assert (row["n_rows"], row["sum_cents"],
                row["mean_micro"]) == (n, s, mean), b
    # some replicate of a 6-row fixture is empty with high
    # probability; if one is, its mean must be exactly 0
    empties = got[got["n_rows"] == 0]
    assert (empties["mean_micro"] == 0).all()
