"""part_affinity planted closed form: a basket set with hand-computed
support / confidence / lift, a sub-minsup pair that must be filtered,
and a duplicate (order, part) line that the distinct pass must absorb.
Both the broadcast attach and the forced tagged-union rung must agree."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_lineitem(tmp_path, baskets, extra_dup=None):
    ok, pk = [], []
    for o, parts in baskets:
        for p in parts:
            ok.append(o)
            pk.append(p)
    if extra_dup is not None:
        ok.append(extra_dup[0])
        pk.append(extra_dup[1])
    pq.write_table(pa.table({"l_orderkey": np.asarray(ok, dtype=np.int64),
                             "l_partkey": np.asarray(pk, dtype=np.int64)}),
                   tmp_path / "lineitem.parquet")


def test_part_affinity_planted_closed_form(ray_session, tmp_path,
                                           monkeypatch):
    from darc_ray.pipelines.queries import q_part_affinity

    baskets = (
        # pair (1,2) in 3 of 9 orders; part 1 also rides with 3 (twice,
        # below minsup) and alone once: n_1=6, n_2=3, n_3=2
        [(1, [1, 2]), (2, [1, 2]), (3, [1, 2]),
         (4, [1, 3]), (5, [1, 3]), (6, [1])]
        # pair (4,5) perfectly correlated in its 3 orders
        + [(7, [4, 5]), (8, [4, 5]), (9, [4, 5])]
    )
    # duplicate line (order 1, part 1) — distinct pass must absorb it
    _write_lineitem(tmp_path, baskets, extra_dup=(1, 1))

    want = pd.DataFrame({
        "u": [1, 4], "v": [2, 5], "n_both": [3, 3],
        "n_u": [6, 3], "n_v": [3, 3],
        "conf_uv_milli": [500, 1000], "conf_vu_milli": [1000, 1000],
        # lift = (1000 * n_both * N=9) // (n_u * n_v)
        "lift_milli": [1500, 3000]})
    got = q_part_affinity(str(tmp_path))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    monkeypatch.setenv("DARC_RAY_PA_CAP", "0")
    got_join = q_part_affinity(str(tmp_path))
    pd.testing.assert_frame_equal(got_join, want, check_dtype=False)
