"""pareto_skyline planted closed form: same-size-cheaper kills
(B eliminates A at size 10), incomparable diagonal points coexist,
equal (size, price) TWINS are mutually non-dominating and both
survive, a small-expensive point is dominated, and the largest size
always survives — skyline exactly {B, C, D(twin), F}."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_dominance_and_twins(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_pareto_skyline

    #            id  size  price
    rows = [(1, 10, 1.00),    # A: killed by B (same size, cheaper)
            (2, 10, 0.90),    # B: skyline
            (3, 12, 0.95),    # C: skyline (bigger but pricier than B)
            (4, 12, 0.95),    # D: exact twin of C — both survive
            (5, 5, 2.00),     # E: dominated by B
            (6, 15, 3.00)]    # F: largest size, skyline
    pq.write_table(pa.table({
        "p_partkey": np.asarray([r[0] for r in rows], dtype=np.int64),
        "p_size": np.asarray([r[1] for r in rows], dtype=np.int32),
        "p_retailprice": np.asarray([r[2] for r in rows],
                                    dtype=np.float64)}),
        tmp_path / "part.parquet")

    got = q_pareto_skyline(str(tmp_path))
    want = pd.DataFrame({
        "p_partkey": np.asarray([6, 3, 4, 2], dtype=np.int64),
        "size": np.asarray([15, 12, 12, 10], dtype=np.int64),
        "price_cents": np.asarray([300, 95, 95, 90], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
