"""mad_outlier_days closed form: engineered day counts [8,10,10,12,100]
give med2 = 20, mad2 = 8 (doubled-median arithmetic by hand), and only
the 100-event day trips |2n−med2|·2 > 5·mad2; the planted 'error'
spike day is its own single-day median (dv = 0) so it must NOT flag
on this tiny corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_mad_outlier_closed_form(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_mad_outlier_days

    base = pd.Timestamp("2024-03-01")
    counts = [8, 10, 10, 12, 100]
    rows = []
    eid = 0
    for di, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + pd.Timedelta(days=di)))
            eid += 1
    pq.write_table(pa.table({
        "event_id": np.asarray([r[0] for r in rows], dtype=np.int64),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": np.ones(len(rows), dtype=np.int64),
        "event_type": ["x"] * len(rows),
        "value": np.zeros(len(rows)),
        "props": ["{}"] * len(rows)}),
        tmp_path / "events.parquet")

    got = q_mad_outlier_days(str(tmp_path))
    day4 = int((base + pd.Timedelta(days=4)).value // 86_400_000_000_000)
    want = pd.DataFrame({
        "event_type": ["x"],
        "day": np.asarray([day4], dtype=np.int64),
        "n": np.asarray([100], dtype=np.int64),
        "med2": np.asarray([20], dtype=np.int64),
        "mad2": np.asarray([8], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
