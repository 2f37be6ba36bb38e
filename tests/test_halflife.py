"""halflife_engagement planted closed form: shift-of-day-sum decay
hand-derived — type a spans three days (100 + 101>>1 + 50>>2 = 162,
pinning the floor in 101>>1 = 50), type b is a single 2-day-old burst
(400>>2 = 100), type c is 70 days stale (decayed exactly 0 via the
age ≥ 63 guard while raw mass survives)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000
D = 19_800                      # an arbitrary epoch day


def test_shift_decay_closed_form(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_halflife_engagement

    rows = [
        ("a", D, 1.00), ("a", D - 1, 1.01), ("a", D - 2, 0.50),
        ("b", D - 2, 4.00),
        ("c", D - 70, 7.00),
    ]
    pq.write_table(pa.table({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": pa.array([d * DAY_US for _, d, _ in rows],
                       type=pa.timestamp("us")),
        "event_type": [t for t, _, _ in rows],
        "value": np.asarray([v for _, _, v in rows], dtype=np.float64)}),
        tmp_path / "events.parquet")

    got = q_halflife_engagement(str(tmp_path))
    want = pd.DataFrame({
        "event_type": ["a", "b", "c"],
        "n_events": np.asarray([3, 1, 1], dtype=np.int64),
        "raw_cents": np.asarray([251, 400, 700], dtype=np.int64),
        "decayed_cents": np.asarray([162, 100, 0], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
