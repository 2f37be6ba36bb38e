"""watermark_audit planted closed form: hand-built disorder with the
1-hour boundary pinned on both sides of strictness — an event EXACTLY
1 h behind the watermark is NOT late (strict <), one µs more is — plus
an in-allowance straggler, a deep straggler, a second-day regression,
and the family's own 20-event UNION-planted replay tail (ids after the
fixture max, event times at fixture start + i hours → all 20 late on
day 0)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

H = 3_600_000_000                      # 1 h in µs
B = 1_704_067_200 * 1_000_000          # 2024-01-01 00:00:00 UTC in µs
D0 = B // 86_400_000_000               # epoch-day 19723


def test_boundary_and_replay_tail(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_watermark_audit

    events = [
        (1, B),               # first event: sentinel watermark, not late
        (2, B + 10 * H),      # in order
        (3, B + 9 * H + H // 2),   # 30 min behind allowance: not late
        (4, B + 9 * H),       # EXACTLY 1 h behind wm=10h: not late (strict)
        (5, B + 9 * H - 1),   # 1 µs beyond the allowance: late
        (6, B + 30 * H),      # day 1, advances the watermark
        (7, B + 5 * H),       # deep straggler on day 0: late
        (8, B + 28 * H),      # 2 h behind wm=30h: late (day 1)
    ]
    ids = np.asarray([e[0] for e in events], dtype=np.int64)
    us = np.asarray([e[1] for e in events], dtype=np.int64)
    pq.write_table(pa.table({
        "event_id": ids,
        "ts": pa.array(us, type=pa.timestamp("us"))}),
        tmp_path / "events.parquet")

    got = q_watermark_audit(str(tmp_path))
    # day 0: fixture ids 1,2,3,4,5,7 (6 events; late: 5,7) + the 20
    # replay-tail events (all late) = 26 events / 22 late
    want = pd.DataFrame({
        "day": np.asarray([D0, D0 + 1], dtype=np.int64),
        "n_events": np.asarray([26, 2], dtype=np.int64),
        "n_late": np.asarray([22, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
