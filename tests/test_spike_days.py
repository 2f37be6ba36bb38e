"""spike_days planted properties: the cross-multiplied 3× trailing-mean
rule fires exactly at the boundary, calendar gaps contribute zero (not a
skipped window slot), and a quiet history (prev7 == 0) never spikes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DAY_US = 86_400_000_000


def _write_events(tmp_path, rows):
    """rows: list of (event_type, day, n_events)."""
    et, ts = [], []
    eid = 0
    for t, day, n in rows:
        for _ in range(n):
            et.append(t)
            ts.append(day * DAY_US + eid)   # distinct intra-day stamps
            eid += 1
    pq.write_table(pa.table({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "ts": pa.array(np.asarray(ts, dtype=np.int64),
                       pa.timestamp("us")),
        "user_id": np.zeros(len(ts), dtype=np.int64),
        "event_type": et,
        "value": np.zeros(len(ts)),
        "props": ["{}"] * len(ts)}), tmp_path / "events.parquet")


def test_spike_days_planted_boundary_gap_and_quiet(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_spike_days

    rows = (
        # type a: flat week, then 3 on day 7 (7·3 == 3·7 — boundary
        # equality must fire), then 2 on day 8 (prev7 = 9 → quiet)
        [("a", d, 1) for d in range(7)] + [("a", 7, 3), ("a", 8, 2)]
        # type b: burst after an 9-day silence — prev7 == 0, NOT a
        # spike; then the window sees only sparse days (gap-exact sums)
        + [("b", 0, 2), ("b", 10, 6), ("b", 11, 1), ("b", 12, 6)]
    )
    _write_events(tmp_path, rows)
    out = q_spike_days(str(tmp_path)).set_index(["event_type", "day"])

    def row(t, d):
        r = out.loc[(t, d)]
        return int(r["n_events"]), int(r["prev7"]), int(r["spike"])

    assert row("a", 0) == (1, 0, 0)          # first day: prev7 == 0
    assert row("a", 7) == (3, 7, 1)          # exact boundary fires
    assert row("a", 8) == (2, 9, 0)          # 14 < 27
    assert row("b", 10) == (6, 0, 0)         # silence before: never spikes
    assert row("b", 11) == (1, 6, 0)         # 7 < 18
    assert row("b", 12) == (6, 7, 1)         # 42 ≥ 21; gap days added zero


def test_trend_detect_planted_slopes(ray_session, tmp_path):
    """trend_detect closed forms: a perfect +2/day ramp (slope_milli
    exactly 2000), a perfect −1/day decline (−1000, exercising the
    trunc-toward-zero negative branch), and a flat series (num 0,
    rising 0)."""
    from darc_ray.pipelines.queries import q_trend_detect

    rows = []
    # up: counts 2,4,6,8 on days 0-3 → slope exactly +2
    for d in range(4):
        rows += [("up", d, 2 * (d + 1))]
    # down: counts 3,2,1 on days 10-12 → slope exactly −1
    for i, d in enumerate(range(10, 13)):
        rows += [("down", d, 3 - i)]
    # flat: 5 on days 0,5 → num = 0
    rows += [("flat", 0, 5), ("flat", 5, 5)]
    _write_events(tmp_path, rows)

    got = q_trend_detect(str(tmp_path)).set_index("event_type")
    assert got.loc["up", "slope_milli"] == 2000
    assert got.loc["up", "rising"] == 1
    assert got.loc["down", "slope_milli"] == -1000
    assert got.loc["down", "rising"] == 0
    assert got.loc["flat", "slope_num"] == 0
    assert got.loc["flat", "slope_milli"] == 0
    assert got.loc["flat", "rising"] == 0
