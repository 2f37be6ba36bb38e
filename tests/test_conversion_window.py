"""conversion_window planted closed forms pinning both boundary
semantics: a purchase at EXACTLY view+1h converts (inclusive ≤), a
purchase at the same µs as the view does not (strict >), one purchase
can convert two views, a purchase 1 µs past the window does not, and
a purchase BEFORE the only view never counts — hand-derived daily
census including the per-mille floor."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

H = 3_600_000_000
B = 1_704_067_200 * 1_000_000          # 2024-01-01 in µs
D0 = B // 86_400_000_000


def test_boundaries_and_sharing(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_conversion_window

    rows = [
        # u1: purchase exactly at view+1h → converts
        (1, "view", B), (1, "purchase", B + H),
        # u2: purchase at the view's own µs → strict >, no conversion
        (2, "view", B + 2 * H), (2, "purchase", B + 2 * H),
        # u3: two views share one purchase inside both windows
        (3, "view", B + 3 * H), (3, "view", B + 3 * H + H // 2),
        (3, "purchase", B + 4 * H - 1),
        # u4: purchase 1 µs past the window
        (4, "view", B + 5 * H), (4, "purchase", B + 6 * H + 1),
        # u5: purchase strictly before the view
        (5, "purchase", B + 7 * H), (5, "view", B + 8 * H),
        # decoy types must be ignored
        (1, "click", B + 1), (2, "error", B + 2),
    ]
    pq.write_table(pa.table({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.asarray([r[0] for r in rows], dtype=np.int64),
        "event_type": [r[1] for r in rows],
        "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us"))}),
        tmp_path / "events.parquet")

    got = q_conversion_window(str(tmp_path))
    # 6 views, conversions: u1 (1) + u3 (2) = 3 → 3*1000//6 = 500
    want = pd.DataFrame({
        "day": np.asarray([D0], dtype=np.int64),
        "n_views": np.asarray([6], dtype=np.int64),
        "n_converted": np.asarray([3], dtype=np.int64),
        "conv_milli": np.asarray([500], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
