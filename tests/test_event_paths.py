"""event_paths planted sequences: engineered per-user streams give
hand-countable triples ((view,click,buy) twice for user 1;
(a,a,a) twice for user 2), a 2-event user emits nothing, users never
leak into each other despite interleaved timestamps, and a same-ts
pair orders by event_id (the total-order tiebreak)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_event_paths_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_event_paths

    rows = []          # (event_id, ts_offset_sec, user, type)
    seq1 = ["view", "click", "buy", "view", "click", "buy"]
    for i, t in enumerate(seq1):
        rows.append((i, 10 * i, 1, t))
    for i in range(4):
        rows.append((100 + i, 10 * i + 3, 2, "a"))     # interleaved ts
    rows.append((200, 5, 3, "x"))
    rows.append((201, 6, 3, "y"))                       # no triple
    # same-ts pair for user 4: event_id orders them → (p,q,r) not (q,p,r)
    rows.append((300, 50, 4, "p"))
    rows.append((301, 50, 4, "q"))
    rows.append((302, 60, 4, "r"))

    base = pd.Timestamp("2024-01-01")
    pq.write_table(pa.table({
        "event_id": np.asarray([r[0] for r in rows], dtype=np.int64),
        "ts": pa.array([base + pd.Timedelta(seconds=r[1]) for r in rows]),
        "user_id": np.asarray([r[2] for r in rows], dtype=np.int64),
        "event_type": [r[3] for r in rows],
        "value": np.zeros(len(rows)),
        "props": ["{}"] * len(rows)}),
        tmp_path / "events.parquet")

    got = q_event_paths(str(tmp_path))
    want = pd.DataFrame({
        "e1": ["a", "view", "buy", "click", "p"],
        "e2": ["a", "click", "view", "buy", "q"],
        "e3": ["a", "buy", "click", "view", "r"],
        "n": np.asarray([2, 2, 1, 1, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
