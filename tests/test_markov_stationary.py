"""markov_stationary planted checks: a hand-built 3-state chain whose
expected vector is RE-DERIVED in-test with plain Python ints following
the documented rule (quantize rows once, 10 floor-of-sum-quotient
steps, max-norm rescale); state 'c' only ever EMITS mass so its value
must collapse to exactly 0, and an event past the 30-minute session
gap must contribute no transition and no state."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

MIN_US = 60_000_000
B = 1_704_067_200 * 1_000_000
S = 1 << 20


def test_chain_rederived_and_source_only_state(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_markov_stationary

    seq = ["c", "a", "b", "a", "b", "b"]
    ts = [B + i * MIN_US for i in range(len(seq))]
    # an isolated event 2 h later: gap > 30 min → no transition, no state
    seq.append("d")
    ts.append(B + 200 * MIN_US)
    pq.write_table(pa.table({
        "event_id": np.arange(len(seq), dtype=np.int64),
        "user_id": np.ones(len(seq), dtype=np.int64),
        "event_type": seq,
        "ts": pa.array(ts, type=pa.timestamp("us"))}),
        tmp_path / "events.parquet")

    got = q_markov_stationary(str(tmp_path))
    assert list(got["event_type"]) == ["a", "b", "c"]   # 'd' excluded

    # independent plain-int re-derivation
    counts = {("c", "a"): 1, ("a", "b"): 2, ("b", "a"): 1,
              ("b", "b"): 1}
    states = ["a", "b", "c"]
    rs = {s: sum(n for (x, _), n in counts.items() if x == s)
          for s in states}
    pq_ = {(x, y): n * S // rs[x] for (x, y), n in counts.items()}
    v = {s: S for s in states}
    for _ in range(10):
        w = {s: sum(v[x] * pq_.get((x, s), 0)
                    for x in states) // S for s in states}
        m = max(w.values())
        v = {s: (w[s] * S) // m if m else 0 for s in states}
    for s in states:
        row = got[got["event_type"] == s].iloc[0]
        assert row["v_q"] == v[s], (s, row["v_q"], v[s])
        assert row["out_n"] == rs.get(s, 0)
    assert int(got[got["event_type"] == "c"]["v_q"].iloc[0]) == 0
