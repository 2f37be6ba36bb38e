"""source_divergence planted closed forms: the symmetric "aab"/"abb"
pair whose smoothed KL is exactly 81092 micro-nats in BOTH directions
(hand: floor(0.6·ln1.5·10⁶) + floor(0.4·ln(2/3)·10⁶) = 243279 −
162187 — pinning floor on the NEGATIVE term), and a disjoint-alphabet
source exercising the add-one smoothing over the pair-union alphabet
(every cross term finite, re-derived in-test with plain math)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, docs):
    pq.write_table(pa.table({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "text": [t for _, t in docs],
        "source": [s for s, _ in docs]}),
        tmp_path / "documents.parquet")


def _kl(ca, na, cb, nb, alpha):
    k = len(alpha)
    total = 0
    for ch in alpha:
        pa_ = (ca.get(ch, 0) + 1) / (na + k)
        pb_ = (cb.get(ch, 0) + 1) / (nb + k)
        total += math.floor(pa_ * math.log(pa_ / pb_) * 1e6)
    return total


def test_symmetric_pair_and_smoothing(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_source_divergence

    _write(tmp_path, [("x", "aab"), ("y", "abb"), ("z", "ccc")])
    got = q_source_divergence(str(tmp_path))
    assert len(got) == 6

    xy = got[(got["source_a"] == "x") & (got["source_b"] == "y")].iloc[0]
    yx = got[(got["source_a"] == "y") & (got["source_b"] == "x")].iloc[0]
    assert xy["kl_unats"] == 81092 == yx["kl_unats"]
    assert (xy["n_a"], xy["n_b"]) == (3, 3)

    cx, cy, cz = {"a": 2, "b": 1}, {"a": 1, "b": 2}, {"c": 3}
    for sa, sb, ca, cb in (("x", "z", cx, cz), ("z", "x", cz, cx),
                           ("y", "z", cy, cz), ("z", "y", cz, cy)):
        alpha = sorted(set(ca) | set(cb))
        row = got[(got["source_a"] == sa)
                  & (got["source_b"] == sb)].iloc[0]
        assert row["kl_unats"] == _kl(ca, 3, cb, 3, alpha), (sa, sb)
