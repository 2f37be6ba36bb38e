"""split_leak_audit planted properties: the sf corpus result is pinned
(40 planted dup pairs → 37 within-train, 2 leak into val, 1 into test
— the measured split-before-dedup contamination), and a tmp corpus
with an engineered duplicate TRIPLE yields exactly the C(3,2) cells
the test derives from its own independent md5-split computation."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _split_of(doc_id: int) -> str:
    u = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8],
                       "big") % 100
    from darc_ray.pipelines.queries import SPLIT_TRAIN_PCT, SPLIT_VAL_PCT
    return ("train" if u < SPLIT_TRAIN_PCT
            else "val" if u < SPLIT_VAL_PCT else "test")


def test_split_leak_sf_pinned(ray_session):
    from darc_ray.pipelines.queries import q_split_leak_audit

    out = q_split_leak_audit("/root/testdata/sf0.001")
    cells = {(r.split_a, r.split_b): r.n_pairs
             for r in out.itertuples(index=False)}
    assert cells == {("train", "train"): 37, ("train", "val"): 2,
                     ("test", "train"): 1}
    assert int(out.loc[out.leaked == 1, "n_pairs"].sum()) == 3


def test_split_leak_planted_triple(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_split_leak_audit

    ids = [200, 201, 202]           # dup triple (+ planted copies of
    texts = ["same text here"] * 3  # ids < 40 don't exist: ids ≥ 40)
    ids += [300, 301]
    texts += ["unique one thing", "unique other thing"]
    pq.write_table(pa.table({
        "doc_id": np.asarray(ids, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * 5, "source": ["t"] * 5,
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    want: dict[tuple, int] = {}
    sp = sorted(_split_of(d) for d in (200, 201, 202))
    for i in range(3):
        for j in range(i + 1, 3):
            k = (sp[i], sp[j]) if sp[i] <= sp[j] else (sp[j], sp[i])
            want[k] = want.get(k, 0) + 1

    out = q_split_leak_audit(str(tmp_path))
    cells = {(r.split_a, r.split_b): r.n_pairs
             for r in out.itertuples(index=False)}
    assert cells == want
