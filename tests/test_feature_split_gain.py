"""feature_split_gain planted closed form: dim 1 separates the two
labels PERFECTLY at boundary 4 (±0.5 quantizes to buckets 4 and 12;
score = (36·6+36·6)·10⁶//36 = 12·10⁶, first of the tied perfect
boundaries wins), dim 2 splits only half of label 0 (score
(81+135)·10⁶//27 = 8·10⁶), and every all-zero dim has no non-degenerate
boundary (all mass in bucket 8 → every split empty-sided, score −1,
boundary 0 reported) — all hand-derived."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def test_perfect_partial_and_degenerate_dims(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_feature_split_gain

    vecs, labels = [], []
    for i in range(6):                       # label 0
        v = np.zeros(DIM)
        v[0] = -0.5
        v[1] = -0.5 if i < 3 else 0.5
        vecs.append(v.tolist())
        labels.append(0)
    for i in range(6):                       # label 1
        v = np.zeros(DIM)
        v[0], v[1] = 0.5, 0.5
        vecs.append(v.tolist())
        labels.append(1)
    pq.write_table(pa.table({
        "vec_id": np.arange(12, dtype=np.int64),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": np.asarray(labels, dtype=np.int32)}),
        tmp_path / "embeddings.parquet")

    got = q_feature_split_gain(str(tmp_path))
    assert len(got) == DIM
    r1 = got[got["dim"] == 1].iloc[0]
    assert (r1["best_split"], r1["n_left"], r1["n_right"],
            r1["score_q"]) == (4, 6, 6, 12_000_000)
    r2 = got[got["dim"] == 2].iloc[0]
    assert (r2["best_split"], r2["n_left"], r2["n_right"],
            r2["score_q"]) == (4, 3, 9, 8_000_000)
    rest = got[got["dim"] >= 3]
    assert (rest["score_q"] == -1).all()
    assert (rest["best_split"] == 0).all()
    assert (rest["n_left"] == 0).all()
    assert (rest["n_right"] == 12).all()
