"""dbscan_census planted closed form: a 3+2 split cluster whose five
members are all mutually within eps (every one core with exactly 4
other-neighbors — the MINPTS boundary itself), a BORDER point within
eps of only the far pair (2 neighbors < 4, but they are core), and a
NOISE point beyond eps of everything — census exactly
core 5 / border 1 / noise 1, hand-derived against
eps² = 1.6·10¹² (1.0 apart → d2 ≈ 1.1·10¹² inside; 2.0 apart →
4.4·10¹² outside)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def _vec(*coords):
    v = np.zeros(DIM)
    for c, s in coords:
        v[c] = s
    return v.tolist()


def test_core_border_noise_closed_form(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_dbscan_census

    vecs = []
    for i in range(3):                     # trio at the origin
        vecs.append(_vec((8, 0.001 * (i + 1))))
    for i in range(2):                     # pair at x = 1.0
        vecs.append(_vec((0, 1.0), (9, 0.001 * (i + 1))))
    vecs.append(_vec((0, 2.0)))            # border: near only the pair
    vecs.append(_vec((0, 5.0)))            # noise: near nothing
    pq.write_table(pa.table({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32()))}),
        tmp_path / "embeddings.parquet")

    got = q_dbscan_census(str(tmp_path))
    want = pd.DataFrame({
        "status": ["border", "core", "noise"],
        "n": np.asarray([1, 5, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
