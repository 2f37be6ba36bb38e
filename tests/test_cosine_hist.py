"""cosine_hist planted closed forms over basis-vector geometry: an
identical pair lands in bucket 10 (qmicro exactly 10⁶), an opposite
pair in −10, orthogonal pairs in 0 (qmicro = floor(0.5) = 0), 45°
pairs in 7 (floor(707107.28…·sign) — and the NEGATIVE 45° pair in −8,
pinning the floor-not-truncate semantics on negatives that DuckDB's
CAST(floor(...)) mirrors while a bare // would not)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_cosine_hist_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_cosine_hist

    dim = 64

    def vec(*coords):
        v = np.zeros(dim)
        for c, s in coords:
            v[c] = s * 0.001
        return v.tolist()

    vecs = [vec((0, 1)), vec((0, 1)), vec((0, -1)),
            vec((1, 1)), vec((0, 1), (1, 1))]
    pq.write_table(pa.table({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": pa.array(vecs, type=pa.list_(pa.float64()))}),
        tmp_path / "embeddings.parquet")

    got = q_cosine_hist(str(tmp_path))
    want = pd.DataFrame({
        "bucket": np.asarray([-10, -8, 0, 7, 10], dtype=np.int64),
        "n_pairs": np.asarray([2, 1, 3, 3, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
