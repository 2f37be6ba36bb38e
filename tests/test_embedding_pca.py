"""embedding_pca planted closed form: four points at t·(3,4)/2¹⁰ for
t ∈ {−2,−1,1,2} quantize to EXACT multiples of (3072, 4096) (powers of
two — no rounding residue), so the centered Gram matrix is exactly
c·uuᵀ with u = (3,4): mu is exactly 0, the rescaled matrix is
[[36864, 49152], [49152, 65536]] (9:12:16 × 2¹⁶/16), and power
iteration locks onto the exact eigenvector after ONE step —
v_q = (786432, 1048576, 0, …) = (3,4)/4 · 2²⁰, hand-derived."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64


def test_rank1_cloud_recovers_exact_direction(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_embedding_pca

    u = np.zeros(DIM)
    u[0], u[1] = 3 / 1024, 4 / 1024
    vecs = [(t * u).tolist() for t in (-2, -1, 1, 2)]
    pq.write_table(pa.table({
        "vec_id": np.arange(4, dtype=np.int64),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32()))}),
        tmp_path / "embeddings.parquet")

    got = q_embedding_pca(str(tmp_path))
    assert len(got) == DIM
    assert (got["mu"] == 0).all()
    var_s = np.zeros(DIM, dtype=np.int64)
    var_s[0], var_s[1] = 36864, 65536
    assert np.array_equal(got["var_s"].to_numpy(), var_s)
    v_q = np.zeros(DIM, dtype=np.int64)
    v_q[0], v_q[1] = 786432, 1048576
    assert np.array_equal(got["v_q"].to_numpy(), v_q)
