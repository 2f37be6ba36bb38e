"""cluster_size_hist planted census: three identical docs, a separate
identical pair, and five mutually-distant word-soup docs give the
exact histogram {1: 5, 2: 1, 3: 1} (identical docs share a simhash →
hamming 0 pairs; the distant docs must NOT pair under hamming ≤ 3)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_cluster_size_hist_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_cluster_size_hist

    texts = (
        ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 3
        + ["stream batch shard merge scan probe build spill flush park"] * 2
        + ["one completely different document talking about gardens",
           "numerical linear algebra kernels on distributed matrices",
           "seafood recipes from the northern coastline villages",
           "railway timetable optimization under winter constraints",
           "ancient pottery fragments catalogued by excavation layer"])
    pq.write_table(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_cluster_size_hist(str(tmp_path))
    want = pd.DataFrame({
        "cluster_size": np.asarray([1, 2, 3], dtype=np.int64),
        "n_clusters": np.asarray([5, 1, 1], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
