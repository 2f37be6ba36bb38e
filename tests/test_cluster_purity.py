"""cluster_purity planted closed form over hand-placed clusters: a
4-member cluster with one intruder label (purity 750), a 2-member
cluster with a 1-1 label TIE (majority = smaller label, purity 500 —
pins the (count DESC, label ASC) tie-break), six singleton clusters
(purity 1000), and the exact Rand pair-confusion arithmetic
a=3 / b=4 / c=15 / d=44 over C(12,2)=66 pairs, all hand-derived."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 16


def _vec(*coords):
    v = np.zeros(DIM)
    for c, s in coords:
        v[c] = s
    return v.tolist()


def test_purity_tiebreak_and_rand_counts(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_cluster_purity

    vecs, labels = [], []
    # centroids = vec_id 0..7 at distinct corners
    cent_labels = [0, 2, 4, 4, 4, 4, 4, 4]
    for j in range(8):
        vecs.append(_vec((j, 0.1)))
        labels.append(cent_labels[j])
    # three members of cluster 0 (labels 0, 0, 1)
    for i, lab in enumerate((0, 0, 1)):
        vecs.append(_vec((0, 0.1), (8, 0.001 * (i + 1))))
        labels.append(lab)
    # one member of cluster 1 (label 3 — ties the centroid's label 2)
    vecs.append(_vec((1, 0.1), (9, 0.001)))
    labels.append(3)

    pq.write_table(pa.table({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        "label": np.asarray(labels, dtype=np.int32)}),
        tmp_path / "embeddings.parquet")

    got = q_cluster_purity(str(tmp_path))
    want = pd.DataFrame({
        "cluster": np.arange(8, dtype=np.int64),
        "n_vecs": np.asarray([4, 2, 1, 1, 1, 1, 1, 1], dtype=np.int64),
        "top_label": np.asarray([0, 2, 4, 4, 4, 4, 4, 4],
                                dtype=np.int64),
        "top_n": np.asarray([3, 1, 1, 1, 1, 1, 1, 1], dtype=np.int64),
        "purity_milli": np.asarray([750, 500, 1000, 1000, 1000, 1000,
                                    1000, 1000], dtype=np.int64),
        "rand_a": np.full(8, 3, dtype=np.int64),
        "rand_b": np.full(8, 4, dtype=np.int64),
        "rand_c": np.full(8, 15, dtype=np.int64),
        "rand_d": np.full(8, 44, dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want)
