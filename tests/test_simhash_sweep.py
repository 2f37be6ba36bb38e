"""simhash_radius_sweep planted curve: three identical docs plus an
identical pair give exactly 4 hamming-0 pairs over 5 docs at radius 0,
and the curve is monotone in both columns at every radius."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_simhash_sweep_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_simhash_radius_sweep

    texts = (
        ["alpha beta gamma delta epsilon zeta eta theta iota kappa"] * 3
        + ["stream batch shard merge scan probe build spill flush park"] * 2
        + ["one completely different document talking about gardens",
           "numerical linear algebra kernels on distributed matrices",
           "seafood recipes from the northern coastline villages"])
    pq.write_table(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    out = q_simhash_radius_sweep(str(tmp_path))
    assert out["radius"].tolist() == list(range(7))
    r0 = out[out.radius == 0].iloc[0]
    assert r0["n_pairs"] == 4 and r0["n_docs"] == 5   # C(3,2)+C(2,2)
    assert (out["n_pairs"].diff().dropna() >= 0).all()
    assert (out["n_docs"].diff().dropna() >= 0).all()
    assert (out["n_docs"] <= 2 * out["n_pairs"].clip(lower=0) + 0
            ).where(out.n_pairs > 0, True).all()
