"""zipf_spectrum planted frequencies: engineered counts
{a,b,c:1, d:2, e:3, f:4, g:8, h:9} give four exact power-of-two
buckets with hand-computed masses and the cumulative-coverage ladder
586 → 724 → 896 → 1000 (total mass 29)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_zipf_spectrum_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_zipf_spectrum

    words = (["a", "b", "c"] + ["d"] * 2 + ["e"] * 3 + ["f"] * 4
             + ["g"] * 8 + ["h"] * 9)
    texts = [" ".join(words[:10]), " ".join(words[10:])]
    pq.write_table(pa.table({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * 2,
        "source": ["t"] * 2,
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_zipf_spectrum(str(tmp_path))
    want = pd.DataFrame({
        "bucket": np.asarray([1, 2, 3, 4], dtype=np.int64),
        "n_types": np.asarray([3, 2, 1, 2], dtype=np.int64),
        "token_mass": np.asarray([3, 5, 4, 17], dtype=np.int64),
        "mass_milli": np.asarray([103, 172, 137, 586], dtype=np.int64),
        "cum_mass_milli": np.asarray([1000, 896, 724, 586],
                                     dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
