"""lang_id_eval planted confusion matrix: one clearly-cued doc per
language lands on the diagonal, a stopword-free German doc falls into
the documented default-to-English cell, and row_milli splits the
German row exactly 500/500."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_lang_id_eval_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_lang_id_eval

    rows = [
        ("en", "the cat and the dog of it"),
        ("de", "der hund und die katze ist"),
        ("de", "plain words only here"),          # no cues → 'en'
        ("fr", "le chat et la vie est"),
        ("es", "el perro y los gatos es una"),
        ("zh", "一些中文文本"),
    ]
    pq.write_table(pa.table({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "text": [t for _, t in rows],
        "lang": [l for l, _ in rows],
        "source": ["t"] * len(rows),
        "n_chars": np.asarray([len(t) for _, t in rows], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_lang_id_eval(str(tmp_path))
    want = pd.DataFrame({
        "true_lang": ["de", "de", "en", "es", "fr", "zh"],
        "pred_lang": ["de", "en", "en", "es", "fr", "zh"],
        "n": np.ones(6, dtype=np.int64),
        "row_milli": np.asarray([500, 500, 1000, 1000, 1000, 1000],
                                dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
