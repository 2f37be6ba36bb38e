"""source_quality_matrix planted pivot: engineered docs per source hit
specific funnel rules — source A all-ok, source B one too_short + one
ok (500/500 per-mille split), source C a long_word reject — and cell
counts/shares are exact."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_source_quality_matrix_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import (FUNNEL_MAX_TOKEN_LEN,
                                            FUNNEL_MIN_TOKENS,
                                            q_source_quality_matrix)

    okwords = " ".join(["word"] * max(FUNNEL_MIN_TOKENS, 10))
    longword = okwords + " " + "x" * (FUNNEL_MAX_TOKEN_LEN + 5)
    rows = [("A", okwords), ("A", okwords),
            ("B", "tiny"), ("B", okwords),
            ("C", longword)]
    pq.write_table(pa.table({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "text": [t for _, t in rows],
        "lang": ["en"] * len(rows),
        "source": [s for s, _ in rows],
        "n_chars": np.asarray([len(t) for _, t in rows], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_source_quality_matrix(str(tmp_path))
    want = pd.DataFrame({
        "source": ["A", "B", "B", "C"],
        "reason": ["ok", "ok", "too_short", "long_word"],
        "n_docs": np.asarray([2, 1, 1, 1], dtype=np.int64),
        "source_milli": np.asarray([1000, 500, 500, 1000],
                                   dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
