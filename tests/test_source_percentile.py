"""source_percentile_gate planted matrix: a 6-doc source maps to the
exact per-mille ladder 0/200/400/600/800/1000 with only the bottom
rung dropped; score TIES rank deterministically by doc_id; a singleton
source's only doc is its source's best (1000, kept) — the rule that
keeps the gate from deleting whole domains."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_source_percentile_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_source_percentile_gate

    rows = [
        # source A: 6 docs, strictly increasing lengths
        (0, "A", 10), (1, "A", 20), (2, "A", 30),
        (3, "A", 40), (4, "A", 50), (5, "A", 60),
        # source B: tie on score → rank by doc_id
        (6, "B", 25), (7, "B", 25), (8, "B", 99),
        # source C: singleton
        (9, "C", 1),
    ]
    pq.write_table(pa.table({
        "doc_id": np.asarray([r[0] for r in rows], dtype=np.int64),
        "text": ["x" * r[2] for r in rows],
        "lang": ["en"] * len(rows),
        "source": [r[1] for r in rows],
        "n_chars": np.asarray([r[2] for r in rows], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_source_percentile_gate(str(tmp_path))
    want = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "source": ["A"] * 6 + ["B"] * 3 + ["C"],
        "score": np.asarray([10, 20, 30, 40, 50, 60, 25, 25, 99, 1],
                            dtype=np.int64),
        "src_rank": np.asarray([1, 2, 3, 4, 5, 6, 1, 2, 3, 1],
                               dtype=np.int64),
        "pct_milli": np.asarray([0, 200, 400, 600, 800, 1000,
                                 0, 500, 1000, 1000], dtype=np.int64),
        "keep": np.asarray([0, 1, 1, 1, 1, 1, 0, 1, 1, 1],
                           dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
