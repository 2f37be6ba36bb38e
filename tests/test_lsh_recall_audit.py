"""lsh_recall_audit planted properties: an exact long-doc duplicate is
candidate+true+hit (identical shingle sets → identical signatures →
every band collides); a sub-3-token duplicate pair is TRUE (the truth
side's full-text fallback shingle) but can never be an LSH candidate
(no signature) — the documented recall hole the audit must REPORT, not
hide; unrelated decoys appear on neither side.  Also cross-checks the
planted directory against the DuckDB oracle so the hand-computed
expectation, the Ray pipeline and the SQL all agree on one input."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_lsh_recall_audit_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import (SQL_LSH_RECALL_AUDIT,
                                            q_lsh_recall_audit)

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",   # long original
        "alpha beta gamma delta epsilon zeta eta theta",   # exact dup → hit
        "tiny doc",                                        # 2 tokens
        "tiny doc",                                        # dup: true, no sig
        "completely different words appear here today",    # decoy
    ]
    pq.write_table(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_lsh_recall_audit(str(tmp_path))
    want = pd.DataFrame({
        "n_true": np.asarray([2], dtype=np.int64),
        "n_cand": np.asarray([1], dtype=np.int64),
        "n_hit": np.asarray([1], dtype=np.int64),
        "recall_milli": np.asarray([500], dtype=np.int64),
        "precision_milli": np.asarray([1000], dtype=np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(SQL_LSH_RECALL_AUDIT).fetchdf()
    pd.testing.assert_frame_equal(oracle.reset_index(drop=True), want)
