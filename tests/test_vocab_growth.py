"""vocab_growth planted properties: checkpoint semantics (doc_id < r),
the bit_length bucketing at exact power-of-two boundaries, repeated
terms counted once at their FIRST document, and token mass including
repeats."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_vocab_growth_planted_checkpoints(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_vocab_growth

    texts = [
        "a b c",        # doc 0: vocab {a,b,c}, 3 tokens
        "a a d",        # doc 1: +{d}, 3 tokens (repeat 'a' counts once)
        "e",            # doc 2: +{e}, 1 token
        "a b",          # doc 3: nothing new, 2 tokens
        "f g",          # doc 4: +{f,g}, 2 tokens
    ]
    pq.write_table(pa.table({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": texts,
        "lang": ["en"] * 5,
        "source": ["t"] * 5,
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_vocab_growth(str(tmp_path))
    # checkpoints: 1, 2, 4 (powers of two < 5) and the full corpus 5
    want = pd.DataFrame({
        "n_docs":   [1, 2, 4, 5],
        "n_tokens": [3, 6, 9, 11],
        "vocab":    [3, 4, 5, 7]})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
