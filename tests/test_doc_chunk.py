"""doc_chunk planted boundaries: a 32-token doc yields exactly ONE
chunk (the containment-free rule — the stride-24 follow-up would be a
subset); 33 tokens yield two (the second carrying the 9-token tail
with 8 overlap); 50 tokens yield two ending exactly at EOF; ≤24
tokens yield one; an empty doc yields nothing; every chunk_md5
re-derives from the planted words."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


def test_doc_chunk_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_doc_chunk

    texts = [_words(32), _words(33), _words(50), _words(24),
             _words(1), "   "]
    pq.write_table(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    out = q_doc_chunk(str(tmp_path))
    counts = out.groupby("doc_id").size().to_dict()
    assert counts == {0: 1, 1: 2, 2: 2, 3: 1, 4: 1}

    d1 = out[out.doc_id == 1].set_index("chunk_idx")
    assert d1.loc[0, "n_toks"] == 32 and d1.loc[1, "n_toks"] == 9
    assert d1.loc[1, "start_tok"] == 24
    want = hashlib.md5(" ".join(
        f"w{i}" for i in range(24, 33)).encode()).hexdigest()
    assert d1.loc[1, "chunk_md5"] == want

    d2 = out[out.doc_id == 2].set_index("chunk_idx")
    assert d2.loc[1, "n_toks"] == 26          # tokens 24..49
