"""ngram_novelty planted arithmetic: exact duplicates score exactly 0
(every shingle df ≥ 2); a fully unique doc scores 1000; two docs
sharing exactly one of their three shingles each score 666‰ by hand;
a duplicated sub-3-token doc scores 0 through the full-text-fallback
shingle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_ngram_novelty_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_ngram_novelty

    texts = [
        "alpha beta gamma delta epsilon",        # 0: dup of 1
        "alpha beta gamma delta epsilon",        # 1
        "totally fresh words appear here",       # 2: unique → 1000
        "a b c d e",                             # 3: shares 'a b c' w/ 4
        "a b c x y",                             # 4
        "t u",                                   # 5: short dup of 6
        "t u",                                   # 6
    ]
    pq.write_table(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_ngram_novelty(str(tmp_path)).set_index("doc_id")
    assert got.loc[0, "novelty_milli"] == 0
    assert got.loc[1, "novelty_milli"] == 0
    assert (got.loc[[0, 1], "template_heavy"] == 1).all()
    assert got.loc[2, "novelty_milli"] == 1000
    # docs 3/4: 3 shingles each, exactly one shared → 2·1000//3 = 666
    assert got.loc[3, "n_shingles"] == 3 and got.loc[3, "n_unique"] == 2
    assert got.loc[3, "novelty_milli"] == 666
    assert got.loc[4, "novelty_milli"] == 666
    # short dup pair through the full-text fallback shingle
    assert got.loc[5, "n_shingles"] == 1 and got.loc[5, "novelty_milli"] == 0
    assert got.loc[6, "template_heavy"] == 1
