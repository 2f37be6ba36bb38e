"""source_overlap planted properties: case-folded template matching,
within-source repeats collapsing to one template, sub-3-token docs
dropped, zero-overlap pairs absent, containment arithmetic exact."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_source_overlap_planted_matrix(ray_session, tmp_path):
    from darc_ray.pipelines.queries import q_source_overlap

    rows = [
        ("A", "the quick brown fox"),
        ("A", "the quick brown cat jumps"),   # same template as above
        ("A", "alpha beta gamma delta"),
        ("B", "The QUICK Brown dog"),          # case-folds to A's template
        ("B", "unique b text here"),
        ("C", "xx yy"),                        # < 3 tokens: contributes nothing
        ("C", "alpha beta gamma"),
    ]
    pq.write_table(pa.table({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "text": [t for _, t in rows],
        "lang": ["en"] * len(rows),
        "source": [s for s, _ in rows],
        "n_chars": np.asarray([len(t) for _, t in rows], dtype=np.int64)}),
        tmp_path / "documents.parquet")

    got = q_source_overlap(str(tmp_path))
    want = pd.DataFrame({
        "s1": ["A", "A"], "s2": ["B", "C"],
        "n_both": [1, 1], "n_s1": [2, 2], "n_s2": [2, 1],
        "containment_milli": [500, 1000]})   # B∩C empty → no row
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_entity_features_decoys_and_double_escape():
    """entity_features unit: bare ampersands never count; a
    double-escaped entity counts once in n_named (the non-overlapping
    scan stops after `&amp;`) and once in n_double; numeric dec/hex
    split; mass and flag arithmetic exact."""
    import pandas as pd

    from darc_ray.functions.text import entity_features

    texts = pd.Series([
        "AT&T and R&D and a & b",                 # decoys only
        "fish &amp; chips &lt;tag&gt;",           # 3 named
        "&#65;&#x41; mix",                        # 1 dec + 1 hex
        "&amp;amp; residue",                      # double escape
    ])
    f = entity_features(texts)
    assert f.loc[0].tolist()[1:] == [0, 0, 0, 0, 0, 0]  # all-zero signals
    assert f.loc[1, "n_named"] == 3
    assert f.loc[1, "entity_chars"] == 5 + 4 + 4
    assert f.loc[2, "n_numeric"] == 2
    assert f.loc[2, "entity_chars"] == 5 + 6
    # `&amp;amp;`: named scan matches `&amp;` once then sees "amp;"
    assert f.loc[3, "n_named"] == 1
    assert f.loc[3, "n_double"] == 1
    assert f.loc[3, "escaped"] == 1
