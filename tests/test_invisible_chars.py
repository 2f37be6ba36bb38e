"""invisible_chars_gate planted properties: kernel matrix (each of the
six codepoints counted under its own class, cleaned length drops by
exactly the invisible total, regular hyphens/spaces never count) and
the fixture census — exactly the four planted kinds flag (80/100)."""

import pandas as pd


def test_invisible_kernel_matrix():
    from darc_ray.functions.text import invisible_features

    s = pd.Series([
        "a b",                     # NBSP
        "soft­hyphen",             # SHY inside a word
        "x​‌‍",          # ZWSP+ZWNJ+ZWJ
        "﻿start",                  # BOM
        "well-known clean text",        # decoys only
    ])
    f = invisible_features(s)
    assert f["n_nbsp"].tolist() == [1, 0, 0, 0, 0]
    assert f["n_shy"].tolist() == [0, 1, 0, 0, 0]
    assert f.loc[2, ["n_zwsp", "n_zwnj", "n_zwj"]].tolist() == [1, 1, 1]
    assert f.loc[3, "n_bom"] == 1
    assert (f["len_raw"] - f["len_clean"] == f["n_invisible"]).all()
    assert f["flag"].tolist() == [1, 1, 1, 1, 0]


def test_invisible_fixture_census(ray_session):
    from darc_ray.pipelines.queries import q_invisible_chars_gate

    out = q_invisible_chars_gate("/root/testdata/sf0.001")
    assert len(out) == 100
    kinds = out["doc_id"] % 5
    assert (out.loc[kinds == 0, "flag"] == 0).all()
    assert (out.loc[kinds == 1, "n_nbsp"] >= 1).all()
    assert (out.loc[kinds == 2, "n_shy"] >= 1).all()
    assert (out.loc[kinds == 3, "n_invisible"] >= 1).all()
    assert (out.loc[kinds == 4, "n_bom"] == 1).all()
    assert int(out["flag"].sum()) == 80
