"""script_mix_gate planted properties: kernel matrix (homoglyph word
flags, pure-Cyrillic and CJK+separate-Latin-brand docs do NOT flag,
Greek-in-Latin word flags, digits are counted not flagged) and the
fixture-level census — exactly the two spoof kinds (Cyrillic
homoglyph substitution, μicro) flag, 40 of 120 docs."""

import pandas as pd


def test_script_mix_kernel_matrix():
    from darc_ray.functions.text import script_mix_features

    s = pd.Series([
        "pаyment due now",       # Cyrillic а inside Latin word
        "привет мир",                 # pure Cyrillic: legit
        "hello world 42",             # clean Latin + digits
        "中文文本 brand",              # CJK doc + separate Latin word
        "μicro chip",            # Greek μ inside Latin word
        "αλφα βητα",                  # pure Greek: legit
    ])
    f = script_mix_features(s)
    assert f["spoof"].tolist() == [1, 0, 0, 0, 1, 0]
    assert f.loc[0, "n_cyr"] == 1 and f.loc[0, "n_latin"] == 12
    assert f.loc[2, "n_digit"] == 2
    assert f.loc[3, "n_cjk"] == 4 and f.loc[3, "n_mixed_words"] == 0
    assert f.loc[4, "n_greek"] == 1


def test_script_mix_fixture_census(ray_session):
    from darc_ray.pipelines.queries import q_script_mix_gate

    out = q_script_mix_gate("/root/testdata/sf0.001")
    assert len(out) == 120
    # spoofs are exactly kinds 2 (homoglyph) and 5 (μicro): doc_id % 6
    kinds = out["doc_id"] % 6
    assert (out.loc[kinds.isin([2, 5]), "spoof"] == 1).all()
    assert (out.loc[~kinds.isin([2, 5]), "spoof"] == 0).all()
    # legit non-Latin kinds carry script mass without flagging
    assert (out.loc[kinds == 1, "n_cyr"] > 0).all()
    assert (out.loc[kinds == 3, "n_greek"] > 0).all()
    assert (out.loc[kinds == 4, "n_cjk"] > 0).all()
