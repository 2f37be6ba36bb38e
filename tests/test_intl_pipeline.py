"""intl_curation_pipeline planted dispositions over the 160-doc
fixture: 60 ok / 20 spoof / 60 template / 20 short.  The NFC-first
ordering is pinned by the kind-6/7 NFD twin pairs — raw bytes differ,
NFC forms are identical, so BOTH halves of every pair collapse to
novelty 0 and read 'template' (a gate-before-normalize pipeline would
score all 40 unique and pass them); decomposed-accent kind-1 docs
survive WITH changed=1; all four ASCII templates appear 5× each."""

import unicodedata

import duckdb


def test_intl_pipeline_dispositions(ray_session):
    from darc_ray.functions.text import ensure_intl_fixture
    from darc_ray.pipelines.queries import q_intl_curation_pipeline

    out = q_intl_curation_pipeline("/root/testdata/sf0.001")
    assert len(out) == 160
    kinds = out["doc_id"] % 8

    assert out["reject_stage"].value_counts().to_dict() == {
        "ok": 60, "template": 60, "spoof": 20, "short": 20}
    assert (out.loc[kinds.isin([0, 1, 5]), "keep"] == 1).all()
    assert (out.loc[kinds == 2, "reject_stage"] == "spoof").all()
    assert (out.loc[kinds == 3, "reject_stage"] == "template").all()
    assert (out.loc[kinds == 3, "novelty_milli"] == 0).all()
    assert (out.loc[kinds == 4, "reject_stage"] == "short").all()
    # decomposed accents: transformed, then kept
    assert (out.loc[kinds == 1, "changed"] == 1).all()
    assert (out.loc[kinds == 1, "keep"] == 1).all()
    # ORDER PROOF: NFD twins — raw differs, NFC identical, both halves
    # collapse to novelty 0 → 'template' (composed half unchanged,
    # decomposed half changed)
    fix = duckdb.execute(
        f"SELECT * FROM read_parquet('{ensure_intl_fixture()}')"
    ).fetchdf().set_index("doc_id")
    for d in range(7, 160, 8):
        t6, t7 = fix.loc[d - 1, "text"], fix.loc[d, "text"]
        assert t6 != t7
        assert unicodedata.normalize("NFC", t7) == t6
    assert (out.loc[kinds == 6, "changed"] == 0).all()
    assert (out.loc[kinds == 7, "changed"] == 1).all()
    assert (out.loc[kinds.isin([6, 7]), "reject_stage"] == "template").all()
    assert (out.loc[kinds.isin([6, 7]), "novelty_milli"] == 0).all()
    # clean docs clear the novelty gate with margin
    assert out.loc[out.reject_stage == "ok", "novelty_milli"].min() >= 400
