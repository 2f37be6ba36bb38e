"""intl_curation_pipeline planted dispositions: the kind→stage map is
exact over the 160-doc fixture (80 ok / 40 spoof / 20 template / 20
short), decomposed-accent docs survive WITH changed=1, and the
order-proving kind 7 — whose homoglyph exists only after NFC
composition — lands in 'spoof' with changed=1 (a gate-before-normalize
pipeline would pass it)."""


def test_intl_pipeline_dispositions(ray_session):
    from darc_ray.pipelines.queries import q_intl_curation_pipeline

    out = q_intl_curation_pipeline("/root/testdata/sf0.001")
    assert len(out) == 160
    kinds = out["doc_id"] % 8

    assert out["reject_stage"].value_counts().to_dict() == {
        "ok": 80, "spoof": 40, "template": 20, "short": 20}
    assert (out.loc[kinds.isin([0, 1, 5, 6]), "keep"] == 1).all()
    assert (out.loc[kinds == 2, "reject_stage"] == "spoof").all()
    assert (out.loc[kinds == 3, "reject_stage"] == "template").all()
    assert (out.loc[kinds == 3, "novelty_milli"] == 0).all()
    assert (out.loc[kinds == 4, "reject_stage"] == "short").all()
    # decomposed accents: transformed, then kept
    assert (out.loc[kinds == 1, "changed"] == 1).all()
    assert (out.loc[kinds == 1, "keep"] == 1).all()
    assert (out.loc[kinds == 6, "changed"] == 0).all()
    # order proof: homoglyph only visible after NFC
    k7 = out.loc[kinds == 7]
    assert (k7["changed"] == 1).all()
    assert (k7["reject_stage"] == "spoof").all()
    # clean docs clear the novelty gate with margin
    assert out.loc[out.reject_stage == "ok", "novelty_milli"].min() >= 400
