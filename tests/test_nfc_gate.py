"""nfc_gate planted semantics over the fixture: the composed/decomposed
pair (docs 90/91) collapses to one canon_id with a 1-codepoint length
drop; Å-singleton docs (kind 3) change CONTENT without changing length
— the case a length-only test misses; no-precomposed combining marks
(kind 4) are NFC-stable; decomposed kind-2 docs lose exactly their two
combining marks."""


def test_nfc_gate_planted(ray_session):
    from darc_ray.pipelines.queries import q_nfc_gate

    out = q_nfc_gate("/root/testdata/sf0.001").set_index("doc_id")

    # composed/decomposed pair collapses; decomposed loses 1 codepoint
    assert out.loc[91, "canon_id"] == 90
    assert out.loc[90, "changed"] == 0
    assert out.loc[91, "changed"] == 1
    assert out.loc[91, "len_raw"] - out.loc[91, "len_nfc"] == 1
    assert out.loc[90, "len_raw"] == out.loc[91, "len_nfc"]

    kinds = out.index % 5
    k2 = out[(kinds == 2) & (out.index < 90)]
    assert (k2["changed"] == 1).all()
    assert ((k2["len_raw"] - k2["len_nfc"]) == 2).all()   # é + è compose
    k3 = out[(kinds == 3) & (out.index < 90)]
    assert (k3["changed"] == 1).all()
    assert (k3["len_raw"] == k3["len_nfc"]).all()          # Å singleton
    k4 = out[(kinds == 4) & (out.index < 90)]
    assert (k4["changed"] == 0).all()                      # x̄ stable
    k0 = out[(kinds == 0) & (out.index < 90)]
    assert (k0["changed"] == 0).all()                      # ASCII
    # only the planted pair shares an NFC form
    assert (out["canon_id"] != out.index).sum() == 1
