"""phash_recall_audit planted curve: all seven ±1-noise dup pairs are
truth AND candidates at every radius (recall 1000 throughout), no
unrelated same-dims pair ever enters truth (SSE thousands of times
over the gate), and precision decays exactly 1000 → 777 → 92 as the
radius sweeps 6 → 16 → 24 — the calibration story for image_dedup's
production radius."""


def test_phash_recall_audit_curve(ray_session):
    from darc_ray.pipelines.queries import q_phash_recall_audit

    out = q_phash_recall_audit("/root/testdata/sf0.001")
    assert out["radius"].tolist() == [6, 16, 24]
    assert (out["n_true"] == 7).all()
    assert (out["n_hit"] == 7).all()
    assert (out["recall_milli"] == 1000).all()
    assert out["n_cand"].tolist() == [7, 9, 76]
    assert out["precision_milli"].tolist() == [1000, 777, 92]
    # candidates grow monotonically with the radius, hits never exceed
    assert (out["n_cand"].diff().dropna() >= 0).all()
    assert (out["n_hit"] <= out["n_cand"]).all()
