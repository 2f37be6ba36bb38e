"""Planted-property tests for the late-round-5 families: `image_dhash`
(gradient-hash near-dup gate), `clip_alignment` (deterministic CLIP-
stub cross-modal scorer) and `semdedup` (cluster-then-dedup).  DuckDB
parity lives in test_queries.py's ORACLE_SQL parametrization; these
assert the planted semantics directly."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from darc_ray.functions import image as img
from darc_ray.stages.multimodal import (ClipAlignStub,
                                        ensure_image_dhash_fixture,
                                        image_dhash_batch)


def _fixture_hashes() -> dict[str, int]:
    t = pq.read_table(ensure_image_dhash_fixture())
    out = image_dhash_batch(t).to_pandas()
    return dict(zip(out["image_id"], out["dhash"]))


def test_dhash_planted_near_dups_within_radius():
    hs = _fixture_hashes()
    assert img.hamming64(hs["dh-0-tex"], hs["dh-0-near"]) <= 1
    assert img.hamming64(hs["dh-1-tex"], hs["dh-1-near"]) <= 1
    assert hs["dh-2-copy"] == hs["dh-2-tex"]


def test_dhash_distinct_textures_far_apart():
    hs = _fixture_hashes()
    tex = [hs[f"dh-{i}-tex"] for i in range(6)]
    for i in range(6):
        for j in range(i + 1, 6):
            assert img.hamming64(tex[i], tex[j]) > 6, (i, j)


def test_dhash_exercises_signed_bit63():
    # at least one fixture hash must have bit 63 set (negative int64)
    # so the SQL oracle's signed wrap is actually covered
    hs = _fixture_hashes()
    assert any(v < 0 for v in hs.values())
    assert any(v >= 0 for v in hs.values())


def test_dhash_brightness_shift_invariance():
    # uniform +k luma shifts every cell mean equally → same hash; the
    # property that makes dHash a useful second modality next to phash
    yy, xx = np.mgrid[0:16, 0:18]
    base = np.stack([(10 + (7 * xx + 5 * yy + (xx * yy) % 31) % 150)] * 3,
                    axis=2).astype(np.uint8)
    assert img.dhash64(base) == img.dhash64(base + 40)


def test_dhash_rejects_tiny_images():
    with pytest.raises(ValueError):
        img.dhash64(np.zeros((7, 20, 3), np.uint8))
    with pytest.raises(ValueError):
        img.dhash64(np.zeros((20, 8, 3), np.uint8))


def _clip(rows: list[tuple[str, str, int]]):
    t = pa.Table.from_pydict({
        "image_id": [r[0] for r in rows],
        "caption": [r[1] for r in rows],
        "phash": pa.array([r[2] for r in rows], type=pa.int64())})
    return ClipAlignStub()(t).to_pandas().set_index("image_id")


def test_clip_stub_deterministic_and_bounded():
    rows = [("a", "harbor at dusk", 1234567), ("b", "", -42),
            ("c", "one", 2**62)]
    d1, d2 = _clip(rows), _clip(rows)
    assert (d1["score"] == d2["score"]).all()
    assert (d1["score"].abs() <= 64).all()
    assert d1.loc["b", "score"] == 0 and d1.loc["b", "n_tokens"] == 0
    assert d1.loc["b", "aligned"] == 0  # score > 0 gate


def test_clip_stub_score_flips_with_image_tower():
    # same caption against phash h and ~h (all 64 bits flipped) must
    # give exactly opposite scores: the image tower is ±1 per bit
    h = 987654321
    flipped = ~h
    d = _clip([("a", "stone pier after rain", h),
               ("b", "stone pier after rain", flipped)])
    assert d.loc["a", "score"] == -d.loc["b", "score"]


def test_clip_stub_token_cache_warms():
    stub = ClipAlignStub()
    t = pa.Table.from_pydict({
        "image_id": ["a"], "caption": ["pine ridge pine ridge"],
        "phash": pa.array([77], type=pa.int64())})
    stub(t)
    assert set(stub._cache) == {"pine", "ridge"}


def test_semdedup_planted_copies_are_dups(ray_session):
    from darc_ray.pipelines.queries import QUERIES

    out = QUERIES["semdedup"]("/root/testdata/sf0.001")
    by_id = out.set_index("vec_id")
    planted = by_id[by_id.index >= 1_000_000]
    assert len(planted) == 50
    # every planted exact copy is marked dup of its original
    assert (planted["is_dup"] == 1).all()
    assert (planted["dup_of"] == planted.index - 1_000_000).all()
    assert (planted["keep"] == 0).all()
    # originals stay keepers (no lower-id partner at cosine >= .95)
    originals = by_id.loc[sorted(set(planted.index - 1_000_000))]
    assert (originals["keep"] == 1).all()
    # copy and original land in the SAME cluster (identical vectors)
    for v in planted.index:
        assert by_id.loc[v, "cluster"] == by_id.loc[v - 1_000_000, "cluster"]


def test_corner_logo_planted_flavors():
    import pyarrow.parquet as pq

    from darc_ray.stages.multimodal import (ensure_image_logo_fixture,
                                            image_corner_logo_batch)

    t = pq.read_table(ensure_image_logo_fixture())
    df = image_corner_logo_batch(t).to_pandas().set_index("image_id")
    for i in range(4):
        assert df.loc[f"logo-{i}-clean", "has_corner_logo"] == 0
    assert df.loc["logo-0-tl", "tl_logo"] == 1
    assert df.loc["logo-1-tr", "tr_logo"] == 1
    assert df.loc["logo-2-bl", "bl_logo"] == 1
    assert df.loc["logo-3-br", "br_logo"] == 1
    assert df.loc["logo-two-corners", "n_logo_corners"] == 2
    # uniform corner near the global mean must NOT flag: the gate is
    # uniformity AND contrast, not uniformity alone
    assert df.loc["logo-lowcontrast", "has_corner_logo"] == 0


def test_image_exact_dedup_planted_pairdups(ray_session):
    from darc_ray.pipelines.queries import QUERIES

    out = QUERIES["image_exact_dedup"]("/root/testdata/sf0.001")
    by_id = out.set_index("image_id")
    # the two exact full-pair duplicate rows share row 0's pixels
    assert by_id.loc["cap-99-pairdup-a", "keeper"] == "cap-00"
    assert by_id.loc["cap-99-pairdup-b", "keeper"] == "cap-00"
    assert by_id.loc["cap-99-pairdup-a", "is_dup"] == 1
    assert by_id.loc["cap-00", "is_dup"] == 0
    assert by_id.loc["cap-00", "n_copies"] >= 3
    # flavor-6 rows reuse the pixels of row i-6 → byte-identical
    assert by_id.loc["cap-06", "keeper"] == "cap-00"


def test_token_length_hist_shares_sum_to_thousand_ish(ray_session):
    from darc_ray.pipelines.queries import QUERIES

    out = QUERIES["token_length_hist"]("/root/testdata/sf0.001")
    assert (out["len_bucket"] >= 1).all() and (out["len_bucket"] <= 16).all()
    assert out["n_tokens"].sum() > 0
    # floor division: shares sum to 1000 - (#buckets - 1) at worst
    s = out["share_milli"].sum()
    assert 1000 - len(out) < s <= 1000


def test_image_size_gate_metadata_only(ray_session):
    from darc_ray.pipelines.queries import QUERIES

    out = QUERIES["image_size_gate"]("/root/testdata/sf0.001")
    assert (out["n_pixels"] == out["w"] * out["h"]).all()
    assert (out["min_side"] == out[["w", "h"]].min(axis=1)).all()
    # fixture dims are 12-18 px per side → every row passes the gate
    assert (out["keep"] == 1).all()


def test_hash_consensus_exact_pixel_dups_hit_both(ray_session):
    from darc_ray.pipelines.queries import QUERIES

    out = QUERIES["hash_consensus_dedup"]("/root/testdata/sf0.001")
    pairs = {(r.a, r.b): r for r in out.itertuples()}
    # exact-pixel duplicates collide under BOTH hash modalities
    for a, b in [("cap-00", "cap-06"), ("cap-00", "cap-99-pairdup-a"),
                 ("cap-99-pairdup-a", "cap-99-pairdup-b")]:
        assert (a, b) in pairs, (a, b)
        assert pairs[(a, b)].both_hashes == 1
    # provenance flags are consistent with the union semantics
    assert ((out["by_phash"] | out["by_dhash"]) == 1).all()
    assert (out["both_hashes"] <= out["by_phash"]).all()
    assert (out["both_hashes"] <= out["by_dhash"]).all()


def test_pair_curation_v2_every_stage_fires(ray_session):
    """Production-ordered funnel: every disposition class must appear,
    and the planted rows land exactly where the stage order says."""
    from darc_ray.pipelines.queries import q_pair_curation_v2

    df = (q_pair_curation_v2("/root/testdata/sf0.001")
          .set_index("image_id")["disposition"])
    # planted landings
    assert df.loc["cap-00"] == "size"             # 12x12 fails min-side 13
    assert df.loc["cap-01"] == "caption"          # URL spam (size-ok dims)
    assert df.loc["cap-22"] == "exact_dup"        # byte-copy of cap-16
    # the near-dup whose BYTES differ but phash matches cap-08: the md5
    # pass cannot catch it, the perceptual keep-one must
    assert df.loc["cap-98-neardup"] == "image_dup"
    # dedup precedes scoring: cap-08 keeps its phash group, then fails
    # the alignment gate
    assert df.loc["cap-08"] == "misaligned"
    cats = set(df.unique())
    assert {"size", "caption", "exact_dup", "image_dup",
            "misaligned"} <= cats
    assert any(d.startswith("bucket_") for d in cats)


def test_image_channel_stats_identities(ray_session):
    import pyarrow.parquet as pq

    from darc_ray.functions import image as img
    from darc_ray.pipelines.queries import QUERIES
    from darc_ray.stages.multimodal import ensure_image_borders_fixture

    out = QUERIES["image_channel_stats"]("/root/testdata/sf0.001")
    assert list(out["channel"]) == [0, 1, 2]
    # cross-check channel 0 against a direct numpy pass
    t = pq.read_table(ensure_image_borders_fixture())
    import numpy as np
    s = n = q = 0
    for payload in t.column("bytes").to_pylist():
        pix = img.raw_decode(payload).astype(np.int64)
        s += int(pix[..., 0].sum())
        q += int((pix[..., 0] ** 2).sum())
        n += pix.shape[0] * pix.shape[1]
    r = out.set_index("channel").loc[0]
    assert (r["psum"], r["sumsq"], r["n_pixels"]) == (s, q, n)
    assert r["mean_milli"] == s * 1000 // n
    assert r["var_milli"] == (q - s * s // n) * 1000 // n
