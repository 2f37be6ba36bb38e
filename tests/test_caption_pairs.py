"""Planted-property tests for the caption-axis pair families
(`caption_gate`, `caption_dedup`): every fixture flavor carries a
known expected outcome, asserted directly (the DuckDB-parity check
lives in test_queries.py's ORACLE_SQL parametrization)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from darc_ray.stages.multimodal import (caption_gate_batch,
                                        ensure_image_caption_fixture)


def _gate(captions: list[str]):
    t = pa.Table.from_pydict({
        "image_id": [f"t-{i}" for i in range(len(captions))],
        "caption": captions})
    return caption_gate_batch(t).to_pandas()


def test_gate_clean_caption_keeps():
    df = _gate(["Photo of a harbor beside the river bend after rain"])
    assert df["keep"].iloc[0] == 1
    assert df["has_url"].iloc[0] == 0
    assert df["n_words"].iloc[0] == 10


def test_gate_url_spam_rejected():
    df = _gate(["download now at http://x.test/full size",
                "see www.example.test for more",
                "secure https://a.b/c d e"])
    assert (df["has_url"] == 1).all()
    assert (df["keep"] == 0).all()


def test_gate_word_count_bounds():
    df = _gate(["img",                                  # 1 word: too short
                "two words",                            # boundary keep
                " ".join(f"tag{k}" for k in range(40)),  # 40 words: too long
                " ".join(f"tag{k}" for k in range(32))])  # boundary keep
    assert list(df["keep"]) == [0, 1, 0, 1]
    assert list(df["n_words"]) == [1, 2, 40, 32]


def test_gate_allcaps_and_low_alpha_rejected():
    df = _gate(["STOCK PHOTO SALE BANNER BUY NOW",
                "$$$ 12345 --- 999 !!! 7 ### 777",
                "Mixed Case is perfectly Fine here"])
    assert list(df["keep"]) == [0, 0, 1]
    assert df["upper_milli"].iloc[0] == 1000
    assert df["alpha_milli"].iloc[1] == 0


def test_gate_integer_ratios_exact():
    # "Ab cd" → 5 chars, 4 alpha, 1 upper: 4000//5=800, 1000//4=250
    df = _gate(["Ab cd"])
    assert df["alpha_milli"].iloc[0] == 800
    assert df["upper_milli"].iloc[0] == 250


def test_fixture_plants_every_dedup_flavor(ray_session):
    """The fixture must contain all three duplicate axes, and the
    cross-modal flags must separate them."""
    from darc_ray.pipelines.queries import q_caption_dedup

    ensure_image_caption_fixture()
    df = q_caption_dedup("/root/testdata/sf0.001").set_index("image_id")

    # flavor-5 rows share row i-5's caption with NEW pixels
    assert df.loc["cap-13", "same_caption_diff_image"] == 1
    assert df.loc["cap-13", "exact_pair_dup"] == 0
    assert df.loc["cap-08", "same_caption_diff_image"] == 1  # its partner
    # flavor-6 rows reuse row i-6's pixels with a NEW caption
    assert df.loc["cap-14", "same_image_diff_caption"] == 1
    assert df.loc["cap-14", "exact_pair_dup"] == 0
    # the explicit full-pair duplicates of row 0
    for iid in ("cap-00", "cap-99-pairdup-a", "cap-99-pairdup-b"):
        assert df.loc[iid, "exact_pair_dup"] == 1
    # keep-one: exactly one keeper per caption group and per phash group
    assert df.loc["cap-00", "keep"] == 1
    assert df.loc["cap-99-pairdup-a", "keep"] == 0
    assert df.loc["cap-99-pairdup-b", "keep"] == 0
    # counts are exact
    assert df.loc["cap-00", "pair_n"] == 3
    assert int(df["keep"].sum()) < len(df)


def test_gate_never_reads_bytes_column():
    """The gate kernel must not require the (huge at 100 TB) bytes
    column — it runs on a pruned (image_id, caption) projection."""
    t = pa.Table.from_pydict({"image_id": ["a"], "caption": ["two words"]})
    out = caption_gate_batch(t).to_pandas()
    assert out["keep"].iloc[0] == 1


def test_pair_capstone_dispositions(ray_session):
    """Composed pair-curation pass: gate rejects label 'caption',
    cross-modal losers label by axis, keepers get an aspect bucket."""
    from darc_ray.pipelines.queries import q_pair_curation_pipeline

    df = (q_pair_curation_pipeline("/root/testdata/sf0.001")
          .set_index("image_id")["disposition"])
    assert df.loc["cap-01"] == "caption"          # URL spam
    assert df.loc["cap-02"] == "caption"          # too short
    assert df.loc["cap-03"] == "caption"          # ALL CAPS
    assert df.loc["cap-00"].startswith("bucket_")  # clean keeper
    # full-pair duplicates of cap-00 lose on the caption axis
    assert df.loc["cap-99-pairdup-a"] == "caption_dup"
    assert df.loc["cap-99-pairdup-b"] == "caption_dup"
    # flavor-6 rows (same pixels, different caption) lose on the image
    # axis when their caption passes the gate
    assert df.loc["cap-06"] == "image_dup"
    # every category appears and each (caption, phash) pair keeps ≤ 1
    assert {"caption", "caption_dup", "image_dup"} <= set(df.unique())
    assert any(d.startswith("bucket_") for d in df.unique())


def test_format_mix_partitions_the_corpus(ray_session):
    """Dataset-card report: cells partition the corpus exactly, byte
    totals come from Arrow offsets, shares are integer per-mille."""
    import pyarrow.parquet as pq

    from darc_ray.pipelines.queries import q_format_mix
    from darc_ray.stages.multimodal import ensure_image_caption_fixture

    t = pq.read_table(ensure_image_caption_fixture())
    df = q_format_mix("/root/testdata/sf0.001")
    assert int(df["n_images"].sum()) == t.num_rows
    assert int(df["total_bytes"].sum()) == sum(
        len(b) for b in t.column("bytes").to_pylist())
    assert set(df["fmt"]) == set(t.column("fmt").to_pylist())
    assert (df["mean_bytes"] == df["total_bytes"] // df["n_images"]).all()
    assert (df["share_milli"]
            == df["n_images"] * 1000 // t.num_rows).all()


# ---------------------------------------------------------------------------
# caption_lang_mix: planted language composition of the dedicated fixture
# ---------------------------------------------------------------------------

def test_caption_lang_mix_planted_composition(ray_session):
    from darc_ray.pipelines.queries import q_caption_lang_mix

    df = q_caption_lang_mix("unused").set_index("lang")
    # 5 planted captions per language; the stopword-free junk caption
    # falls through to the en default -> 6
    assert df["n_captions"].to_dict() == {
        "en": 6, "de": 5, "fr": 5, "es": 5, "zh": 5}
    assert int(df["n_captions"].sum()) == 26
    # shares are floor per-mille of 26
    assert df.loc["en", "share_milli"] == 6 * 1000 // 26
    assert (df.loc[["de", "fr", "es", "zh"], "share_milli"]
            == 5 * 1000 // 26).all()


# ---------------------------------------------------------------------------
# caption_prefix_templates: planted boilerplate groups
# ---------------------------------------------------------------------------

def test_caption_prefix_templates_planted_groups(ray_session):
    from darc_ray.pipelines.queries import q_caption_prefix_templates

    df = q_caption_prefix_templates("unused").set_index("prefix")
    # only the four planted >=4 groups survive; the n=3 wallpaper
    # group and the 8 one-offs are below threshold
    assert sorted(df.index) == ["click to enlarge", "new",
                                "royalty free image", "stock photo of"]
    assert df.loc["stock photo of", "n_captions"] == 12
    # 10 distinct tails; case/trim variants collapse onto tail 0
    assert df.loc["stock photo of", "n_unique"] == 10
    assert df.loc["royalty free image", ["n_captions", "n_unique"]]\
        .tolist() == [6, 6]
    assert df.loc["click to enlarge", ["n_captions", "n_unique"]]\
        .tolist() == [4, 1]
    # single-token captions: prefix is the whole caption
    assert df.loc["new", ["n_captions", "n_unique"]].tolist() == [4, 1]
    total = 37                 # 12 stock + 6 royalty + 4 click + 4 new
    assert (df["share_milli"]  # + 3 wallpaper + 8 one-offs
            == df["n_captions"] * 1000 // total).all()
