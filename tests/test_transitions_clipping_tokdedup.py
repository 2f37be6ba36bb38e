"""Planted-property tests for the final round-5 families:
`event_transitions` (session-scoped Markov transition counts),
`audio_clipping` (clipped-sample run gate) and `caption_token_dedup`
(token-multiset caption dedup).  DuckDB parity lives in
test_queries.py's ORACLE_SQL parametrization; these assert the planted
semantics directly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from darc_ray.pipelines.queries import QUERIES


def test_event_transitions_hand_built(tmp_path, ray_session):
    """Two users, hand-placed gaps: u1 view→click (10 min, counts),
    click→view (2 h, session break — does NOT count), view→purchase
    (1 min, counts); u2 view→view (29:59, counts — boundary is ≤ 30
    min inclusive).  The cross-user boundary never counts."""
    base = 1_700_000_000_000_000            # µs
    m = 60_000_000
    rows = [
        (1, 10, base + 0 * m, "view"),
        (2, 10, base + 10 * m, "click"),
        (3, 10, base + 130 * m, "view"),        # 2 h gap: break
        (4, 10, base + 131 * m, "purchase"),
        (5, 20, base + 0 * m, "view"),
        (6, 20, base + 30 * m - 1_000_000, "view"),   # 29:59: counts
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }), str(tmp_path / "events.parquet"))
    out = QUERIES["event_transitions"](str(tmp_path))
    got = {(r.src_type, r.dst_type): (r.n, r.share_milli)
           for r in out.itertuples()}
    # all three surviving transitions share src 'view' → tn = 3
    assert got == {("view", "click"): (1, 333),
                   ("view", "purchase"): (1, 333),
                   ("view", "view"): (1, 333)}


def test_event_transitions_shares_sum_per_source(ray_session):
    out = QUERIES["event_transitions"]("/root/testdata/sf0.001")
    assert (out["n"] > 0).all()
    per_src = out.groupby("src_type")
    # integer floor division: Σ share ∈ (1000 - k, 1000] for k edges
    for src, g in per_src:
        s = int(g["share_milli"].sum())
        assert 1000 - len(g) < s <= 1000, (src, s)


def test_audio_clipping_planted_rows(ray_session):
    out = QUERIES["audio_clipping"]("/root/testdata/sf0.001") \
        .set_index("audio_id")
    clip = out.loc["pcm-clip"]
    # square wave at ±32760 in 25-sample half-periods: every sample
    # clipped, runs merge across sign flips into one full-length run
    assert clip["clipping"] == 1
    assert clip["clipped"] == clip["n_samples"]
    assert clip["max_clip_run"] == clip["n_samples"]
    assert clip["peak"] == 32760
    others = out.drop(index="pcm-clip")
    assert (others["clipping"] == 0).all()
    assert (others["clipped"] == 0).all()
    assert (others["peak"] < 32000).all()


def test_late_ship_priority_invariants(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = QUERIES["late_ship_priority"](sf)
    assert (out["n_late"] <= out["n_orders"]).all()
    assert (out["late_milli"] <= 1000).all()
    # every order with ≥1 lineitem is counted exactly once
    n = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM "
        f"'{sf}/lineitem.parquet'").fetchone()[0]
    assert int(out["n_orders"].sum()) == n


def test_promo_share_invariants(ray_session):
    import duckdb

    sf = "/root/testdata/sf0.001"
    out = QUERIES["promo_share"](sf)
    assert (out["promo_cents"] <= out["total_cents"]).all()
    assert out["month"].str.fullmatch(r"\d{4}-\d{2}").all()
    total = duckdb.sql(
        f"SELECT sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100"
        f" + 0.5) AS BIGINT)) FROM '{sf}/lineitem.parquet'").fetchone()[0]
    assert int(out["total_cents"].sum()) == int(total)


def test_running_revenue_is_monotone_prefix_sum(ray_session):
    out = QUERIES["running_revenue"]("/root/testdata/sf0.001")
    assert out["day"].is_monotonic_increasing
    assert (out["cum_cents"].to_numpy()
            == out["day_cents"].cumsum().to_numpy()).all()
    assert int(out["cum_cents"].iloc[-1]) == int(out["day_cents"].sum())


def test_gap_hist_hand_built(tmp_path, ray_session):
    """One user, gaps of 0 s, 1 s, 3 s, 8 s → buckets 0, 1, 2, 4
    (bucket = bit_length of the whole-second gap, 0 for sub-second);
    a second user's first event contributes no gap."""
    base = 1_700_000_000_000_000
    rows = [(1, 7, base, "a"), (2, 7, base + 500_000, "a"),      # 0 s
            (3, 7, base + 1_500_000, "a"),                        # 1 s
            (4, 7, base + 4_500_000, "a"),                        # 3 s
            (5, 7, base + 12_500_000, "a"),                       # 8 s
            (6, 9, base, "a")]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }), str(tmp_path / "events.parquet"))
    out = QUERIES["gap_hist"](str(tmp_path))
    assert dict(zip(out["bucket"], out["n"])) == {0: 1, 1: 1, 2: 1, 4: 1}


def test_image_border_contrast_planted_frames(ray_session):
    out = QUERIES["image_border_contrast"]("/root/testdata/sf0.001") \
        .set_index("image_id")
    boxed = out.index.str.endswith("-box")
    assert (out.loc[boxed, "framed"] == 1).all()
    assert (out.loc[~boxed, "framed"] == 0).all()
    # the solid row has a uniform ring but zero contrast
    assert out.loc["bdr-solid", "ring_range"] <= 20000
    assert out.loc["bdr-solid", "delta"] == 0


def test_audio_stereo_imbalance_planted_rows(ray_session):
    out = QUERIES["audio_stereo_imbalance"]("/root/testdata/sf0.001") \
        .set_index("audio_id")
    stereo = out[out["n_channels"] == 2]
    mono = out[out["n_channels"] == 1]
    # fixture stereo rows carry channel 1 = channel 0 // 3 → ~900‰
    assert (stereo["imbalanced"] == 1).all() and len(stereo) == 2
    assert (stereo["left_milli"] >= 850).all()
    assert (mono["left_milli"] == 1000).drop("pcm-silent").all()
    assert out.loc["pcm-silent", "left_milli"] == 500
    assert (mono["imbalanced"] == 0).all()


def test_image_rot_dups_planted_rotations(ray_session):
    out = QUERIES["image_rot_dups"]("/root/testdata/sf0.001") \
        .set_index("image_id")
    # each base shares its canon hash with every planted rotation
    for grp, ids in (("rot-0", ["rot-0-base", "rot-0-r90", "rot-0-r180",
                                "rot-0-r270"]),
                     ("rot-1", ["rot-1-base", "rot-1-r90"]),
                     ("rot-2", ["rot-2-base", "rot-2-r90", "rot-2-r180"])):
        hashes = set(out.loc[ids, "canon_hash"])
        assert len(hashes) == 1, grp
        assert (out.loc[ids, "n_group"] == len(ids)).all()
        assert out.loc[ids, "keep"].sum() == 1
    # a mirror is not a rotation: it stays out of rot-0's group
    assert out.loc["rot-0-mir", "canon_hash"] \
        != out.loc["rot-0-base", "canon_hash"]
    assert out.loc["rot-0-mir", "is_rot_dup"] == 0
    solos = out[out.index.str.endswith("-solo")]
    assert (solos["is_rot_dup"] == 0).all()


def test_user_activity_gini_hand_built(tmp_path, ray_session):
    """Perfect equality → 0‰; a single dominant user over k equal
    users → the textbook closed form, floor-quantized."""
    base = 1_700_000_000_000_000
    # 4 users × 3 events each: perfectly equal
    rows = [(i, i % 4, base + i * 1_000_000, "view") for i in range(12)]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }), str(tmp_path / "events.parquet"))
    out = QUERIES["user_activity_gini"](str(tmp_path))
    assert out.iloc[0].to_dict() == {"n_users": 4, "total_events": 12,
                                     "gini_milli": 0}


def test_minhash_band_stats_consistency(ray_session):
    """Band stats must reconcile with the signature layer itself:
    4 bands, bucket totals equal the signed-doc count per band, and
    the planted near-dup docs make candidate_pairs > 0."""
    out = QUERIES["minhash_band_stats"]("/root/testdata/sf0.001")
    sig = QUERIES["minhash_signatures"]("/root/testdata/sf0.001")
    assert list(out["band"]) == [0, 1, 2, 3]
    assert (out["singletons"] <= out["n_buckets"]).all()
    assert (out["max_bucket"] >= 1).all()
    assert (out["candidate_pairs"] > 0).any()
    # every signed doc lands in exactly one bucket per band
    for b in range(4):
        row = out[out["band"] == b].iloc[0]
        n_docs = len(sig)
        grouped = sig.groupby([f"sig{2 * b}", f"sig{2 * b + 1}"]).size()
        assert row["n_buckets"] == len(grouped)
        assert int(grouped.max()) == row["max_bucket"]
        assert int((grouped * (grouped - 1) // 2).sum()) \
            == row["candidate_pairs"]
        assert int(grouped.sum()) == n_docs


def test_caption_token_dedup_planted_groups(ray_session):
    out = QUERIES["caption_token_dedup"]("/root/testdata/sf0.001") \
        .set_index("image_id")
    assert len(out) == 24
    for j in range(4):
        ids = [f"tok-{6 * j + k:02d}" for k in range(6)]
        grp = out.loc[ids]
        # clean + reversed + case + whitespace variants collapse
        assert list(grp["n_group"]) == [4, 4, 4, 4, 1, 1]
        assert list(grp["is_dup"]) == [1, 1, 1, 1, 0, 0]
        # keeper is the first image_id; near-miss and unique self-keep
        assert list(grp["keep"]) == [1, 0, 0, 0, 1, 1]
