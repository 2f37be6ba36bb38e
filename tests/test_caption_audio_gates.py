"""Planted-property tests for the resolution-spam gate
(`caption_dim_spam`), the deletion-1 neighborhood join
(`caption_deletion_dups`) and the DC-offset gate (`audio_dc_offset`).
SQL parity vs DuckDB is covered by `test_queries.py`'s ORACLE_SQL
parametrization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from darc_ray.functions.audio import wav_encode
from darc_ray.stages.multimodal import (audio_dc_offset_batch,
                                        ensure_audio_dc_fixture)


# ---------------------------------------------------------------------------
# caption_dim_spam
# ---------------------------------------------------------------------------

def test_caption_dim_spam_flavors(ray_session):
    from darc_ray.pipelines.queries import q_caption_dim_spam

    df = q_caption_dim_spam("unused").set_index("image_id")
    for iid, r in df.iterrows():
        if iid.endswith("-match"):
            assert (r.has_mention, r.dims_match, r.res_spam) == (1, 1, 0), iid
            assert (r.mention_w, r.mention_h) == (r.w, r.h), iid
        elif iid.endswith("-lie"):
            assert (r.has_mention, r.dims_match, r.res_spam) == (1, 0, 1), iid
        elif iid.endswith("-none"):
            assert (r.has_mention, r.mention_w, r.mention_h) == (0, -1, -1), iid
    # single digits never match the 2-digit floor; 2-digit sides do
    assert df.loc["dim-lego", "has_mention"] == 0
    assert df.loc["dim-small", ["has_mention", "mention_w", "mention_h",
                                "res_spam"]].tolist() == [1, 12, 34, 1]


# ---------------------------------------------------------------------------
# caption_deletion_dups
# ---------------------------------------------------------------------------

def test_caption_deletion_dups_planted_pairs(ray_session):
    from darc_ray.pipelines.queries import q_caption_deletion_dups

    got = q_caption_deletion_dups("unused")
    pairs = set(map(tuple, got[["id_a", "id_b"]].values))
    want = {
        ("ed-0", "ed-1"),   # substitution dawn/dusk
        ("ed-0", "ed-2"),   # deletion of leading article
        ("ed-0", "ed-3"),   # exact duplicate
        ("ed-1", "ed-3"),   # dup transitively shares ed-0's neighbors
        ("ed-2", "ed-3"),
        ("ed-4", "ed-5"),   # substitution over/under
        ("ed-7", "ed-8"),   # "cat" is a deletion variant of "cat dog"
        ("ed-8", "ed-9"),   # so is "dog"
    }
    assert pairs == want
    # the empty-variant trap: two unrelated single-token captions must
    # NOT pair through the discarded "" variant
    assert ("ed-7", "ed-9") not in pairs


# ---------------------------------------------------------------------------
# audio_dc_offset
# ---------------------------------------------------------------------------

def _one(aid: str, samples: np.ndarray, sr: int = 8000) -> pa.Table:
    return pa.table({"audio_id": pa.array([aid]),
                     "bytes": pa.array([wav_encode(samples, sr)],
                                       type=pa.binary())})


def test_dc_offset_exact_handbuilt():
    # 100 samples of +200 bias over a balanced square: sum = 100*200
    s = (np.where(np.arange(100) % 2 == 0, 1000, -1000) + 200
         ).astype(np.int16)
    row = audio_dc_offset_batch(_one("x", s)).to_pandas().iloc[0]
    assert row.n_int16 == 100
    assert row.sum_v == 100 * 200
    assert row.dc_abs_milli == 200 * 1000
    assert (row.dc_sign, row.dc_biased) == (1, 1)
    z = np.where(np.arange(50) % 2 == 0, 700, -700).astype(np.int16)
    row2 = audio_dc_offset_batch(_one("z", z)).to_pandas().iloc[0]
    assert (row2.sum_v, row2.dc_sign, row2.dc_biased) == (0, 0, 0)


def test_dc_offset_fixture_flavors_by_suffix():
    path = ensure_audio_dc_fixture()
    out = audio_dc_offset_batch(pq.read_table(path)).to_pandas()
    assert len(out) == 11
    for _, r in out.iterrows():
        aid = r["audio_id"]
        if aid.endswith("-centered"):
            assert (r.sum_v, r.dc_biased) == (0, 0), aid
        elif aid.endswith("-pos") or aid in ("dc-only", "dc-stereo-pos"):
            assert (r.dc_sign, r.dc_biased) == (1, 1), aid
        elif aid.endswith("-neg"):
            assert (r.dc_sign, r.dc_biased) == (-1, 1), aid
    solo = out.set_index("audio_id")
    assert solo.loc["dc-only", "dc_abs_milli"] == 80 * 1000
    # stereo: 1200 samples of +400 bias over 2400 interleaved samples
    assert solo.loc["dc-stereo-pos", "sum_v"] == 1200 * 400


# ---------------------------------------------------------------------------
# caption_blocklist_gate / image_edge_dup
# ---------------------------------------------------------------------------

def test_blocklist_gate_whole_token_semantics(ray_session):
    from darc_ray.pipelines.queries import q_caption_blocklist_gate

    df = q_caption_blocklist_gate("unused").set_index("image_id")
    for iid, r in df.iterrows():
        if iid.endswith("-hit1"):
            assert (r.n_hits, r.n_terms, r.blocked) == (1, 1, 1), iid
        elif iid.endswith("-hit3"):
            assert (r.n_hits, r.n_terms, r.blocked) == (3, 3, 1), iid
        elif iid.endswith("-clean"):
            assert (r.n_hits, r.blocked) == (0, 0), iid
    # substrings of longer tokens never flag; case variants collapse
    assert df.loc["blk-sub", ["n_hits", "blocked"]].tolist() == [0, 0]
    assert df.loc["blk-case", ["n_hits", "n_terms",
                               "blocked"]].tolist() == [2, 2, 1]


def test_image_edge_dup_flavors(ray_session):
    from darc_ray.pipelines.queries import q_image_edge_dup

    df = q_image_edge_dup("unused").set_index("image_id")
    for iid, r in df.iterrows():
        if iid.endswith("-clean"):
            assert (r.n_dup_edges, r.edge_replicated) == (0, 0), iid
        elif iid.endswith("-frame"):
            assert r.n_dup_edges == 4 and r.edge_replicated == 1, iid
        else:
            side = iid.rsplit("-", 1)[1]
            assert r[f"{side}_dup"] == 1 and r.n_dup_edges == 1, iid
