"""Planted-property tests for the text-overlay gate
(`image_text_overlay`) and the repeated-scanline corruption gate
(`image_row_dups`): hand-built frames pin the exact integer
arithmetic, and every fixture flavor carries its ground truth in the
id suffix.  SQL parity vs DuckDB is covered separately by
`test_queries.py`'s ORACLE_SQL parametrization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from darc_ray.functions.image import raw_encode
from darc_ray.stages.multimodal import (ensure_image_rowdup_fixture,
                                        ensure_image_textband_fixture,
                                        image_row_dups_batch,
                                        image_text_overlay_batch)


def _one(iid: str, pix: np.ndarray) -> pa.Table:
    return pa.table({"image_id": pa.array([iid]),
                     "bytes": pa.array([raw_encode(pix)], type=pa.binary())})


# ---------------------------------------------------------------------------
# image_text_overlay
# ---------------------------------------------------------------------------

def test_text_overlay_exact_handbuilt():
    # 10 rows x 20 cols, flat gray; rows 2-4 are period-2 strokes ->
    # every one of the 19 steps in those rows is a 224_000 edge
    pix = np.full((10, 20, 3), 128, np.uint8)
    xx = np.arange(20)
    pix[2:5] = np.where((xx % 2)[None, :, None] == 0, 240, 16)
    row = image_text_overlay_batch(_one("x", pix)).to_pandas().iloc[0]
    assert (row.width, row.height) == (20, 10)
    assert row.text_rows == 3
    assert row.text_milli == 300
    assert row.has_text_overlay == 1


def test_text_overlay_row_density_not_global_sum():
    # period-8 stripes: strong edges in EVERY row, but only 2 of 19
    # steps (x=7,15) -> 105/1000 < 180 -> zero text rows
    xx = np.arange(20)
    stripe = np.where((xx // 8 % 2)[None, :, None] == 0, 200, 40)
    pix = np.broadcast_to(stripe, (10, 20, 3)).astype(np.uint8)
    row = image_text_overlay_batch(_one("busy", pix)).to_pandas().iloc[0]
    assert row.text_rows == 0
    assert row.has_text_overlay == 0


def test_text_overlay_thresholds_exact():
    # 9 isolated bright pixels in a w=51 row: each contributes an
    # up-step and a down-step -> 18 strong of 50 steps = 360 >= 180
    pix = np.full((1, 51, 3), 100, np.uint8)
    for k in range(9):
        pix[0, 2 + 5 * k] = 250
    row = image_text_overlay_batch(_one("t", pix)).to_pandas().iloc[0]
    assert row.text_rows == 1
    pix2 = np.full((1, 2, 3), 0, np.uint8)
    row2 = image_text_overlay_batch(_one("w2", pix2)).to_pandas().iloc[0]
    assert (row2.text_rows, row2.has_text_overlay) == (0, 0)
    with pytest.raises(ValueError):
        image_text_overlay_batch(_one("w1", np.zeros((3, 1, 3), np.uint8)))


def test_text_overlay_fixture_flavors_by_suffix():
    path = ensure_image_textband_fixture()
    out = image_text_overlay_batch(pq.read_table(path)).to_pandas()
    assert len(out) == 17
    for _, r in out.iterrows():
        iid = r["image_id"]
        if iid.endswith(("-clean", "-busy")) or iid == "txt-solid":
            assert r.has_text_overlay == 0, iid
            assert r.text_rows == 0, iid
        elif iid.endswith("-text"):
            assert r.has_text_overlay == 1, iid
    full = out.set_index("image_id")
    assert full.loc["txt-full", "text_milli"] == 1000


# ---------------------------------------------------------------------------
# image_row_dups
# ---------------------------------------------------------------------------

def test_row_dups_exact_handbuilt():
    # 6 rows: rows 1,2,3 identical -> 2 adjacent dups of 5 steps
    pix = np.stack([np.full((8, 3), 10 * (y + 1), np.uint8)
                    for y in range(6)])
    pix[2] = pix[1]
    pix[3] = pix[1]
    row = image_row_dups_batch(_one("x", pix)).to_pandas().iloc[0]
    assert (row.width, row.height) == (8, 6)
    assert row.dup_adjacent == 2
    assert row.dup_milli == 2 * 1000 // 5
    assert row.row_corrupt == 1                 # 400 >= 250


def test_row_dups_byte_equality_not_luma():
    # two rows with EQUAL luma sums but different bytes are NOT dups
    pix = np.zeros((2, 2, 3), np.uint8)
    pix[0, 0], pix[0, 1] = (10, 0, 0), (0, 10, 0)
    pix[1, 0], pix[1, 1] = (0, 10, 0), (10, 0, 0)
    row = image_row_dups_batch(_one("x", pix)).to_pandas().iloc[0]
    assert row.dup_adjacent == 0
    with pytest.raises(ValueError):
        image_row_dups_batch(_one("h1", np.zeros((1, 4, 3), np.uint8)))


def test_row_dups_fixture_flavors_by_suffix():
    path = ensure_image_rowdup_fixture()
    t = pq.read_table(path)
    out = image_row_dups_batch(t).to_pandas().set_index("image_id")
    assert len(out) == 15
    from darc_ray.functions.image import raw_decode

    for iid, payload in zip(t.column("image_id").to_pylist(),
                            t.column("bytes").to_pylist()):
        pix = raw_decode(payload)
        want = int((pix[1:] == pix[:-1]).all(axis=(1, 2)).sum())
        assert out.loc[iid, "dup_adjacent"] == want, iid
        if iid.endswith("-clean"):
            assert want == 0, iid
            assert out.loc[iid, "row_corrupt"] == 0, iid
        elif iid.endswith(("-blockdup", "-interlace")):
            assert want > 0, iid
            assert out.loc[iid, "row_corrupt"] == 1, iid
    assert out.loc["dup-solid", "dup_milli"] == 1000
