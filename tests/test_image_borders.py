"""Planted-property tests for the border/color image families
(`image_letterbox`, `image_color_stats`): every fixture flavor carries
its ground truth in the id suffix, and a handful of hand-built images
pin exact bar widths.  SQL parity vs DuckDB is covered separately by
`test_queries.py`'s ORACLE_SQL parametrization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from darc_ray.functions.image import raw_encode
from darc_ray.stages.multimodal import (ensure_image_borders_fixture,
                                        image_color_stats_batch,
                                        image_dominant_color_batch,
                                        image_edge_density_batch,
                                        image_letterbox_batch)


def _one(iid: str, pix: np.ndarray) -> pa.Table:
    return pa.table({"image_id": pa.array([iid]),
                     "bytes": pa.array([raw_encode(pix)], type=pa.binary())})


def test_letterbox_exact_bar_widths_handbuilt():
    yy, xx = np.mgrid[0:30, 0:40]
    pix = np.stack([(xx + yy) % 251, (xx + 2 * yy) % 251,
                    (2 * xx + yy) % 251], axis=2).astype(np.uint8)
    # one bar color (as real letterboxes): the corner squares belong
    # to both a bar row and a bar column, so mixed colors would break
    # edge-row uniformity
    pix[:4] = 17          # top bar 4
    pix[-2:] = 17         # bottom bar 2
    pix[:, :3] = 17       # left bar 3
    row = image_letterbox_batch(_one("x", pix)).to_pandas().iloc[0]
    assert (row.bar_top, row.bar_bottom, row.bar_left, row.bar_right) \
        == (4, 2, 3, 0)
    assert (row.crop_w, row.crop_h, row.bars) == (37, 24, 1)


def test_letterbox_fully_uniform_crops_to_zero():
    row = image_letterbox_batch(
        _one("solid", np.full((12, 9, 3), 5, np.uint8))).to_pandas().iloc[0]
    assert (row.bar_top, row.bar_bottom, row.bar_left, row.bar_right) \
        == (12, 0, 9, 0)
    assert (row.crop_w, row.crop_h) == (0, 0)


def test_color_stats_exact_counts_handbuilt():
    pix = np.zeros((4, 4, 3), np.uint8)
    pix[0, 0] = (10, 20, 30)           # |r-g|+|g-b| = 20
    row = image_color_stats_batch(_one("x", pix)).to_pandas().iloc[0]
    assert row.distinct_colors == 2 and row.gray == 0
    assert row.near_gray_milli == 20 * 1000 // 16
    assert row.low_complexity == 1 and row.keep == 0
    g = np.repeat((np.arange(25, dtype=np.uint8).reshape(5, 5) * 9)
                  [..., None], 3, axis=2)
    row = image_color_stats_batch(_one("g", g)).to_pandas().iloc[0]
    assert row.gray == 1 and row.distinct_colors == 25 and row.keep == 0


def test_edge_density_exact_handbuilt():
    # 2×3 image: gm = 1000·v for gray pixels; one interior sample each
    pix = np.repeat(np.array([[0, 10, 10], [5, 10, 0]],
                             np.uint8)[..., None], 3, axis=2)
    row = image_edge_density_batch(_one("x", pix)).to_pandas().iloc[0]
    # interior (h-1)(w-1) = 2 cells: (0,0): |0-10|+|0-5| = 15k;
    # (0,1): |10-10|+|10-10| = 0  → sum 15000·1000 // 2 = 7.5M < 8M
    assert row.edge_milli == 15000 * 1000 // 2 and row.sharp == 0
    flat = image_edge_density_batch(
        _one("f", np.full((6, 6, 3), 9, np.uint8))).to_pandas().iloc[0]
    assert flat.edge_milli == 0 and flat.sharp == 0


def test_dominant_color_tiebreak_smallest_key():
    pix = np.zeros((2, 2, 3), np.uint8)
    pix[0, 1] = (0, 0, 5)     # two colors, 2 pixels each → tie
    pix[1, 1] = (0, 0, 5)
    row = image_dominant_color_batch(_one("x", pix)).to_pandas().iloc[0]
    assert (row.dom_r, row.dom_g, row.dom_b) == (0, 0, 0)  # smaller key
    assert row.share_milli == 500 and row.dominant_heavy == 1


def test_fixture_planted_flavors_roundtrip():
    t = pq.read_table(ensure_image_borders_fixture())
    lb = image_letterbox_batch(t).to_pandas().set_index("image_id")
    cs = image_color_stats_batch(t).to_pandas().set_index("image_id")
    sfx = lb.index.str
    assert (lb.loc[sfx.endswith("-plain"), "bars"] == 0).all()
    assert (lb.loc[sfx.endswith("-lb"), "bar_top"] > 0).all()
    assert (lb.loc[sfx.endswith("-lb"), "bar_left"] == 0).all()
    assert (lb.loc[sfx.endswith("-pb"), "bar_left"] > 0).all()
    assert (lb.loc[sfx.endswith("-pb"), "bar_top"] == 0).all()
    assert (lb.loc[sfx.endswith("-box"),
                   ["bar_top", "bar_bottom", "bar_left", "bar_right"]]
            > 0).all().all()
    assert lb.loc["bdr-solid", ["crop_w", "crop_h"]].tolist() == [0, 0]
    assert (cs.loc[cs.index.str.endswith("-gray"), "gray"] == 1).all()
    assert (cs.loc[cs.index.str.startswith("bdr-poster"),
                   "low_complexity"] == 1).all()
    assert (cs.loc[cs.index.str.startswith("bdr-poster"), "gray"] == 0).all()
    assert (cs.loc[cs.index.str.endswith("-plain"), "keep"] == 1).all()
    assert cs.loc["bdr-solid", "distinct_colors"] == 1
    ed = image_edge_density_batch(t).to_pandas().set_index("image_id")
    dc = image_dominant_color_batch(t).to_pandas().set_index("image_id")
    assert ed.loc["bdr-solid", ["edge_milli", "sharp"]].tolist() == [0, 0]
    assert (ed.loc[ed.index.str.endswith("-plain"), "sharp"] == 1).all()
    assert dc.loc["bdr-solid", "share_milli"] == 1000
    assert (dc.loc[dc.index.str.endswith("-plain"),
                   "dominant_heavy"] == 0).all()


def test_image_entropy_closed_forms(ray_session):
    """Kernel unit: a solid image has entropy exactly 0 (one class); a
    half/half two-level image lands at 2·floor(0.5·ln2·1e6) = 693146
    micro-nats (per-class floor BEFORE the sum — the char_entropy
    rule); posterized fixture rows gate below 3 nats, textures above."""
    import numpy as np
    import pyarrow as pa

    from darc_ray.functions.image import raw_encode
    from darc_ray.stages.multimodal import image_entropy_batch

    solid = np.full((8, 8, 3), 100, dtype=np.uint8)
    half = np.zeros((8, 8, 3), dtype=np.uint8)
    half[:4] = 255
    t = image_entropy_batch(pa.table({
        "image_id": ["solid", "half"],
        "bytes": [raw_encode(solid), raw_encode(half)]}))
    d = {r["image_id"]: r for r in t.to_pylist()}
    assert d["solid"]["entropy_unats"] == 0
    assert d["solid"]["n_levels"] == 1
    assert d["half"]["entropy_unats"] == 693146
    assert d["half"]["n_levels"] == 2
    assert d["half"]["textured"] == 0
