"""Planted-property tests for the sensor/synthetic-artifact gates
(`image_hot_pixels`, `image_checkerboard`) and the keyword-stuffing
gate (`caption_keyword_stuffing`).  SQL parity vs DuckDB is covered by
`test_queries.py`'s ORACLE_SQL parametrization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from darc_ray.functions.image import raw_encode
from darc_ray.stages.multimodal import (ensure_image_checker_fixture,
                                        ensure_image_hotpixel_fixture,
                                        image_checkerboard_batch,
                                        image_hot_pixels_batch)


def _one(iid: str, pix: np.ndarray) -> pa.Table:
    return pa.table({"image_id": pa.array([iid]),
                     "bytes": pa.array([raw_encode(pix)], type=pa.binary())})


# ---------------------------------------------------------------------------
# image_hot_pixels
# ---------------------------------------------------------------------------

def test_hot_pixels_exact_handbuilt():
    pix = np.full((5, 7, 3), 100, np.uint8)
    pix[2, 3] = 255                              # interior spike
    pix[0, 0] = 255                              # corner: no count
    row = image_hot_pixels_batch(_one("x", pix)).to_pandas().iloc[0]
    assert row.n_hot == 1
    assert row.hot_milli == 1 * 1000 // (3 * 5)
    assert row.sensor_defect == 1
    # dark spike (negative direction) also counts
    pix2 = np.full((5, 7, 3), 200, np.uint8)
    pix2[2, 2] = 0
    row2 = image_hot_pixels_batch(_one("d", pix2)).to_pandas().iloc[0]
    assert row2.n_hot == 1
    # adjacent like-valued pixels are a feature, not a defect
    pix3 = np.full((5, 7, 3), 100, np.uint8)
    pix3[2, 3:5] = 255
    row3 = image_hot_pixels_batch(_one("l", pix3)).to_pandas().iloc[0]
    assert row3.n_hot == 0
    with pytest.raises(ValueError):
        image_hot_pixels_batch(_one("t", np.zeros((2, 5, 3), np.uint8)))


def test_hot_pixels_fixture_flavors_by_suffix():
    path = ensure_image_hotpixel_fixture()
    out = image_hot_pixels_batch(pq.read_table(path)).to_pandas()
    assert len(out) == 15
    for _, r in out.iterrows():
        iid = r["image_id"]
        if iid.endswith("-hot"):
            assert r.sensor_defect == 1, iid
            assert r.n_hot >= 1, iid
        else:
            assert (r.n_hot, r.sensor_defect) == (0, 0), iid


# ---------------------------------------------------------------------------
# image_checkerboard
# ---------------------------------------------------------------------------

def test_checkerboard_exact_handbuilt():
    yy, xx = np.mgrid[0:8, 0:10]
    grid = (80 + 40 * ((xx + yy) % 2)).astype(np.uint8)
    pix = np.stack([grid] * 3, axis=2)
    row = image_checkerboard_batch(_one("c", pix)).to_pandas().iloc[0]
    assert (row.zigzag_x_milli, row.zigzag_y_milli) == (1000, 1000)
    assert (row.checkerboard, row.striped) == (1, 0)
    stripe = (80 + 40 * (xx % 2)).astype(np.uint8)
    pix2 = np.stack([stripe] * 3, axis=2)
    row2 = image_checkerboard_batch(_one("s", pix2)).to_pandas().iloc[0]
    assert (row2.zigzag_x_milli, row2.zigzag_y_milli) == (1000, 0)
    assert (row2.checkerboard, row2.striped) == (0, 1)
    flat = np.full((8, 10, 3), 90, np.uint8)
    row3 = image_checkerboard_batch(_one("f", flat)).to_pandas().iloc[0]
    assert (row3.checkerboard, row3.striped) == (0, 0)


def test_checkerboard_fixture_flavors_by_suffix():
    path = ensure_image_checker_fixture()
    out = image_checkerboard_batch(pq.read_table(path)).to_pandas()
    assert len(out) == 13
    for _, r in out.iterrows():
        iid = r["image_id"]
        if iid.endswith("-checker"):
            assert (r.checkerboard, r.striped) == (1, 0), iid
        elif iid.endswith("-hstripe"):
            assert (r.checkerboard, r.striped) == (0, 1), iid
        else:
            assert (r.checkerboard, r.striped) == (0, 0), iid


# ---------------------------------------------------------------------------
# caption_keyword_stuffing
# ---------------------------------------------------------------------------

def test_keyword_stuffing_planted_flavors(ray_session):
    from darc_ray.pipelines.queries import q_caption_keyword_stuffing

    df = q_caption_keyword_stuffing("unused").set_index("image_id")
    for iid, r in df.iterrows():
        if iid.endswith("-stuffed"):
            assert r.max_count >= 3 and r.kw_stuffed == 1, iid
        elif iid.endswith("-lowuniq"):
            # flagged by the ratio arm only, not the repeat arm
            assert r.max_count == 2 and r.unique_milli == 500, iid
            assert r.kw_stuffed == 1, iid
        elif iid.endswith("-clean"):
            assert (r.max_count, r.kw_stuffed) == (1, 0), iid
    # case variants collapse: SALE/sale/Sale -> max_count 3
    assert df.loc["stf-case", ["max_count", "kw_stuffed"]].tolist() == [3, 1]
    assert df.loc["stf-single", ["n_tokens", "unique_milli",
                                 "kw_stuffed"]].tolist() == [1, 1000, 0]


# ---------------------------------------------------------------------------
# image_qa_pipeline capstone: per-flavor reject stage + masking
# ---------------------------------------------------------------------------

def test_image_qa_pipeline_flavor_routing(ray_session):
    from darc_ray.pipelines.queries import q_image_qa_pipeline

    df = q_image_qa_pipeline("unused").set_index("image_id")
    assert len(df) == 16
    want_stage = {"-swap": "manifest", "-trunc": "manifest",
                  "-rowdup": "scanlines", "-hot": "sensor",
                  "-checker": "synthetic", "-up2": "resolution",
                  "-good": "keep"}
    for iid, r in df.iterrows():
        if iid == "qa-multi":
            continue
        stage = next(v for k, v in want_stage.items() if iid.endswith(k))
        assert r.reject_stage == stage, (iid, r.reject_stage)
        assert r.keep == int(stage == "keep"), iid
    # a truncated AND defective row rejects at the FIRST stage, and
    # every later stage is -1 (never evaluated)
    multi = df.loc["qa-multi"]
    assert multi.reject_stage == "manifest"
    assert (multi[["scan_bad", "sensor_bad", "synth_bad",
                   "upscaled"]] == -1).all()
    # masking cascade: a scanline reject leaves sensor/synth/up at -1
    rd_row = df[df.index.str.endswith("-rowdup")].iloc[0]
    assert rd_row.scan_bad == 1
    assert (rd_row[["sensor_bad", "synth_bad", "upscaled"]] == -1).all()
    # keeps evaluate everything to 0
    good = df[df.index.str.endswith("-good")]
    assert (good[["scan_bad", "sensor_bad", "synth_bad",
                  "upscaled"]] == 0).all().all()


# ---------------------------------------------------------------------------
# image_vignette / embedding_qa
# ---------------------------------------------------------------------------

def test_vignette_exact_handbuilt():
    from darc_ray.stages.multimodal import image_vignette_batch

    pix = np.full((16, 20, 3), 200, np.uint8)
    for ys in (slice(0, 4), slice(-4, None)):
        for xs in (slice(0, 4), slice(-4, None)):
            pix[ys, xs] = 100                    # corners at half luma
    row = image_vignette_batch(_one("v", pix)).to_pandas().iloc[0]
    assert row.center_mluma == 200 * 1000
    assert row.corner_mluma == 100 * 1000
    assert row.falloff_milli == 100000 * 1000 // 200000
    assert (row.vignetted, row.corner_hot) == (1, 0)
    # inverted: bright corners -> negative score, corner_hot
    inv = np.full((16, 20, 3), 100, np.uint8)
    for ys in (slice(0, 4), slice(-4, None)):
        for xs in (slice(0, 4), slice(-4, None)):
            inv[ys, xs] = 200
    row2 = image_vignette_batch(_one("i", inv)).to_pandas().iloc[0]
    assert row2.falloff_milli == -1000
    assert (row2.vignetted, row2.corner_hot) == (0, 1)
    with pytest.raises(ValueError):
        image_vignette_batch(_one("s", np.zeros((8, 8, 3), np.uint8)))


def test_vignette_fixture_flavors_by_suffix():
    from darc_ray.stages.multimodal import (ensure_image_vignette_fixture,
                                            image_vignette_batch)

    path = ensure_image_vignette_fixture()
    out = image_vignette_batch(pq.read_table(path)).to_pandas()
    assert len(out) == 13
    for _, r in out.iterrows():
        iid = r["image_id"]
        if iid.endswith("-vig"):
            assert (r.vignetted, r.corner_hot) == (1, 0), iid
        elif iid.endswith("-invvig"):
            assert (r.vignetted, r.corner_hot) == (0, 1), iid
        else:
            assert (r.vignetted, r.corner_hot) == (0, 0), iid


def test_embedding_qa_matches_numpy(ray_session):
    from darc_ray.pipelines.queries import q_embedding_qa

    got = q_embedding_qa("/root/testdata/sf0.001")
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    flat = t.column("embedding").combine_chunks().flatten()\
        .to_numpy(zero_copy_only=False)
    q = np.floor(flat.astype(np.float64) * 1000).astype(np.int64)
    q = q.reshape(len(t), -1)
    want = np.sort((q * q).sum(axis=1))
    assert (np.sort(got["qnorm2"].values) == want).all()
    assert (got["dim"] == q.shape[1]).all()
    # healthy unit-ish embeddings never trip the low-norm flag
    assert got["low_norm"].sum() == 0
