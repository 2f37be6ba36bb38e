"""Planted-property tests for the exposure-clipping gate
(`image_exposure`) and the WebDataset shard manifest (`wds_shards`):
every exposure-fixture flavor carries its ground truth in the id
suffix, hand-built images pin the exact integer arithmetic, and the
shard manifest is re-derived row-for-row in pure Python.  SQL parity
vs DuckDB is covered separately by `test_queries.py`'s ORACLE_SQL
parametrization."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from darc_ray.functions.image import raw_encode
from darc_ray.stages.multimodal import (ensure_image_caption_fixture,
                                        ensure_image_exposure_fixture,
                                        image_exposure_batch)


def _one(iid: str, pix: np.ndarray) -> pa.Table:
    return pa.table({"image_id": pa.array([iid]),
                     "bytes": pa.array([raw_encode(pix)], type=pa.binary())})


def test_exposure_exact_handbuilt():
    # 4x10: exactly one of 40 pixels fully blown, two fully crushed
    pix = np.full((4, 10, 3), 128, np.uint8)
    pix[0, 0] = 255
    pix[3, 8:] = 0
    row = image_exposure_batch(_one("x", pix)).to_pandas().iloc[0]
    assert (row.width, row.height) == (10, 4)
    assert row.hi_milli == 1 * 1000 // 40
    assert row.lo_milli == 2 * 1000 // 40
    assert (row.overexposed, row.underexposed, row.keep) == (0, 0, 1)


def test_exposure_threshold_boundaries():
    # a pixel clips only when ALL channels cross: 250/250/249 is NOT
    # blown, 250/250/250 is; 5/5/6 is NOT crushed, 5/5/5 is
    pix = np.full((1, 4, 3), 128, np.uint8)
    pix[0, 0] = (250, 250, 249)
    pix[0, 1] = (250, 250, 250)
    pix[0, 2] = (5, 5, 6)
    pix[0, 3] = (5, 5, 5)
    row = image_exposure_batch(_one("t", pix)).to_pandas().iloc[0]
    assert row.hi_milli == 1 * 1000 // 4
    assert row.lo_milli == 1 * 1000 // 4
    # flags fire at exactly 200 per-mille
    fifth = np.full((1, 5, 3), 128, np.uint8)
    fifth[0, 0] = 255
    row2 = image_exposure_batch(_one("f", fifth)).to_pandas().iloc[0]
    assert (row2.hi_milli, row2.overexposed, row2.keep) == (200, 1, 0)


def test_exposure_fixture_flavors_all_flagged_by_suffix():
    path = ensure_image_exposure_fixture()
    out = image_exposure_batch(pq.read_table(path)).to_pandas()
    for _, r in out.iterrows():
        iid = r["image_id"]
        if iid.endswith("-normal"):
            assert (r.overexposed, r.underexposed, r.keep) == (0, 0, 1), iid
        elif iid.endswith("-blown"):
            assert (r.overexposed, r.keep) == (1, 0), iid
        elif iid.endswith("-crushed"):
            assert (r.underexposed, r.keep) == (1, 0), iid
        elif iid.endswith("-both"):
            assert (r.overexposed, r.underexposed, r.keep) == (1, 1, 0), iid
    solid = out.set_index("image_id")
    assert solid.loc["exp-solid-blown", "hi_milli"] == 1000
    assert solid.loc["exp-solid-crushed", "lo_milli"] == 1000


def test_wds_shards_manifest_matches_pure_python(ray_session):
    from darc_ray.pipelines.queries import WDS_N_SHARDS, q_wds_shards

    got = q_wds_shards("/root/testdata/sf0.001")
    t = pq.read_table(ensure_image_caption_fixture())
    rows = {}
    for iid, b, cap in zip(t.column("image_id").to_pylist(),
                           t.column("bytes").to_pylist(),
                           t.column("caption").to_pylist()):
        hv = int.from_bytes(hashlib.md5(iid.encode()).digest()[:8], "big")
        s = hv % WDS_N_SHARDS
        n, ib, cc, lo, hi = rows.get(s, (0, 0, 0, iid, iid))
        rows[s] = (n + 1, ib + len(b), cc + len(cap),
                   min(lo, iid), max(hi, iid))
    assert len(got) == len(rows)
    # every pair is assigned to exactly one shard: counts sum to corpus
    assert int(got["n_pairs"].sum()) == t.num_rows
    for _, r in got.iterrows():
        n, ib, cc, lo, hi = rows[int(r["shard"])]
        assert (int(r.n_pairs), int(r.image_bytes),
                int(r.caption_chars), r.first_id, r.last_id) == \
            (n, ib, cc, lo, hi)


def test_aesthetic_gate_exact_handbuilt():
    from darc_ray.stages.multimodal import aesthetic_gate_batch

    # solid mid-gray: sat = 0, var = 0, bright = 127000*1000//255000
    pix = np.full((3, 5, 3), 127, np.uint8)
    row = aesthetic_gate_batch(_one("s", pix)).to_pandas().iloc[0]
    assert row.bright_milli == 127 * 1000000 // 255000
    assert (row.sat_milli, row.contrast_milli) == (0, 0)
    assert row.aesthetic_milli == \
        4 * (1000 - 2 * abs(row.bright_milli - 500)) // 10
    assert row.aesthetic_keep == 0
    # full-saturation half-black/half-white checkering maxes contrast
    pix2 = np.zeros((2, 4, 3), np.uint8)
    pix2[:, ::2] = 255
    row2 = aesthetic_gate_batch(_one("c", pix2)).to_pandas().iloc[0]
    assert row2.contrast_milli == 1000          # var = 127500^2 >> ref
    assert row2.sat_milli == 0                  # grayscale extremes
    assert row2.bright_milli == 500             # perfectly centered
    assert row2.aesthetic_milli == (3 * 0 + 3 * 1000 + 4 * 1000) // 10
    assert row2.aesthetic_keep == 1


def test_aesthetic_fixture_flavors_separate():
    from darc_ray.stages.multimodal import (aesthetic_gate_batch,
                                            ensure_image_aesthetic_fixture)

    out = aesthetic_gate_batch(
        pq.read_table(ensure_image_aesthetic_fixture())).to_pandas()
    for _, r in out.iterrows():
        want = 1 if r["image_id"].endswith("-good") else 0
        assert r.aesthetic_keep == want, (r["image_id"], r.aesthetic_milli)
    # washed rows reject on saturation, dark rows on exposure centering
    byid = out.set_index("image_id")
    assert byid.loc["aes-01-washed", "sat_milli"] == 0
    assert byid.loc["aes-02-dark", "bright_milli"] < 200


def test_phash_bitstats_matches_pure_python(ray_session):
    from darc_ray.pipelines.queries import q_phash_bitstats

    got = q_phash_bitstats("/root/testdata/sf0.001")
    t = pq.read_table(ensure_image_caption_fixture(), columns=["phash"])
    ph = [int(x) for x in t.column("phash").to_pylist()]
    assert len(got) == 64
    for _, r in got.iterrows():
        b = int(r["bit"])
        ones = sum((v >> b) & 1 for v in ph)
        assert int(r.ones) == ones, b
        assert int(r.n_hashes) == len(ph)
        assert int(r.share_milli) == ones * 1000 // len(ph)
        assert int(r.balanced) == int(abs(ones * 1000 // len(ph) - 500)
                                      <= 300)
    # the sign bit (63) is covered and the arithmetic-shift semantics
    # agree between numpy int64 and pure-Python ints
    assert 63 in set(got["bit"])


def test_stratified_split_matches_pure_python(ray_session):
    from darc_ray.pipelines.queries import q_stratified_split

    got = q_stratified_split("/root/testdata/sf0.001")
    t = pq.read_table(ensure_image_caption_fixture(),
                      columns=["image_id", "fmt"])
    strata: dict = {}
    for iid, fmt in zip(t.column("image_id").to_pylist(),
                        t.column("fmt").to_pylist()):
        u = int.from_bytes(hashlib.md5(iid.encode()).digest()[:8],
                           "big") % 10
        tr, va = strata.get(fmt, (0, 0))
        strata[fmt] = (tr + (u != 0), va + (u == 0))
    assert len(got) == len(strata)
    for _, r in got.iterrows():
        tr, va = strata[r["stratum"]]
        assert (int(r.n_train), int(r.n_val)) == (tr, va), r["stratum"]
        assert int(r.val_milli) == va * 1000 // (tr + va)
        assert int(r.has_val) == int(va > 0)
    # the fixture plants the rare-stratum gap the manifest exists to
    # surface: at least one stratum has zero validation rows
    assert (got["has_val"] == 0).any()
