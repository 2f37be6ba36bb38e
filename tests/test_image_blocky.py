"""Planted-property tests for the compression-artifact / symmetry
image families (`image_blockiness`, `image_mirror_symmetry`): every
blocky-fixture flavor carries its ground truth in the id suffix, and
hand-built images pin the exact integer arithmetic.  SQL parity vs
DuckDB is covered separately by `test_queries.py`'s ORACLE_SQL
parametrization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from darc_ray.functions.image import raw_encode
from darc_ray.stages.multimodal import (ensure_image_blocky_fixture,
                                        image_blockiness_batch,
                                        image_mirror_symmetry_batch)


def _one(iid: str, pix: np.ndarray) -> pa.Table:
    return pa.table({"image_id": pa.array([iid]),
                     "bytes": pa.array([raw_encode(pix)], type=pa.binary())})


def test_blockiness_exact_handbuilt():
    # 2 rows x 16 cols, two 8-wide constant blocks: the only nonzero
    # horizontal gradient is the single boundary column x=7
    pix = np.zeros((2, 16, 3), np.uint8)
    pix[:, 8:] = 10                    # luma step = 10 * 1000 = 10000
    row = image_blockiness_batch(_one("x", pix)).to_pandas().iloc[0]
    assert (row.width, row.height) == (16, 2)
    # boundary: 1 column x 2 rows, each |step| = 10000
    assert row.boundary_milli == (2 * 10000) * 1000 // (1 * 2)
    assert row.interior_milli == 0
    assert row.blocky == 1


def test_blockiness_uniform_not_flagged():
    row = image_blockiness_batch(
        _one("solid", np.full((6, 24, 3), 50, np.uint8))).to_pandas().iloc[0]
    # zero gradient on BOTH sides -> sb == 0 -> never flagged
    assert (row.boundary_milli, row.interior_milli, row.blocky) == (0, 0, 0)


def test_blockiness_narrow_image_rejected():
    with pytest.raises(ValueError, match="width 8 < 9"):
        image_blockiness_batch(_one("w8", np.zeros((4, 8, 3), np.uint8)))


def test_mirror_symmetry_exact_handbuilt():
    # palindrome columns: profile P(x) == P(w-1-x) exactly
    base = np.arange(5, dtype=np.uint8) * 7
    cols = np.concatenate([base, base[::-1]])      # w = 10
    pix = np.repeat(np.repeat(cols[None, :, None], 4, axis=0), 3, axis=2)
    row = image_mirror_symmetry_batch(_one("pal", pix)).to_pandas().iloc[0]
    assert (row.asym_milli, row.mirror_sym) == (0, 1)
    # break one column by +1 on every pixel of one channel: per-column
    # profile delta = 4 rows * 299 (channel weight), compared once
    pix2 = pix.copy()
    pix2[:, 0, 0] += 1
    row = image_mirror_symmetry_batch(_one("off", pix2)).to_pandas().iloc[0]
    assert row.asym_milli == (4 * 299) * 1000 // (4 * 5)
    assert row.mirror_sym == 0


def test_fixture_flavors_carry_ground_truth():
    path = ensure_image_blocky_fixture()
    t = pq.read_table(path)
    blk = image_blockiness_batch(t).to_pandas().set_index("image_id")
    sym = image_mirror_symmetry_batch(t).to_pandas().set_index("image_id")
    assert len(blk) == 16 and len(sym) == 16
    for iid in blk.index:
        if iid.endswith("-blocky"):
            # piecewise-constant 8x8 tiles: zero interior gradient,
            # visible steps exactly on the 8-aligned boundaries
            assert blk.loc[iid, "interior_milli"] == 0
            assert blk.loc[iid, "boundary_milli"] > 0
            assert blk.loc[iid, "blocky"] == 1
            assert sym.loc[iid, "mirror_sym"] == 0
        elif iid.endswith("-smooth"):
            assert blk.loc[iid, "blocky"] == 0
            assert sym.loc[iid, "mirror_sym"] == 0
        elif iid.endswith("-sym"):
            assert sym.loc[iid, "asym_milli"] == 0
            assert sym.loc[iid, "mirror_sym"] == 1
            assert blk.loc[iid, "blocky"] == 0
        else:                                      # blk-solid
            assert blk.loc[iid, "blocky"] == 0
            assert sym.loc[iid, "mirror_sym"] == 1
