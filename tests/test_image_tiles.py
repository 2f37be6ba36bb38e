"""Planted-property tests for `image_tile_dups` (within-image 8×8
tile repetition — the collage/screenshot junk gate); DuckDB parity is
covered by test_queries.py's ORACLE_SQL parametrization."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from darc_ray.functions import image as img
from darc_ray.stages.multimodal import image_tile_dups_batch


def _one(iid: str, pix: np.ndarray) -> pa.Table:
    return pa.Table.from_pydict(
        {"image_id": [iid], "bytes": [img.raw_encode(pix)]})


def test_pure_collage_one_distinct_tile():
    t = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    row = image_tile_dups_batch(_one("x", np.tile(t, (2, 3, 1)))
                                ).to_pandas().iloc[0]
    assert row["n_tiles"] == 6
    assert row["distinct_tiles"] == 1
    assert row["top_tile_count"] == 6
    assert row["top_share_milli"] == 1000
    assert row["tiled"] == 1


def test_unique_tiles_not_flagged():
    yy, xx = np.mgrid[0:16, 0:24]
    pix = np.stack([(xx * yy) % 251, (xx + 7 * yy) % 251,
                    (3 * xx + yy * yy) % 251], axis=2).astype(np.uint8)
    row = image_tile_dups_batch(_one("x", pix)).to_pandas().iloc[0]
    assert row["n_tiles"] == 6
    assert row["distinct_tiles"] == 6
    assert row["distinct_milli"] == 1000
    assert row["tiled"] == 0


def test_ragged_margins_ignored():
    """Only full 8×8 tiles count: a 17×19 image has 2×2 tiles."""
    t = np.full((8, 8, 3), 9, np.uint8)
    pix = np.zeros((17, 19, 3), np.uint8)
    pix[:16, :16] = np.tile(t, (2, 2, 1))
    pix[16:, :] = 200            # margin content must not affect counts
    pix[:, 16:] = 201
    row = image_tile_dups_batch(_one("x", pix)).to_pandas().iloc[0]
    assert row["n_tiles"] == 4
    assert row["distinct_tiles"] == 1


def test_tiny_image_zero_tiles():
    row = image_tile_dups_batch(
        _one("x", np.full((5, 7, 3), 3, np.uint8))).to_pandas().iloc[0]
    assert row["n_tiles"] == 0
    assert row["tiled"] == 0


def test_single_pixel_difference_splits_tiles():
    t = np.full((8, 8, 3), 50, np.uint8)
    pix = np.tile(t, (1, 2, 1)).copy()
    pix[3, 11, 1] += 1           # second tile now differs by one byte
    row = image_tile_dups_batch(_one("x", pix)).to_pandas().iloc[0]
    assert row["distinct_tiles"] == 2
    assert row["top_tile_count"] == 1
