"""image_colorfulness closed forms: solid gray scores exactly 0 (no
chroma anywhere); solid saturated red scores through the MEAN term
only (variance numerators exactly 0); a half-red/half-green image
scores through the rg VARIANCE term with the yb variance exactly 0 —
every integer column hand-derived, the milli values computed from the
published closed forms (255 + 38.25 → 293250 for the half/half)."""

import math

import numpy as np
import pyarrow as pa


def _run(images):
    from darc_ray.stages.multimodal import image_colorfulness_batch
    from darc_ray.functions.image import raw_encode

    t = pa.table({"image_id": [i for i, _ in images],
                  "bytes": [raw_encode(p) for _, p in images]})
    return image_colorfulness_batch(t).to_pandas().set_index("image_id")


def test_colorfulness_closed_forms():
    gray = np.full((4, 4, 3), 77, dtype=np.uint8)
    red = np.zeros((4, 4, 3), dtype=np.uint8); red[..., 0] = 255
    half = np.zeros((2, 2, 3), dtype=np.uint8)
    half[0, :, 0] = 255          # top row red
    half[1, :, 1] = 255          # bottom row green
    out = _run([("gray", gray), ("red", red), ("half", half)])

    g = out.loc["gray"]
    assert (g[["sum_rg", "sum_yb2", "vnum_rg", "vnum_yb2",
               "colorfulness_milli", "vivid"]] == 0).all()

    r = out.loc["red"]
    assert r["sum_rg"] == 16 * 255 and r["sum_yb2"] == 16 * 255
    assert r["vnum_rg"] == 0 and r["vnum_yb2"] == 0
    # M = 0.3 * sqrt(4080² + 2040²) / 16
    want = math.floor(1000.0 * (0.3 * math.sqrt(4080 * 4080
                                                + 2040.0 * 2040.0) / 16)
                      + 0.5)
    assert r["colorfulness_milli"] == want and r["vivid"] == 1

    h = out.loc["half"]
    # rg: ±255 balanced → sum 0, vnum = 4·4·255² ; yb2: constant 255
    assert h["sum_rg"] == 0 and h["vnum_rg"] == 1_040_400
    assert h["sum_yb2"] == 4 * 255 and h["vnum_yb2"] == 0
    # M = sqrt(1040400)/4 + 0.3·sqrt(510²)/4 = 255 + 38.25
    assert h["colorfulness_milli"] == 293_250 and h["vivid"] == 1
