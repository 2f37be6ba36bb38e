"""image_sharpness closed forms + fixture monotonicity: a hand-built
3×4 gray image with one bright interior pixel gives lap = (40, −10) →
vnum = 2·1700 − 30² = 2500 exactly; <3×3 images are rejected loudly;
over the planted fixture every blur strictly collapses the variance
(noise → blur1 → blur2), ramps/solids are exactly 0, and exactly the
six noise images + the half-sharp split pass the gate."""

import numpy as np
import pyarrow as pa
import pytest


def _run(images):
    from darc_ray.functions.image import raw_encode
    from darc_ray.stages.multimodal import image_sharpness_batch

    t = pa.table({"image_id": [i for i, _ in images],
                  "bytes": [raw_encode(p.astype(np.uint8)) for _, p in images]})
    return image_sharpness_batch(t).to_pandas().set_index("image_id")


def test_sharpness_closed_form_and_guard():
    pix = np.zeros((3, 4, 3), dtype=np.uint8)
    pix[1, 1] = 10                       # r=g=b=10 → luma exactly 10
    out = _run([("one", pix)])
    row = out.loc["one"]
    assert row["n_int"] == 2
    assert row["sum_lap"] == 30          # 4·10 + (−10)
    assert row["vnum_lap"] == 2500       # 2·1700 − 900
    assert row["sharp"] == 0

    with pytest.raises(ValueError, match="no interior"):
        _run([("tiny", np.zeros((2, 5, 3), dtype=np.uint8))])


def test_sharpness_fixture_monotone_and_gate(ray_session):
    from darc_ray.pipelines.queries import q_image_sharpness

    out = q_image_sharpness("/root/testdata/sf0.001").set_index("image_id")
    s2 = out["vnum_lap"] / (out["n_int"] ** 2)
    for i in range(6):
        assert (s2[f"shp-{i}-noise"] > s2[f"shp-{i}-blur1"]
                > s2[f"shp-{i}-blur2"])
    assert out.loc["shp-ramp", "vnum_lap"] <= 25_000   # seam-free ramp ≈ 0
    assert out.loc["shp-solid", "vnum_lap"] == 0
    sharp_ids = set(out.index[out["sharp"] == 1])
    assert sharp_ids == {f"shp-{i}-noise" for i in range(6)} | {"shp-half"}
