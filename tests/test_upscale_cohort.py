"""Planted-property tests for the nearest-neighbor-upscale detector
(`image_upscale_detect`) and pure-python re-derivations of the two
real-table report families (`source_skew` over documents,
`cohort_retention` over events).  SQL parity vs DuckDB is covered by
`test_queries.py`'s ORACLE_SQL parametrization."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from darc_ray.functions.image import raw_encode
from darc_ray.stages.multimodal import (ensure_image_upscale_fixture,
                                        image_upscale_detect_batch)

SF = "/root/testdata/sf0.001"


def _one(iid: str, pix: np.ndarray) -> pa.Table:
    return pa.table({"image_id": pa.array([iid]),
                     "bytes": pa.array([raw_encode(pix)], type=pa.binary())})


# ---------------------------------------------------------------------------
# image_upscale_detect
# ---------------------------------------------------------------------------

def test_upscale_exact_handbuilt():
    # 4x6 native with all-distinct pixels, then its 2x upscale
    base = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    r0 = image_upscale_detect_batch(_one("n", base)).to_pandas().iloc[0]
    assert (r0.col_twin_milli, r0.row_twin_milli) == (0, 0)
    assert (r0.upscaled, r0.stretched) == (0, 0)
    up = base.repeat(2, 0).repeat(2, 1)
    r1 = image_upscale_detect_batch(_one("u", up)).to_pandas().iloc[0]
    assert (r1.width, r1.height) == (12, 8)
    assert (r1.col_twin_milli, r1.row_twin_milli) == (1000, 1000)
    assert (r1.upscaled, r1.stretched) == (1, 0)


def test_upscale_one_axis_is_stretched_not_upscaled():
    base = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    cols = base.repeat(2, 1)
    r = image_upscale_detect_batch(_one("c", cols)).to_pandas().iloc[0]
    assert (r.col_twin_milli, r.row_twin_milli) == (1000, 0)
    assert (r.upscaled, r.stretched) == (0, 1)
    rows = base.repeat(2, 0)
    r2 = image_upscale_detect_batch(_one("r", rows)).to_pandas().iloc[0]
    assert (r2.col_twin_milli, r2.row_twin_milli) == (0, 1000)
    assert (r2.upscaled, r2.stretched) == (0, 1)


def test_upscale_odd_width_pair_grid():
    # w=5: only pairs (0,1) and (2,3) count; column 4 has no partner
    pix = np.zeros((2, 5, 3), np.uint8)
    pix[:, 1] = 1                                # (0,1) differ
    r = image_upscale_detect_batch(_one("o", pix)).to_pandas().iloc[0]
    # pairs per row: (0,1) unequal, (2,3) equal -> 2 of 4 pixel pairs
    assert r.col_twin_milli == 500
    with pytest.raises(ValueError):
        image_upscale_detect_batch(_one("w1", np.zeros((1, 1, 3), np.uint8)))


def test_upscale_fixture_flavors_by_suffix():
    path = ensure_image_upscale_fixture()
    out = image_upscale_detect_batch(pq.read_table(path)).to_pandas()
    assert len(out) == 16
    for _, r in out.iterrows():
        iid = r["image_id"]
        if iid.endswith("-native"):
            assert (r.upscaled, r.stretched) == (0, 0), iid
        elif iid.endswith(("-up2", "-up2-noisy")) or iid == "up-solid":
            assert r.upscaled == 1, iid
        elif iid.endswith(("-upcols", "-uprows")):
            assert (r.upscaled, r.stretched) == (0, 1), iid
    noisy = out[out["image_id"].str.endswith("-up2-noisy")]
    assert ((noisy["col_twin_milli"] < 1000)
            & (noisy["col_twin_milli"] >= 900)).all()


# ---------------------------------------------------------------------------
# source_skew / cohort_retention vs pure-pandas re-derivations
# ---------------------------------------------------------------------------

def test_source_skew_matches_pandas(ray_session):
    from darc_ray.pipelines.queries import q_source_skew

    got = q_source_skew(SF)
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["source", "n_chars"]).to_pandas()
    want = (df.groupby("source")
            .agg(n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))
            .reset_index())
    total, ns = int(want["n_docs"].sum()), len(want)
    want["mean_chars"] = want["total_chars"] // want["n_docs"]
    want["share_milli"] = want["n_docs"] * 1000 // total
    want["hot_source"] = (want["n_docs"] * ns >= 2 * total).astype("int64")
    want = want.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_cohort_retention_matches_pandas(ray_session):
    from darc_ray.pipelines.queries import q_cohort_retention

    got = q_cohort_retention(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype("int64")
    ud = ev[["user_id", "d"]].drop_duplicates()
    cohort = ud.groupby("user_id")["d"].min().rename("cohort")
    ud = ud.join(cohort, on="user_id")
    ud["day_offset"] = ud["d"] - ud["cohort"]
    mat = (ud.groupby(["cohort", "day_offset"]).size()
           .rename("n_users").reset_index()
           .rename(columns={"cohort": "cohort_day"}))
    base = (mat.loc[mat["day_offset"] == 0]
            .set_index("cohort_day")["n_users"])
    mat["retained_milli"] = (mat["n_users"] * 1000
                             // mat["cohort_day"].map(base))
    mat = (mat.sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, mat.astype(got.dtypes.to_dict()))
    # day-0 retention is 1000 by construction; offsets are non-negative
    assert (got.loc[got["day_offset"] == 0, "retained_milli"] == 1000).all()
    assert (got["day_offset"] >= 0).all()


def test_rolling_active_users_matches_pandas(ray_session):
    from darc_ray.pipelines.queries import q_rolling_active_users

    got = q_rolling_active_users(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["d"] = ev["ts"].values.astype("datetime64[D]").astype("int64")
    ud = ev[["user_id", "d"]].drop_duplicates()
    days = np.sort(ud["d"].unique())
    rows = []
    for d in days:
        dau = ud.loc[ud["d"] == d, "user_id"].nunique()
        wau = ud.loc[ud["d"].between(d - 6, d), "user_id"].nunique()
        rows.append((d, dau, wau, dau * 1000 // wau))
    want = pd.DataFrame(rows, columns=["day", "dau", "wau7",
                                       "stickiness_milli"])
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # windows accumulate: wau7 >= dau everywhere, equal on day one
    assert (got["wau7"] >= got["dau"]).all()
    assert got.iloc[0]["wau7"] == got.iloc[0]["dau"]
