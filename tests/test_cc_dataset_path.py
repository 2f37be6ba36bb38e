"""The over-cap connected-components rung must be Dataset-native end
to end: forcing ``DARC_RAY_CC_MAX_DRIVER_PAIRS=0`` routes every CC
consumer through the labels-Dataset path (hash-join labeling,
cluster-keyed keeper argmax, loser-flag joins — no driver label dict)
and each family must STILL match its DuckDB oracle exactly."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from darc_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"

CC_FAMILIES = ["dedup_clusters", "dedup_keep_best", "image_phash_clusters",
               "curation_pipeline", "image_curation_pipeline"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        c.execute(f"CREATE VIEW {t} AS "
                  f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


@pytest.mark.slow
@pytest.mark.parametrize("name", CC_FAMILIES)
def test_cc_consumer_matches_oracle_on_forced_dataset_path(
        name, con, ray_session, monkeypatch):
    monkeypatch.setenv("DARC_RAY_CC_MAX_DRIVER_PAIRS", "0")
    got = QUERIES[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(ORACLE_SQL[name]).df()
    g, w = _norm(got), _norm(want)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
