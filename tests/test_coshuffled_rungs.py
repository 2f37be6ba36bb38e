"""The over-cap co-shuffled rungs (broadcast caps forced to 0 via env)
must produce bit-identical results to the DuckDB oracle: the prior
hash set / boilerplate set / bigram table never touch the driver on
these paths — membership and scoring run as key-partitioned joins."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from darc_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"

RUNGS = [("incremental_dedup", "DARC_RAY_INCR_DEDUP_CAP"),
         ("boilerplate_strip", "DARC_RAY_BOILERPLATE_CAP"),
         ("bigram_lm", "DARC_RAY_BIGRAM_CAP"),
         # wedge-closure via (wu,wv) hash join instead of the packed-u64
         # edge-set broadcast
         ("triangle_count", "DARC_RAY_TRI_CAP"),
         # item-support attach via the tagged-union exchange instead of
         # the sorted-array broadcast
         ("part_affinity", "DARC_RAY_PA_CAP"),
         # src-carrying wedge stream through the (wu,wv) closure
         # exchange instead of the packed-u64 broadcast
         ("edge_embeddedness", "DARC_RAY_TRI_CAP"),
         # distributed CC labels + cluster-keyed size census instead
         # of the driver union-find dict
         ("cluster_size_hist", "DARC_RAY_CC_MAX_DRIVER_PAIRS")]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        c.execute(f"CREATE VIEW {t} AS "
                  f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name,env", RUNGS)
def test_forced_coshuffled_rung_matches_oracle(name, env, con, ray_session,
                                               monkeypatch):
    monkeypatch.setenv(env, "0")
    got = QUERIES[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(ORACLE_SQL[name]).df()
    g = got[sorted(got.columns)].sort_values(
        sorted(got.columns), kind="mergesort").reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(
        sorted(want.columns), kind="mergesort").reset_index(drop=True)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
