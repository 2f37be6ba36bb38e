"""Driver-mirror: every SQL-backed query must match DuckDB exactly
(sorted-by-name columns, order-insensitive rows) — the same comparison
the correctness gate runs at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from darc_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_sql_backed_query_matches_duckdb(name, con, ray_session):
    got = QUERIES[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(ORACLE_SQL[name]).df()
    # dtype-strict pre-check: an int column on one side must be int on the
    # other (the driver's value hash distinguishes 5 from 5.0 — a missing
    # ::BIGINT in an oracle must fail HERE, not at the driver)
    for c in sorted(set(got.columns) & set(want.columns)):
        gk = got[c].dtype.kind
        wk = want[c].dtype.kind
        gk = "i" if gk in "iu" else gk
        wk = "i" if wk in "iu" else wk
        assert gk == wk, (name, c, got[c].dtype, want[c].dtype)
    g, w = _normalize(got), _normalize(want)
    assert list(g.columns) == list(w.columns), (list(g.columns), list(w.columns))
    assert len(g) == len(w), (name, len(g), len(w))
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)


ROWS_ONLY = [n for n in QUERIES if n not in ORACLE_SQL]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_are_deterministic(name, ray_session):
    got = QUERIES[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert len(got) >= 0
    if name.startswith("crawl"):
        return                      # engine run is cached; determinism is e2e-tested
    again = QUERIES[name](SF_DIR)
    if not isinstance(again, pd.DataFrame):
        again = again.to_pandas()
    # the driver's value-hash is order-insensitive; so is this check
    def _sorted(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    pd.testing.assert_frame_equal(_sorted(got), _sorted(again), check_dtype=False)


def test_lang_id_oracle_on_mixed_languages(tmp_path, ray_session):
    """The lang_id SQL oracle agrees with the Python heuristic on every
    branch (the driver corpus is all-en, so exercise de/fr/es/zh/tie
    paths explicitly)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from darc_ray.pipelines.queries import ORACLE_SQL, QUERIES

    docs = [
        (1, "the cat and the dog of it all for now"),          # en
        (2, "der hund und die katze ist nicht ein problem"),   # de
        (3, "le chat et la souris est une des merveilles"),    # fr
        (4, "el perro y los gatos es una de las cosas"),       # es
        (5, "这是一个中文文档 with some english the and of"),      # zh (CJK wins)
        (6, "xyzzy plugh qwerty"),                             # no hits → en
        (7, "the der le el"),                                  # 1-each tie → en
        (8, "der und ist the a"),                              # de 3 > en 2 → de
        (9, ""),                                               # empty → en
        (10, "LE CHAT ET LA EST UNE"),                         # casefolding → fr
    ]
    sf = str(tmp_path)
    pq.write_table(pa.table({"doc_id": [d for d, _ in docs],
                             "text": [t for _, t in docs]}),
                   f"{sf}/documents.parquet")
    got = QUERIES["lang_id"](sf).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.sql(ORACLE_SQL["lang_id"]).df().sort_values("doc_id").reset_index(drop=True)
    assert got["pred_lang"].tolist() == want["pred_lang"].tolist()
    assert got["pred_lang"].tolist() == \
        ["en", "de", "fr", "es", "zh", "en", "en", "de", "en", "fr"]


def test_custdist_zero_order_bucket(tmp_path, ray_session):
    """The driver corpus gives every customer at least one order, so
    the k = 0 histogram bucket (the LEFT-join null probe path) never
    fires there — plant customers WITHOUT orders and prove the Ray
    path and the SQL oracle agree on the zero bucket."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from darc_ray.pipelines.queries import ORACLE_SQL, QUERIES

    sf = str(tmp_path)
    pq.write_table(pa.table({"c_custkey": [1, 2, 3, 4, 5, 6]}),
                   f"{sf}/customer.parquet")
    # custkeys 4-6 place no orders; 1 places 2, 2 places 1, 3 places 2
    pq.write_table(pa.table({"o_orderkey": [10, 11, 12, 13, 14],
                             "o_custkey": [1, 1, 2, 3, 3]}),
                   f"{sf}/orders.parquet")
    got = QUERIES["custdist"](sf)
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.sql(ORACLE_SQL["custdist"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"c_count": "int64", "custdist": "int64"})
        .reset_index(drop=True))
    assert got.set_index("c_count").loc[0, "custdist"] == 3


def test_quantiles_sketch_within_bin_error(ray_session):
    """The mergeable histogram sketch's quantiles stay within two bin
    widths of the exact per-group quantiles (quantile_cont interpolates
    between two order statistics, each located to within one bin)."""
    from darc_ray.pipelines.queries import q_quantiles, q_quantiles_sketch

    sf = "/root/testdata/sf0.01"
    approx = q_quantiles_sketch(sf).set_index("event_type")
    exact = q_quantiles(sf).set_index("event_type")
    import duckdb as _d
    lohi = _d.sql(f"SELECT event_type, min(value) lo, max(value) hi FROM "
                  f"'{sf}/events.parquet' GROUP BY 1").df().set_index("event_type")
    for et in exact.index:
        tol = 2 * (lohi.loc[et, "hi"] - lohi.loc[et, "lo"]) / 4096 + 1e-9
        for p in ("p50", "p90", "p99"):
            err = abs(float(approx.loc[et, p]) - float(exact.loc[et, p]))
            assert err <= tol, (et, p, err, tol)


def test_driver_window_is_fully_sql_oracled():
    """The driver's correctness harness records only the FIRST 50
    registry entries; a rows-only family in a window slot silently
    downgrades that slot's evidence.  Guard the rotation discipline."""
    window = list(QUERIES)[:50]
    missing = [n for n in window if n not in ORACLE_SQL]
    assert not missing, missing
