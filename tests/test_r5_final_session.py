"""Planted-property tests for the final round-5 session families —
properties the DuckDB-parity harness can't express (it proves Ray ==
SQL; these prove both == the planted construction).

Families: forecast_revenue / top_supplier / sole_late_supplier (TPC-H
Q6/Q15/Q21-shape), video_qa_pipeline (seventh composed capstone),
mojibake_gate, containment_dups, coreset_sample, doc_stitch_dups,
snapshot_diff.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_video_qa_rejects_at_first_failing_stage(ray_session):
    from darc_ray.pipelines.queries import q_video_qa_pipeline

    out = q_video_qa_pipeline(SF).set_index("video_id")
    # every planted defect rejects at ITS stage, multi-defect at the
    # FIRST failing stage (ids encode intent)
    expect = {
        "vqa-0-clean": "keep", "vqa-1-clean": "keep",
        "vqa-2-frameliar": "manifest", "vqa-3-fpsliar": "manifest",
        "vqa-4-frozen": "static", "vqa-5-slideshow": "slideshow",
        "vqa-6-lowmotion": "lowmotion", "vqa-7-single": "keep",
        "vqa-8-frozenliar": "manifest", "vqa-9-tailfrozen": "static",
    }
    assert out["reject_stage"].to_dict() == expect
    # -1 masking: stages after the first failure are never evaluated
    row = out.loc["vqa-2-frameliar"]
    assert (row["static_bad"], row["slideshow_bad"],
            row["lowmotion_bad"]) == (-1, -1, -1)
    # keep implies every gate 0 and manifest 1
    kept = out[out["keep"] == 1]
    assert (kept["manifest_ok"] == 1).all()
    assert (kept[["static_bad", "slideshow_bad", "lowmotion_bad"]]
            == 0).all().all()


def test_mojibake_clean_docs_never_flagged(ray_session):
    from darc_ray.pipelines.queries import q_mojibake_gate

    out = q_mojibake_gate(SF)
    kind = out["doc_id"] % 5
    clean = out[kind == 0]
    assert len(clean) == 60
    assert (clean[["n_fffd", "n_c1", "n_moji", "damage_milli",
                   "is_damaged"]] == 0).all().all()
    # saturated docs always flag
    assert (out[kind == 4]["is_damaged"] == 1).all()
    # flag rule is exactly (damage>=5 OR fffd>=3)
    rule = ((out["damage_milli"] >= 5) | (out["n_fffd"] >= 3))
    assert (out["is_damaged"] == rule.astype("int64")).all()


def test_containment_catches_what_jaccard_misses(ray_session):
    """A short doc fully embedded in a long one: containment 1.0,
    Jaccard small — the asymmetric metric's reason to exist."""
    import ray.data as rd

    from darc_ray.stages.dedup import ngram_jaccard_join

    short = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} filler{i*7%13} pad{i*3%11}"
                      for i in range(60))
    long_doc = filler + " " + short + " " + filler
    ds = rd.from_items([{"doc_id": 1, "text": short},
                        {"doc_id": 2, "text": long_doc}])
    cont = ngram_jaccard_join(ds, k=3, threshold=0.9,
                              metric="containment")
    assert len(cont) == 1 and float(cont.iloc[0]["containment"]) >= 0.9
    jac = ngram_jaccard_join(ds, k=3, threshold=0.5)
    assert len(jac) == 0            # symmetric metric dilutes it away


def test_coreset_first_pick_is_true_argmax(ray_session):
    """Pick 1 must equal the brute-force integer argmax from the
    seed, and picked min-distances never increase."""
    import pyarrow.parquet as pq

    from darc_ray.pipelines.queries import q_coreset_sample

    out = q_coreset_sample(SF)
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    q = np.floor(np.asarray(t["embedding"].to_pylist(),
                            dtype=np.float64) * 1000 + 0.5).astype(np.int64)
    seed = int(ids.min())
    d = ((q - q[ids == seed][0]) ** 2).sum(axis=1)
    d[ids == seed] = -1
    best = ids[np.lexsort((ids, -d))[0]]
    assert int(out.iloc[0]["vec_id"]) == seed
    assert int(out.iloc[1]["vec_id"]) == int(best)
    picked = out["dist_q"].to_numpy()[1:]
    assert (np.diff(picked) <= 0).all()     # greedy radii shrink


def test_stitch_chains_fan_and_short_docs(ray_session):
    from darc_ray.functions.text import ensure_stitch_fixture
    from darc_ray.pipelines.queries import q_doc_stitch_dups

    out = q_doc_stitch_dups(SF)
    # chains (2,3,4,2,3) contribute (len-1) links each = 9; the 3-way
    # fan contributes 2 (one suffix continued by two docs)
    assert len(out) == 9 + 2
    fan = out.groupby("a").size()
    assert (fan.max() == 2) and (fan == 2).sum() == 1
    # no self pairs, all doc ids exist in the fixture
    assert (out["a"] != out["b"]).all()


def test_snapshot_diff_statuses_match_derivation(ray_session):
    import pyarrow.parquet as pq

    from darc_ray.pipelines.queries import q_snapshot_diff

    out = q_snapshot_diff(SF)
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    removed = set(ids[ids % 17 == 3])
    # changed excludes docs B removed
    changed = set(ids[(ids % 13 == 5) & (ids % 17 != 3)])
    added = set(ids[ids % 23 == 7] + 10_000_000)
    got = {s: set(g["doc_id"]) for s, g in out.groupby("status")}
    assert got.get(1, set()) == added
    assert got.get(2, set()) == removed
    assert got.get(3, set()) == changed


def test_top_supplier_ties_kept(ray_session):
    """Two suppliers planted at the same total must BOTH survive the
    max filter (the Q15 view semantics)."""
    import ray.data as rd

    import darc_ray.pipelines.queries as Q

    base = Q.QUERIES["top_supplier"](SF)
    assert len(base) >= 1
    assert base["total_cents"].nunique() == 1


def test_sole_late_supplier_requires_multi_supplier_orders(ray_session):
    """Every blamed order must have >=2 distinct suppliers and exactly
    one late one — re-derive from raw tables with pandas."""
    import pyarrow.parquet as pq

    from darc_ray.pipelines.queries import q_sole_late_supplier

    out = q_sole_late_supplier(SF)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey",
                                "l_shipdate"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_orderstatus",
                                    "o_orderdate"]).to_pandas()
    lim = pd.Timedelta(days=90)
    g = (li.groupby(["l_orderkey", "l_suppkey"], as_index=False)
         .agg(ship=("l_shipdate", "max")))
    g = g.merge(orders[orders["o_orderstatus"] == "F"],
                left_on="l_orderkey", right_on="o_orderkey")
    g["late"] = (g["ship"] - g["o_orderdate"] > lim).astype(int)
    per = g.groupby("l_orderkey").agg(n=("l_suppkey", "size"),
                                      late=("late", "sum"))
    sole = per[(per["n"] >= 2) & (per["late"] == 1)].index
    blamed = g[g["l_orderkey"].isin(sole) & (g["late"] == 1)]
    expect = blamed.groupby("l_suppkey").size()
    got = out.set_index("s_suppkey")["numwait"]
    assert got.sort_index().to_dict() == expect.sort_index().to_dict()
