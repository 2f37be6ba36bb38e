"""Planted-property checks for the late round-4 corpus operators —
the SQL oracles prove Ray↔DuckDB agreement; these prove the SEMANTICS
against the fixtures' planted structure."""

from __future__ import annotations

import pyarrow.parquet as pq

from darc_ray.pipelines.queries import (
    DUP_NGRAM_W, KMEANS_K, QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_dup_ngrams_flags_shared_boilerplate(ray_session):
    """Every doc containing a corpus-shared boilerplate line must show
    duplicated windows; the window count matches the window formula."""
    from darc_ray.functions.text import ensure_lines_fixture

    fix = pq.read_table(ensure_lines_fixture()).to_pandas()
    out = QUERIES["dup_ngrams"](SF).set_index("doc_id")

    boiler = "copyright example corp all rights reserved"
    with_boiler = fix[fix["text"].str.contains(boiler, regex=False)]
    assert len(with_boiler) > 50          # the fixture plants ~45% of docs
    for doc_id, text in zip(with_boiler["doc_id"], with_boiler["text"]):
        assert out.loc[doc_id, "n_dup_windows"] >= len(boiler) - DUP_NGRAM_W + 1
        distinct = {text[i:i + DUP_NGRAM_W]
                    for i in range(len(text) - DUP_NGRAM_W + 1)}
        assert out.loc[doc_id, "n_windows"] == len(distinct)


def test_image_phash_clusters_groups_planted_dups(ray_session):
    out = QUERIES["image_phash_clusters"]("unused").set_index("image_id")
    dups = [i for i in out.index if i.endswith("-dup")]
    assert dups                            # fixture plants pix-XX-dup rows
    for d in dups:
        base = d[:-4]
        assert out.loc[d, "cluster_id"] == out.loc[base, "cluster_id"]
    # exactly one keeper per cluster, and it has the cluster's max pixels
    g = out.reset_index().groupby("cluster_id")
    assert (g["is_keeper"].sum() == 1).all()
    for _, grp in g:
        keeper = grp[grp["is_keeper"] == 1].iloc[0]
        assert keeper["n_pixels"] == grp["n_pixels"].max()


def test_html_text_strips_markup_and_decodes_entities(ray_session):
    out = QUERIES["html_text"]("unused")
    ex = out["extracted"]
    assert not ex.str.contains("<script", regex=False).any()
    assert not ex.str.contains("spam();", regex=False).any()     # script body
    assert not ex.str.contains("hidden", regex=False).any()      # comment body
    assert not ex.str.contains("margin", regex=False).any()      # style body
    assert not ex.str.contains("&amp;", regex=False).any()       # decoded
    assert ex.str.contains("#0", regex=False).iloc[0]            # title kept
    # no residual tags: any remaining '<' must come from entity decode,
    # i.e. be followed by whitespace/end, never by a letter
    assert not ex.str.contains(r"<[A-Za-z/]", regex=True).any()


def test_kmeans_assign_centroids_self_assign(ray_session):
    out = QUERIES["kmeans_assign"](SF).set_index("vec_id")
    for cid in range(KMEANS_K):
        assert out.loc[cid, "cluster"] == cid
    assert set(out["cluster"].unique()) <= set(range(KMEANS_K))


def test_dataset_split_is_stable_under_growth(ray_session):
    """Adding documents never moves an existing one between splits:
    the sf0.001 assignment must be a prefix-consistent subset of the
    sf0.01 assignment for shared doc_ids."""
    small = QUERIES["dataset_split"](SF).set_index("doc_id")["split"]
    big = QUERIES["dataset_split"]("/root/testdata/sf0.01") \
        .set_index("doc_id")["split"]
    shared = small.index.intersection(big.index)
    assert len(shared) == len(small)
    assert (small.loc[shared] == big.loc[shared]).all()


def test_incremental_dedup_flags_planted_copy(ray_session, tmp_path):
    """A doc in the incoming shard whose text equals a prior doc's is
    flagged; unique incoming docs are not (checked via the same md5
    membership the operator uses, on the real sf table)."""
    import hashlib

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    h = docs["text"].map(
        lambda t: hashlib.md5(t.encode()).hexdigest())
    prior = set(h[docs["doc_id"] % 5 != 0])
    expect = (docs["doc_id"] % 5 == 0)
    want = h[expect].isin(prior).astype(int)
    out = QUERIES["incremental_dedup"](SF).set_index("doc_id")
    got = out["is_dup"]
    want.index = docs.loc[expect, "doc_id"]
    assert (got.sort_index() == want.sort_index()).all()


def test_curation_pipeline_consistent_with_parts(ray_session):
    """The capstone's dispositions agree with the standalone stages:
    funnel rejects keep their reason, surviving non-dups carry exactly
    their dataset_split label, and near_dups were funnel-survivors."""
    disp = QUERIES["curation_pipeline"](SF).set_index("doc_id")["disposition"]
    funnel = QUERIES["quality_funnel"](SF).set_index("doc_id")
    split = QUERIES["dataset_split"](SF).set_index("doc_id")["split"]

    rejects = funnel[funnel["keep"] == 0]
    assert (disp.loc[rejects.index] == rejects["reason"]).all()
    survivors = disp[disp.isin(("train", "val", "test"))]
    assert (survivors == split.loc[survivors.index]).all()
    near = disp[disp == "near_dup"]
    assert (funnel.loc[near.index, "keep"] == 1).all()
    assert set(disp.unique()) >= {"train", "near_dup"}


def test_image_curation_pipeline_dispositions(ray_session):
    """Planted '-bad' rows fail the gate; every '-dup' loses to its
    equal-resolution base (tie → min id) and lands in 'near_dup';
    everything else carries an aspect-bucket label."""
    disp = QUERIES["image_curation_pipeline"]("unused") \
        .set_index("image_id")["disposition"]
    bads = [i for i in disp.index if i.endswith("-bad")]
    dups = [i for i in disp.index if i.endswith("-dup")]
    assert bads and dups
    assert (disp.loc[bads] == "quality").all()
    assert (disp.loc[dups] == "near_dup").all()
    rest = disp.drop(bads + dups)
    assert rest.str.startswith("bucket_").all()
