"""Dedup + ANN stage semantics over controlled inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from darc_ray.stages.ann import HyperplaneLSH, brute_force_topk, lsh_topk
from darc_ray.stages.dedup import (
    embedding_dup_pairs, exact_dedup, minhash_candidate_pairs, ngram_jaccard_pairs,
    verify_pairs_jaccard,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # dup of 1
    (3, "the quick brown fox jumps over the lazy cat near the river bank today"),  # near-dup
    (4, "completely unrelated text about distributed columnar query engines"),
    (5, "another unrelated document mentioning streams shuffles and actors"),
]


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


def test_exact_dedup_first_wins(docs_ds):
    out = exact_dedup(docs_ds).to_pandas()
    assert len(out) == 4                      # docs 1/2 collapse
    keepers = set(out["keeper"])
    assert 1 in keepers and 2 not in keepers


def test_minhash_lsh_finds_near_dups(docs_ds):
    pairs = minhash_candidate_pairs(docs_ds, n_perm=64, n_bands=32,
                                    k_shingle=3).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (1, 2) in got                      # identical docs always collide
    verified = verify_pairs_jaccard(pairs[["a", "b"]],
                                    dict(DOCS), threshold=0.5)
    vp = {(a, b) for a, b in zip(verified["a"], verified["b"])}
    assert (1, 2) in vp
    assert all(j >= 0.5 for j in verified["jaccard"])
    # unrelated docs never survive verification
    assert not any({4, 5} & {a, b} and {1, 2, 3} & {a, b} for a, b in vp)


def test_ngram_jaccard_pairs():
    ids = [d for d, _ in DOCS]
    texts = [t for _, t in DOCS]
    out = ngram_jaccard_pairs(ids, texts, k=3, threshold=0.5)
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    assert (1, 2) in got and (1, 3) in got
    assert out[out["a"] == 1][out["b"] == 2]["jaccard"].iloc[0] == 1.0


def test_embedding_dup_pairs_exact():
    ids = np.array([10, 11, 12])
    vecs = np.array([[1.0, 0.0], [0.999, 0.01], [0.0, 1.0]])
    out = embedding_dup_pairs(ids, vecs, threshold=0.95)
    assert {(a, b) for a, b in zip(out["a"], out["b"])} == {(10, 11)}


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    vecs = rng.standard_normal((80, 16))
    df = pd.DataFrame({"vec_id": np.arange(80, dtype=np.int64),
                       "embedding": [v.astype(np.float32).tolist() for v in vecs]})
    ds = rd.from_pandas(df)
    out = brute_force_topk(ds, query_ids=[0, 1], k=5)
    # independent numpy check
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in (0, 1):
        sims = m @ m[qid]
        sims[qid] = -np.inf
        want = list(np.argsort(-sims, kind="stable")[:5])
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"].tolist()
        assert got == want


def test_lsh_topk_recall_vs_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    base = rng.standard_normal((60, 16))
    df = pd.DataFrame({"vec_id": np.arange(60, dtype=np.int64),
                       "embedding": [v.astype(np.float32).tolist() for v in base]})
    ds = rd.from_pandas(df)
    brute = brute_force_topk(ds, query_ids=[0], k=5)
    approx = lsh_topk(ds, query_ids=[0], k=5, n_planes=3)
    want = set(brute["neighbor_id"])
    got = set(approx["neighbor_id"])
    assert len(want & got) >= 2               # multi-probe recall on tiny corpus


def test_hyperplane_lsh_deterministic():
    lsh = HyperplaneLSH(8, n_planes=6, seed=5)
    v = np.ones((3, 8))
    assert np.array_equal(lsh.buckets(v), HyperplaneLSH(8, 6, 5).buckets(v))
    probes = lsh.probe(np.ones(8))
    assert len(probes) == 7 and len(set(probes)) == 7


def test_ivf_topk_recall_vs_brute(ray_session):
    import ray.data as rd

    from darc_ray.stages.ann import ivf_topk

    rng = np.random.default_rng(13)
    base = rng.standard_normal((200, 16))
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                       "embedding": [v.astype(np.float32).tolist() for v in base]})
    ds = rd.from_pandas(df)
    brute = brute_force_topk(ds, query_ids=[0, 1], k=5)
    approx = ivf_topk(ds, query_ids=[0, 1], k=5, n_cells=8, nprobe=4)
    for qid in (0, 1):
        want = set(brute[brute["query_id"] == qid]["neighbor_id"])
        got = set(approx[approx["query_id"] == qid]["neighbor_id"])
        assert len(want & got) >= 3       # nprobe=4 of 8 cells on 200 vecs
    # determinism: same seed, same result
    again = ivf_topk(ds, query_ids=[0, 1], k=5, n_cells=8, nprobe=4)
    pd.testing.assert_frame_equal(approx, again)


def test_simhash_near_pairs_exact_recall(ray_session):
    """Banded blocking finds exactly the pairs an O(n²) hamming scan
    finds (pigeonhole guarantees recall at the radius)."""
    import ray.data as rd

    from darc_ray.functions.sketches import simhash64
    from darc_ray.stages.dedup import simhash_near_pairs

    docs = [(i, t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog near the river",
        "the quick brown fox jumps over the lazy dog near the rivers",
        "the quick brown fox jumped over the lazy dog near the river",
        "completely different text about distributed query engines",
        "another unrelated document mentioning streams and shuffles",
        "the quick brown fox jumps over the lazy dog near the river",  # exact dup
    ])]
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = simhash_near_pairs(ds, max_hamming=3)
    got_pairs = {(a, b) for a, b in zip(got["a"], got["b"])}
    hashes = {i: simhash64(t) for i, t in docs}
    want = {(a, b) for a in hashes for b in hashes if a < b
            and bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 3}
    assert got_pairs == want
    assert (0, 5) in got_pairs          # exact dup pair at hamming 0


def test_ngram_join_hot_shingle_cap(ray_session):
    """Skew guard (VERDICT r2 item 3): one shingle shared by 10k docs
    would self-merge to 10^8 rows in a single partition; with a df cap
    the join completes fast, still finds pairs connected by cold
    shingles, and misses pairs connected ONLY by the hot shingle (the
    documented trade)."""
    import ray.data as rd

    from darc_ray.stages.dedup import ngram_jaccard_join

    n = 10_000
    rows = [(i, f"common shared prefix unique{i} filler{i} tail{i}")
            for i in range(n)]
    # planted dup pair connected by its own (cold) shingles
    rows.append((n, "alpha beta gamma delta epsilon zeta"))
    rows.append((n + 1, "alpha beta gamma delta epsilon zeta"))
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["doc_id", "text"]))

    import time

    t0 = time.perf_counter()
    out = ngram_jaccard_join(ds, k=3, threshold=0.5, max_df=100)
    elapsed = time.perf_counter() - t0
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    assert (n, n + 1) in got                      # cold-shingle dup found
    # the 10k hot-shingle docs share ONLY the capped shingle -> no
    # quadratic pair explosion, none of them pair up
    assert not any(a < n and b < n for a, b in got)
    assert elapsed < 120                          # no quadratic partition


def test_embedding_lsh_matches_exact_on_near_dups(ray_session):
    """The LSH-bucketed default path finds the same >= 0.95 pairs as
    the exact block-tile kernel on planted near-dups (seeded and
    deterministic)."""
    import ray.data as rd

    from darc_ray.stages.dedup import (embedding_dup_pairs_auto,
                                       embedding_dup_pairs_blocked,
                                       embedding_dup_pairs_lsh)

    rng = np.random.default_rng(11)
    base = rng.standard_normal((300, 64))
    planted = base[:20] + 0.05 * rng.standard_normal((20, 64))  # cosine ~0.998
    vecs = np.concatenate([base, planted])
    ids = np.arange(len(vecs))
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [v.astype(np.float32) for v in vecs]})
    ds = rd.from_pandas(df)

    exact = embedding_dup_pairs_blocked(ds, threshold=0.95, block_rows=64)
    lsh = embedding_dup_pairs_lsh(ds, threshold=0.95)
    pd.testing.assert_frame_equal(exact, lsh)
    assert len(lsh) >= 20                         # every planted pair found

    # threshold routing: >= 0.7 -> LSH (no O(n^2) tiles), below -> exact
    auto_hi = embedding_dup_pairs_auto(ds, threshold=0.95)
    pd.testing.assert_frame_equal(auto_hi, lsh)


def test_verify_coshuffled_equals_broadcast(ray_session):
    """The no-broadcast verify rung (two hash joins shipping each pair
    its texts) returns exactly what the broadcast flavor returns."""
    import ray.data as rd

    from darc_ray.stages.dedup import (minhash_candidate_pairs,
                                       verify_pairs_coshuffled,
                                       verify_pairs_distributed)

    docs = list(DOCS) + [
        (6, "the quick brown fox jumps over the lazy dog near the river bank now"),
        (7, "streams shuffles actors and columnar batches all the way down"),
    ]
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    pairs = (minhash_candidate_pairs(ds, n_perm=64, n_bands=32, k_shingle=3)
             .to_pandas().drop_duplicates())
    want = (verify_pairs_distributed(ds, pairs, threshold=0.5)
            .sort_values(["a", "b"]).reset_index(drop=True))
    got = verify_pairs_coshuffled(ds, pairs, threshold=0.5)
    pd.testing.assert_frame_equal(got, want)
    assert {(1, 2)} <= {(a, b) for a, b in zip(got["a"], got["b"])}


def test_connected_components_variants_agree(ray_session):
    """Driver union-find and the Dataset min-label propagation must
    produce identical component labels (chains, cliques, singletons)."""
    import pandas as pd

    from darc_ray.stages.dedup import (connected_components,
                                       connected_components_distributed)

    pairs = pd.DataFrame({
        "a": [1, 2, 5, 9, 9, 20, 30, 31, 32, 100],
        "b": [2, 3, 6, 10, 11, 21, 31, 32, 30, 1]})
    uf = connected_components(pairs)
    lp_ds = connected_components_distributed(pairs)
    lp_df = lp_ds.to_pandas()
    assert uf == dict(zip(lp_df["node"], lp_df["label"]))
    # chain 1-2-3 merged with 100 via (100,1): all label 1
    assert uf[3] == 1 and uf[100] == 1
    assert uf[30] == uf[32] == 30
    assert connected_components(pairs.iloc[0:0]) == {}
    empty = connected_components_distributed(pairs.iloc[0:0])
    assert empty.count() == 0 and "node" in empty.schema().names


def test_ngram_join_coshuffled_sizes_match_broadcast(ray_session, monkeypatch):
    """The co-shuffled size rung (doc-count above the broadcast cap)
    must produce bit-identical pairs + jaccard to the broadcast-dict
    rung."""
    import ray.data as rd

    from darc_ray.stages.dedup import ngram_jaccard_join

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(300):
        k = rng.integers(6, 14)
        rows.append((i, " ".join(rng.choice(words, k))))
    for i in range(300, 330):           # planted near-dups
        rows.append((i, rows[i - 300][1] + " extra"))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])

    broadcast = ngram_jaccard_join(rd.from_pandas(df), k=3, threshold=0.3)
    monkeypatch.setenv("DARC_RAY_NGRAM_MAX_BROADCAST_DOCS", "0")
    coshuffled = ngram_jaccard_join(rd.from_pandas(df), k=3, threshold=0.3)
    pd.testing.assert_frame_equal(coshuffled, broadcast)
    assert len(broadcast) >= 30
