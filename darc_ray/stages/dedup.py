"""Deduplication operators over a documents table (doc_id, text).

Five flavors, each a Ray Data pipeline (batch-vectorized kernels,
shuffles only where semantically required):

* exact            — content-hash → ``groupby(hash).min(doc_id)``
* minhash LSH      — shingle → minhash → band rows → bucket groupby →
                     candidate pairs → exact-Jaccard verify
* simhash          — 64-bit simhash column (+ near-pair scan by
                     hamming radius over banded prefixes)
* n-gram Jaccard   — sparse shingle-matrix intersection (vectorized)
* embedding cosine — normalized matrix product above threshold

Scale notes: the LSH path is the 100 TB design (band buckets shuffle
only O(n_bands·n_docs) small rows; candidates are verified pairwise
within buckets).  The n-gram / embedding all-pairs variants are
exact baselines intended for bounded inputs (they document their
O(n²) nature); at scale the same verify runs per LSH bucket.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from darc_ray.functions.sketches import MinHasher, jaccard, lsh_bands, simhash64
from darc_ray.functions.text import word_shingles


# ---------------------------------------------------------------- exact
def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    texts = batch.column(col).to_pylist()
    hashes = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    return batch.append_column("text_hash", pa.array(hashes, type=pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """First (min id) per exact text: hash in map_batches, then a
    small groupby over (hash, id) pairs only — never shuffling text."""
    from ray.data.aggregate import Min

    hashed = (ds.map_batches(lambda t: add_text_hash(t, text_col),
                             batch_format="pyarrow")
                .select_columns([id_col, "text_hash"]))
    return hashed.groupby("text_hash").aggregate(Min(id_col, alias_name="keeper"))


# ---------------------------------------------------------------- minhash LSH
class MinHashStage:
    """doc rows → (band, band_hash, doc_id) rows (the LSH explode)."""

    def __init__(self, n_perm: int = 128, n_bands: int = 32, k_shingle: int = 3,
                 seed: int = 7, id_col: str = "doc_id", text_col: str = "text") -> None:
        self.hasher = MinHasher(n_perm, seed)
        self.n_bands = n_bands
        self.k = k_shingle
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sigs = self.hasher.signatures([word_shingles(t, self.k) for t in texts])
        out_band, out_hash, out_id = [], [], []
        for i, doc in enumerate(ids):
            for band, bh in lsh_bands(sigs[i], self.n_bands):
                out_band.append(band)
                out_hash.append(bh)
                out_id.append(doc)
        return pa.Table.from_pydict({
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.int64()),
            "doc_id": pa.array(out_id)})


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(group["doc_id"].tolist()))
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"a": a, "b": b})


def minhash_candidate_pairs(ds, n_perm: int = 128, n_bands: int = 32,
                            k_shingle: int = 3, seed: int = 7):
    """documents → distinct LSH candidate pairs (a < b).

    Bucket grouping is done per-batch in pandas after the (band,
    band_hash) sort key is attached — the band table is tiny relative
    to documents, and the pair set is distinct-ed vectorized instead of
    via per-group ``map_groups`` tasks."""
    bands = ds.map_batches(
        MinHashStage, fn_constructor_args=(n_perm, n_bands, k_shingle, seed),
        batch_format="pyarrow", concurrency=2)

    def pairs_of_band(df: pd.DataFrame) -> pd.DataFrame:
        out = [_bucket_pairs(g) for _, g in df.groupby("band_hash") if len(g) > 1]
        if not out:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        return pd.concat(out, ignore_index=True).drop_duplicates()

    # ONE shuffle with n_bands coarse groups; buckets pair vectorized
    # inside each band group.  Pairs may repeat ACROSS bands — callers
    # distinct the (small, LSH-bounded) result.
    return bands.groupby("band").map_groups(pairs_of_band, batch_format="pandas")


def verify_pairs_jaccard(pairs_df: pd.DataFrame, texts_by_id: dict,
                         k_shingle: int = 3, threshold: float = 0.6) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs.  ``texts_by_id``
    is a broadcast small-side lookup (``ray.put`` at scale per bucket)."""
    cache: dict = {}

    def sh(i):
        got = cache.get(i)
        if got is None:
            got = cache[i] = word_shingles(texts_by_id[i], k_shingle)
        return got

    sims = [jaccard(sh(a), sh(b)) for a, b in zip(pairs_df["a"], pairs_df["b"])]
    out = pairs_df.copy()
    out["jaccard"] = sims
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


# ---------------------------------------------------------------- simhash
def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = [simhash64(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column("simhash", pa.array(vals, type=pa.int64()))


# ---------------------------------------------------------------- n-gram jaccard
def ngram_jaccard_pairs(ids: list, texts: list[str], k: int = 3,
                        threshold: float = 0.5) -> pd.DataFrame:
    """All-pairs exact Jaccard via sparse shingle incidence matmul
    (vectorized; O(n²) — bounded inputs / per-LSH-bucket use)."""
    vocab: dict[str, int] = {}
    rows, cols = [], []
    sizes = np.zeros(len(ids), dtype=np.int64)
    for i, t in enumerate(texts):
        sh = word_shingles(t, k)
        sizes[i] = len(sh)
        for s in sh:
            j = vocab.setdefault(s, len(vocab))
            rows.append(i)
            cols.append(j)
    m = np.zeros((len(ids), len(vocab)), dtype=np.float32)
    m[rows, cols] = 1.0
    inter = m @ m.T
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = np.where(union > 0, inter / union, 1.0)
    iu = np.triu_indices(len(ids), k=1)
    mask = sim[iu] >= threshold
    return pd.DataFrame({
        "a": np.array(ids)[iu[0][mask]],
        "b": np.array(ids)[iu[1][mask]],
        "jaccard": np.round(sim[iu][mask].astype(np.float64), 6)})


# ---------------------------------------------------------------- embedding cosine
def embedding_dup_pairs(ids: np.ndarray, vecs: np.ndarray,
                        threshold: float = 0.95) -> pd.DataFrame:
    """Near-dup pairs by cosine ≥ threshold (normalized matmul)."""
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    u = vecs / norms
    sim = u @ u.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sim[iu] >= threshold
    return pd.DataFrame({
        "a": ids[iu[0][mask]],
        "b": ids[iu[1][mask]],
        "cosine": np.round(sim[iu][mask].astype(np.float64), 6)})
