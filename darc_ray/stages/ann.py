"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk`` — the exact baseline: the query matrix is
  broadcast once (``ray.put``); each ``map_batches`` task computes a
  (batch × queries) cosine block via numpy matmul and emits only its
  per-batch top-k rows; the driver reduces the tiny per-batch
  candidates to the global top-k.  No shuffle; scales as
  map-side-reduce.
* ``lsh_topk`` — the scale path: seeded random-hyperplane signatures
  bucket the corpus (``groupby(bucket)``); queries probe their own
  bucket (+ multi-probe neighbors at hamming ≤ 1) and rerank
  exactly within candidates.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _fetch_query_rows(ds, query_ids: list[int], id_col: str, vec_col: str
                      ) -> tuple[list, np.ndarray]:
    """(sorted query ids, normalized query matrix) via a filtered scan."""
    import pyarrow.compute as pc

    value_set = pa.array(sorted(query_ids))
    rows = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=value_set)),
        batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("no query rows found")
    rows.sort(key=lambda r: r[id_col])
    return ([r[id_col] for r in rows],
            _normalize(_as_matrix([r[vec_col] for r in rows])))


def _reduce_topk(cands: pd.DataFrame, q_ids: list, k: int,
                 with_sim: bool) -> pd.DataFrame:
    """Driver-side reduce of per-batch top-k candidates (tiny:
    batches × queries × k rows); tie-break (−sim, neighbor_id)."""
    out = []
    for qid in q_ids:
        g = cands[cands["query_id"] == qid]
        top = heapq.nsmallest(
            k, g.itertuples(index=False), key=lambda r: (-r.sim, r.neighbor_id))
        for rank, r in enumerate(top):
            if with_sim:
                out.append((qid, r.neighbor_id, rank + 1,
                            float(np.round(r.sim, 6))))
            else:
                out.append((qid, r.neighbor_id, rank + 1))
    cols = ["query_id", "neighbor_id", "rank"] + (["sim"] if with_sim else [])
    return pd.DataFrame(out, columns=cols)


class BatchTopK:
    """map_batches task: per-batch top-k candidates per query."""

    def __init__(self, query_ref, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding", exclude_self: bool = True) -> None:
        import ray

        q = ray.get(query_ref) if not isinstance(query_ref, tuple) else query_ref
        self.q_ids, self.q_mat = q            # (ids, normalized matrix)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        vecs = _normalize(_as_matrix(batch.column(self.vec_col).to_pylist()))
        sims = vecs @ self.q_mat.T            # (batch, n_queries)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            col = sims[:, qi]
            order = np.argsort(-col, kind="stable")
            taken = 0
            for bi in order:
                if taken >= self.k:
                    break
                if self.exclude_self and ids[bi] == qid:
                    continue
                out_q.append(qid)
                out_n.append(ids[bi])
                out_s.append(float(col[bi]))
                taken += 1
        return pa.Table.from_pydict({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "sim": pa.array(out_s, type=pa.float64())})


def brute_force_topk(ds, query_ids: list[int], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Exact cosine top-k of each query over the whole dataset.

    Deterministic tie-break: (−sim, neighbor_id)."""
    import ray

    q_ids, q_mat = _fetch_query_rows(ds, query_ids, id_col, vec_col)
    ref = ray.put((q_ids, q_mat))

    cands = ds.map_batches(
        BatchTopK, fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow", batch_size=4096, concurrency=2).to_pandas()
    return (_reduce_topk(cands, q_ids, k, with_sim=False)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


# ---------------------------------------------------------------- IVF variant
def _kmeans(sample: np.ndarray, k: int, seed: int, iters: int = 8) -> np.ndarray:
    """Deterministic small k-means (k-means++-free: seeded random init
    from the sample, fixed iteration count) → (k, d) normalized
    centroids.  Runs on a bounded sample, never the corpus."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        sims = sample @ centroids.T                  # cosine on normalized rows
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IvfProbeTopK:
    """map_batches task: assign each corpus row to its nearest
    centroid, keep rows in some query's probed cells, exact top-k
    within; same reduce contract as :class:`LshProbeTopK`."""

    def __init__(self, ref, k: int, id_col: str, vec_col: str) -> None:
        import ray

        self.q_ids, self.q_mat, self.centroids, self.probe_sets = ray.get(ref)
        self.all_probes = set().union(*self.probe_sets) if self.probe_sets else set()
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        vecs = _normalize(_as_matrix(batch.column(self.vec_col).to_pylist()))
        cells = np.argmax(vecs @ self.centroids.T, axis=1)
        keep = np.fromiter((int(c) in self.all_probes for c in cells),
                           dtype=bool, count=len(cells))
        out_q, out_n, out_s = [], [], []
        if keep.any():
            ids_k, vecs_k, ck = ids[keep], vecs[keep], cells[keep]
            for qi, qid in enumerate(self.q_ids):
                probes = self.probe_sets[qi]
                cand = np.fromiter((int(c) in probes for c in ck),
                                   dtype=bool, count=len(ck))
                cand &= ids_k != qid
                if not cand.any():
                    continue
                c_ids = ids_k[cand]
                sims = vecs_k[cand] @ self.q_mat[qi]
                order = sorted(range(len(c_ids)),
                               key=lambda i: (-sims[i], c_ids[i]))[:self.k]
                for i in order:
                    out_q.append(qid)
                    out_n.append(int(c_ids[i]))
                    out_s.append(float(sims[i]))
        return pa.Table.from_pydict({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "sim": pa.array(out_s, type=pa.float64())})


def ivf_topk(ds, query_ids: list[int], k: int = 10, n_cells: int = 16,
             nprobe: int = 4, seed: int = 5, sample_rows: int = 4096,
             id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """IVF ANN, Dataset-native: train centroids on a deterministic
    hash-sample (one bounded take), broadcast (queries, centroids,
    per-query nprobe cell sets), then a single ``map_batches`` pass
    assigns cells and emits per-batch exact top-k within probed cells.
    Corpus never materializes; training data is the sample only."""
    import heapq as _heapq

    import pyarrow.compute as pc
    import ray

    # deterministic hash-sample for training: the filter RATE adapts to
    # the corpus size so membership is a pure function of ids (a
    # streaming limit() would take a completion-order-dependent SUBSET
    # when more rows pass than sample_rows); the take is bounded to
    # ~2×sample_rows in expectation, then truncated sorted-by-id
    n = ds.count()
    rate = min(1024, max(1, (2 * sample_rows * 1024) // max(1, n)))

    def sample_batch(t: pa.Table) -> pa.Table:
        keys = pc.multiply(pc.cast(t[id_col], pa.int64()), pa.scalar(2654435761))
        keep = pc.less(pc.bit_wise_and(keys, pa.scalar(1023)), pa.scalar(rate))
        return t.filter(keep).select([id_col, vec_col])

    rows = ds.map_batches(sample_batch, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    rows = rows[:sample_rows]
    train = _normalize(_as_matrix([r[vec_col] for r in rows]))
    centroids = _kmeans(train, n_cells, seed)

    q_ids, q_mat = _fetch_query_rows(ds, query_ids, id_col, vec_col)
    sims = q_mat @ centroids.T
    probe_sets = [set(int(c) for c in np.argsort(-sims[i])[:nprobe])
                  for i in range(len(q_ids))]
    ref = ray.put((q_ids, q_mat, centroids, probe_sets))

    cands = ds.map_batches(
        IvfProbeTopK, fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow", batch_size=4096, concurrency=2).to_pandas()
    return _reduce_topk(cands, q_ids, k, with_sim=True)


# ---------------------------------------------------------------- LSH variant
class HyperplaneLSH:
    def __init__(self, dim: int, n_planes: int = 12, seed: int = 5) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def buckets(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) > 0
        return (bits @ (1 << np.arange(bits.shape[1]))).astype(np.int64)

    def probe(self, vec: np.ndarray) -> list[int]:
        """Own bucket + all hamming-1 neighbors (multi-probe)."""
        b = int(self.buckets(vec[None, :])[0])
        return [b] + [b ^ (1 << i) for i in range(self.planes.shape[0])]


class LshProbeTopK:
    """map_batches task: bucket each corpus row by hyperplane signature,
    keep only rows landing in some query's probe set, emit per-batch
    exact top-k within those candidates.  The corpus never leaves the
    object store; per-batch output is ≤ queries × k rows."""

    def __init__(self, query_ref, k: int, n_planes: int, seed: int,
                 id_col: str, vec_col: str) -> None:
        import ray

        self.q_ids, self.q_mat, self.probe_sets = ray.get(query_ref)
        self.lsh = HyperplaneLSH(self.q_mat.shape[1], n_planes, seed)
        self.all_probes = set().union(*self.probe_sets) if self.probe_sets else set()
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        vecs = _normalize(_as_matrix(batch.column(self.vec_col).to_pylist()))
        buckets = self.lsh.buckets(vecs)
        keep = np.fromiter((int(b) in self.all_probes for b in buckets),
                           dtype=bool, count=len(buckets))
        out_q, out_n, out_s = [], [], []
        if keep.any():
            ids_k, vecs_k, bk = ids[keep], vecs[keep], buckets[keep]
            for qi, qid in enumerate(self.q_ids):
                probes = self.probe_sets[qi]
                cand = np.fromiter((int(b) in probes for b in bk),
                                   dtype=bool, count=len(bk))
                cand &= ids_k != qid
                if not cand.any():
                    continue
                c_ids = ids_k[cand]
                sims = vecs_k[cand] @ self.q_mat[qi]
                order = sorted(range(len(c_ids)),
                               key=lambda i: (-sims[i], c_ids[i]))[:self.k]
                for i in order:
                    out_q.append(qid)
                    out_n.append(int(c_ids[i]))
                    out_s.append(float(sims[i]))
        return pa.Table.from_pydict({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "sim": pa.array(out_s, type=pa.float64())})


def lsh_topk(ds, query_ids: list[int], k: int = 10, n_planes: int = 10,
             seed: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding") -> pd.DataFrame:
    """LSH-bucketed ANN, Dataset-native: fetch only the query rows,
    broadcast (query matrix, per-query multi-probe bucket sets) once,
    then a single ``map_batches`` pass buckets each corpus block and
    emits per-batch top-k candidates; the driver reduces the tiny
    per-batch results.  No corpus materialization anywhere."""
    import ray

    q_ids, q_mat = _fetch_query_rows(ds, query_ids, id_col, vec_col)
    lsh = HyperplaneLSH(q_mat.shape[1], n_planes, seed)
    probe_sets = [set(lsh.probe(q_mat[i])) for i in range(len(q_ids))]
    ref = ray.put((q_ids, q_mat, probe_sets))

    cands = ds.map_batches(
        LshProbeTopK, fn_constructor_args=(ref, k, n_planes, seed, id_col, vec_col),
        batch_format="pyarrow", batch_size=4096, concurrency=2).to_pandas()
    return _reduce_topk(cands, q_ids, k, with_sim=True)
