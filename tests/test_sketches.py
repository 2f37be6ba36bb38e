"""Sketch kernels: minhash exactness, LSH banding, simhash, jaccard."""

from __future__ import annotations

import numpy as np

from darc_ray.functions.sketches import MinHasher, jaccard, lsh_bands, simhash64
from darc_ray.functions.text import word_shingles


def test_minhash_vectorized_equals_bigint_reference():
    mh = MinHasher(n_perm=32, seed=3)
    sets = [word_shingles("alpha beta gamma delta epsilon zeta"),
            word_shingles("one two three four five six seven eight"),
            {"single"}]
    fast = mh.signatures(sets)
    for i, s in enumerate(sets):
        assert np.array_equal(fast[i], mh.signature(s)), i


def test_minhash_similarity_estimates_jaccard():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(200)]
    a = set(words[:120])
    b = set(words[60:180])
    true_j = jaccard(a, b)
    mh = MinHasher(n_perm=256, seed=1)
    sa, sb = mh.signatures([a, b])
    est = float(np.mean(sa == sb))
    assert abs(est - true_j) < 0.12


def test_lsh_bands_shape_and_determinism():
    mh = MinHasher(n_perm=64, seed=2)
    sig = mh.signatures([{"a b c", "b c d"}])[0]
    bands = lsh_bands(sig, 16)
    assert len(bands) == 16
    assert bands == lsh_bands(sig, 16)
    assert all(0 <= b < 16 for b, _ in bands)


def test_identical_docs_always_collide():
    mh = MinHasher(n_perm=64, seed=2)
    s = word_shingles("the quick brown fox jumps over the lazy dog")
    s1, s2 = mh.signatures([s, set(s)])
    assert np.array_equal(s1, s2)
    assert lsh_bands(s1, 16) == lsh_bands(s2, 16)


def test_simhash_properties():
    h1 = simhash64("alpha beta gamma delta epsilon")
    h2 = simhash64("alpha beta gamma delta epsilon")
    h3 = simhash64("alpha beta gamma delta zeta")
    h4 = simhash64("completely different words entirely here")
    assert h1 == h2
    d_close = bin((h1 ^ h3) & ((1 << 64) - 1)).count("1")
    d_far = bin((h1 ^ h4) & ((1 << 64) - 1)).count("1")
    assert d_close < d_far
    assert -(1 << 63) <= h1 < (1 << 63)


def test_jaccard_edges():
    assert jaccard(set(), set()) == 1.0
    assert jaccard({"a"}, set()) == 0.0
    assert jaccard({"a", "b"}, {"a", "b"}) == 1.0


def test_bloom_filter_no_false_negatives_and_low_fp():
    import numpy as np

    from darc_ray.functions.sketches import BloomFilter64

    rng = np.random.default_rng(7)
    keys = rng.integers(-2**62, 2**62, 4096)
    bf = BloomFilter64(keys)
    assert bf.contains(keys).all()                    # never a false negative
    probe = rng.integers(-2**62, 2**62, 100_000)
    member = np.isin(probe, keys)
    fp = bf.contains(probe[~member]).mean()
    assert fp < 0.01, fp                              # ~12 bits/key, k=4
    assert bf.contains(np.array([], dtype=np.int64)).shape == (0,)


def test_bloom_filter_tiny_and_negative_keys():
    import numpy as np

    from darc_ray.functions.sketches import BloomFilter64

    keys = np.array([-1, 0, 1, 2**62, -2**62], dtype=np.int64)
    bf = BloomFilter64(keys)
    assert bf.contains(keys).all()


def test_hll_accuracy_and_merge_equality():
    """One-shot add == chunked add+merge (mergeability is what makes
    the sketch a per-batch partial), and the estimate stays within the
    ~3σ theoretical band (1.04/sqrt(m) ≈ 1.6 % at p=12)."""
    from darc_ray.functions.sketches import HyperLogLog

    rng = np.random.default_rng(11)
    keys = rng.integers(-2**62, 2**62, 200_000, dtype=np.int64)
    n_true = len(np.unique(keys))

    whole = HyperLogLog(12).add(keys)
    chunked = HyperLogLog(12)
    for lo in range(0, len(keys), 7_001):
        chunked.merge(HyperLogLog(12).add(keys[lo:lo + 7_001]))
    assert np.array_equal(whole.registers, chunked.registers)
    assert abs(whole.estimate() - n_true) / n_true < 0.05

    # linear-counting regime (small cardinality)
    small = HyperLogLog(12).add(np.arange(300, dtype=np.int64))
    assert abs(small.estimate() - 300) / 300 < 0.05


def test_hll_rank_clz_exact_vs_python():
    """The float64-exponent CLZ (with the power-of-two clamp) equals
    Python's exact bit_length on adversarial values: exact powers of
    two, 2^k±1, and all-ones suffixes."""
    from darc_ray.functions.sketches import HyperLogLog

    p = 12
    vals = []
    for k in range(p, 64):
        vals += [1 << k, (1 << k) - 1, (1 << k) + 1]
    vals = np.array([v & ((1 << 64) - 1) for v in vals], dtype=np.uint64)
    h = HyperLogLog(p)
    h.add_hashes(vals)
    # recompute expected registers exactly with Python ints
    exp = np.zeros(h.m, dtype=np.uint8)
    for v in vals.tolist():
        idx = v >> (64 - p)
        rest = ((v << p) | ((1 << p) - 1)) & ((1 << 64) - 1)
        rank = 64 - rest.bit_length() + 1
        exp[idx] = max(exp[idx], rank)
    assert np.array_equal(h.registers, exp)


def test_md5_hash64_matches_duckdb_prefix():
    """md5_hash64 == DuckDB's ('0x' || substr(md5(key::VARCHAR),1,16))
    — the contract the hll_distinct oracle relies on."""
    import duckdb

    from darc_ray.functions.sketches import md5_hash64

    keys = np.array([0, 1, -1, 42, 123456789, -987654321], dtype=np.int64)
    ours = md5_hash64(keys)
    sql = duckdb.sql(
        "SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 16))::UBIGINT "
        "FROM (SELECT unnest(?::BIGINT[]) AS k)",
        params=[keys.tolist()]).fetchall()
    assert [int(x) for x in ours] == [int(r[0]) for r in sql]


def test_cms_merge_and_overestimate_bound():
    """Chunked add+merge == one-shot (mergeability), every point
    estimate >= the true count (CMS never underestimates), and error
    is bounded by eN with e = e/width over a zipfy stream."""
    from darc_ray.functions.sketches import CountMinSketch

    rng = np.random.default_rng(5)
    stream = rng.zipf(1.3, 50_000)
    stream = stream[stream < 10_000].astype(np.int64)
    keys, counts = np.unique(stream, return_counts=True)

    whole = CountMinSketch().add_counts(keys, counts)
    chunked = CountMinSketch()
    for lo in range(0, len(keys), 997):
        chunked.merge(CountMinSketch().add_counts(keys[lo:lo + 997],
                                                  counts[lo:lo + 997]))
    assert np.array_equal(whole.table, chunked.table)

    est = whole.query(keys)
    assert (est >= counts).all()
    # every row's counters sum to N, so est - true <= N always; the
    # probabilistic bound e*N/width holds for most keys
    n = counts.sum()
    assert np.median(est - counts) <= np.e * n / 256
