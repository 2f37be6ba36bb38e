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
