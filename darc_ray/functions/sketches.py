"""Similarity sketches: MinHash (+LSH banding) and SimHash.

Vectorized numpy kernels; every hash is seeded/deterministic.  Used by
the near-dedup stages (``darc_ray.stages.dedup``): shingle → minhash →
band → bucket-groupby is the scale path (candidates emerge from a
``groupby`` on (band, band_hash), never an O(n²) compare)."""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(shingles: set[str]) -> np.ndarray:
    """Stable 64-bit hash per shingle."""
    if not shingles:
        return np.zeros(1, dtype=np.uint64)
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
    return out


class MinHasher:
    """n_perm permutations h_i(x) = (a_i·x + b_i) mod p (universal
    hashing over a Mersenne prime)."""

    def __init__(self, n_perm: int = 128, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm

    def signature(self, shingles: set[str]) -> np.ndarray:
        """Reference implementation via Python big ints (exact)."""
        x = [int(v) for v in _shingle_hashes(shingles)]
        sig = np.empty(self.n_perm, dtype=np.uint64)
        for i in range(self.n_perm):
            a, b = int(self.a[i]), int(self.b[i])
            sig[i] = min((a * (v % _MERSENNE) + b) % _MERSENNE for v in x)
        return sig

    def signatures(self, shingle_sets: list[set[str]]) -> np.ndarray:
        """(n_docs, n_perm) uint64; exact mod-p arithmetic vectorized
        over permutations (tested equal to :meth:`signature`)."""
        out = np.empty((len(shingle_sets), self.n_perm), dtype=np.uint64)
        for d, sh in enumerate(shingle_sets):
            out[d] = _min_perm(_shingle_hashes(sh), self.a, self.b)
        return out


_P = np.uint64(_MERSENNE)
_LO = np.uint64(0xFFFFFFFF)
_M29 = np.uint64((1 << 29) - 1)
_S32 = np.uint64(32)
_S29 = np.uint64(29)
_S61 = np.uint64(61)
_E8 = np.uint64(8)


def _min_perm(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """min over shingles of (a·x + b) mod 2^61−1, exact in uint64.

    a·x = t2·2^64 + t1·2^32 + t0 with 32-bit half products (< 2^64
    each).  Mersenne reduction uses 2^61 ≡ 1 (mod p):
    t0 ≡ (t0 & p) + (t0 >> 61); t1·2^32 ≡ (t1 >> 29) + (t1 & m29)·2^32;
    t2·2^64 ≡ 8·t2.  Each term < 2^62, sum < 2^64 — no overflow.

    Vectorized as (shingles × perms) broadcast tiles, chunked so a tile
    stays ~2M lanes; one numpy pass per chunk instead of one per
    shingle."""
    x = x % _P
    a_lo, a_hi = a & _LO, a >> _S32
    best = np.full(a.shape, np.iinfo(np.uint64).max, dtype=np.uint64)
    chunk = max(1, 2_000_000 // max(1, a.shape[0]))
    for s0 in range(0, x.shape[0], chunk):
        xv = x[s0:s0 + chunk, None]            # (S, 1) vs (P,) → (S, P)
        x_lo, x_hi = xv & _LO, xv >> _S32
        t0 = a_lo * x_lo                       # < 2^64
        t1 = a_hi * x_lo + a_lo * x_hi         # < 2^62 (each product < 2^61)
        t2 = a_hi * x_hi                       # < 2^58
        r0 = (t0 & _P) + (t0 >> _S61)
        r1 = (t1 >> _S29) + ((t1 & _M29) << _S32)
        v = (r0 % _P + r1 % _P + (t2 * _E8) % _P + b) % _P
        best = np.minimum(best, v.min(axis=0))
    return best


def lsh_bands(sig: np.ndarray, n_bands: int) -> list[tuple[int, int]]:
    """Split a signature into bands → (band_id, band_hash) keys."""
    r = sig.shape[-1] // n_bands
    out = []
    for band in range(n_bands):
        chunk = sig[band * r:(band + 1) * r]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
        out.append((band, int.from_bytes(h, "big") >> 1))
    return out


def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over word unigrams (frequency-weighted).

    Word hash = first 8 bytes of md5 (not blake2b) so the DuckDB SQL
    oracle can reproduce the value bit-for-bit (DuckDB ships md5 but no
    blake2b); bit votes are one vectorized numpy pass per document."""
    words = text.split()
    if not words:
        return 0
    hs = np.array([int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
                   for w in words], dtype=np.uint64)
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    v = int(((votes > 0).astype(np.uint64)
             << np.arange(64, dtype=np.uint64)).sum())
    return v - (1 << 64) if v >= (1 << 63) else v


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


class BloomFilter64:
    """Vectorized Bloom filter over int64 keys for broadcast semi-join
    prefiltering: build once from the small side (``ray.put`` the
    object), test whole numpy arrays per batch.  ``k`` multiply-shift
    hashes (odd 64-bit constants) into an ``m``-bit table (power of
    two).  False positives only — callers that need exactness verify
    survivors against the exact key set."""

    _MULS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
             0x27D4EB2F165667C5, 0x85EBCA6B27D4EB4F)

    def __init__(self, keys: np.ndarray, bits_per_key: int = 12, k: int = 4) -> None:
        if k > len(self._MULS):
            raise ValueError(f"k <= {len(self._MULS)}")
        m = 1 << max(6, int(np.ceil(np.log2(max(1, len(keys)) * bits_per_key))))
        self.m = m
        self.k = k
        self.table = np.zeros(m // 64, dtype=np.uint64)
        for pos in self._positions(np.asarray(keys, dtype=np.int64)):
            np.bitwise_or.at(self.table, pos >> 6,
                             np.uint64(1) << (pos & np.uint64(63)))

    def _positions(self, keys: np.ndarray):
        u = keys.view(np.uint64)
        shift = np.uint64(64 - int(np.log2(self.m)))
        for i in range(self.k):
            yield (u * np.uint64(self._MULS[i])) >> shift

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership mask (no false negatives)."""
        keys = np.asarray(keys, dtype=np.int64)
        mask = np.ones(len(keys), dtype=bool)
        for pos in self._positions(keys):
            bit = (self.table[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1)
            mask &= bit.astype(bool)
        return mask


def md5_hash64(keys: np.ndarray) -> np.ndarray:
    """uint64 hash per int64 key = first 8 bytes of md5 of the key's
    decimal string — the one 64-bit integer hash a DuckDB oracle can
    reproduce verbatim (DuckDB ships md5, not blake2b/splitmix).
    Computed once per UNIQUE key then gathered, so repeated keys
    (events ≫ users) cost one digest each."""
    uniq, inv = np.unique(np.asarray(keys, dtype=np.int64), return_inverse=True)
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(str(int(u)).encode()).digest()[:8], "big")
         for u in uniq),
        dtype=np.uint64, count=len(uniq))
    return hu[inv]


class HyperLogLog:
    """Mergeable HyperLogLog distinct-count sketch (Flajolet et al.
    2007, the standard variant with linear-counting small-range
    correction).  ``2**p`` one-byte registers; per-batch updates are
    fully vectorized (hash → register index from the top ``p`` bits,
    rank = leading-zero count of the remaining ``64-p`` bits + 1).
    Registers merge by elementwise max, so per-batch partials shuffle
    as O(groups × 2^p) bytes — never the key stream.  Standard error
    ≈ 1.04/sqrt(2^p) (~1.6 % at p=12).

    Two hash front doors: :meth:`add` (splitmix64 of int64 keys — the
    fast generic path) and :meth:`add_hashes` (caller-supplied uint64
    hashes — the DuckDB-oracle path uses md5-prefix hashes the SQL
    side reproduces).  :meth:`estimate` accumulates the harmonic sum
    as an EXACT Python integer (Σ 2^(B−r) with B = 64−p+1), so the
    result is order-independent and bit-reproducible by the SQL
    oracle's HUGEINT sum — float summation of 2^−r terms would be
    batch-order-dependent."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None) -> None:
        if not 4 <= p <= 18:
            raise ValueError("p in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (np.zeros(self.m, dtype=np.uint8) if registers is None
                          else registers.astype(np.uint8, copy=True))

    @staticmethod
    def _splitmix64(x: np.ndarray) -> np.ndarray:
        z = (x.view(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def add(self, keys: np.ndarray) -> "HyperLogLog":
        """Add int64 keys (splitmix64-hashed)."""
        if len(keys):
            self.add_hashes(self._splitmix64(np.asarray(keys, dtype=np.int64)))
        return self

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Add pre-hashed uint64 values (uniformly distributed)."""
        if not len(h):
            return self
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits, + 1;
        # vectorized CLZ via the float64 exponent.  uint64→float64
        # rounding can overshoot a power of two for values within
        # 2^-54 of it; clamp by checking the reconstructed power —
        # deterministic and branch-free
        f = np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
        over = (rest >> np.uint64(1)).astype(np.uint64) < (np.uint64(1) << np.minimum(f - 1, 63).astype(np.uint64))
        bits = 63 - np.where(over, f - 1, f)
        rank = (bits + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("incompatible p")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        """Distinct-count estimate.  The harmonic sum is computed as an
        exact integer (Σ 2^(B−r), B = 64−p+1: every term is a power of
        two ≥ 1) and the float expression mirrors the SQL oracle's
        operation order exactly — see SQL_HLL_DISTINCT."""
        import math

        b = 64 - self.p + 1
        counts = np.bincount(self.registers, minlength=b + 1)
        s = sum(int(c) << (b - r) for r, c in enumerate(counts) if c)
        m = float(self.m)
        est = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << b) / float(s)
        zeros = int(counts[0])
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)        # linear counting
        return float(est)


class CountMinSketch:
    """Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005):
    ``depth`` rows × ``width`` int64 counters; add is vectorized
    (per-row md5-prefix hash of ``"j:key"`` mod width, counts
    scatter-added), merge is elementwise sum, and a point query is the
    min over rows — an OVERestimate with error ≤ εN (ε = e/width) at
    probability 1−δ (δ = e^−depth).  Everything is integer arithmetic
    on the DuckDB-reproducible md5-prefix hash, so the sketch is
    bit-for-bit reproducible in SQL (the `cms_topk` oracle)."""

    def __init__(self, depth: int = 4, width: int = 256,
                 table: np.ndarray | None = None) -> None:
        self.depth, self.width = depth, width
        self.table = (np.zeros((depth, width), dtype=np.int64) if table is None
                      else table.astype(np.int64, copy=True))

    def _cells(self, j: int, keys: np.ndarray) -> np.ndarray:
        h = np.fromiter(
            (int.from_bytes(
                hashlib.md5(f"{j}:{int(k)}".encode()).digest()[:8], "big")
             for k in keys),
            dtype=np.uint64, count=len(keys))
        return (h % np.uint64(self.width)).astype(np.int64)

    def add_counts(self, keys: np.ndarray, counts: np.ndarray) -> "CountMinSketch":
        """Scatter-add pre-aggregated (key, count) pairs — the per-batch
        combiner path: one digest per UNIQUE key per row, never per
        event."""
        keys = np.asarray(keys, dtype=np.int64)
        counts = np.asarray(counts, dtype=np.int64)
        for j in range(self.depth):
            np.add.at(self.table[j], self._cells(j, keys), counts)
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError("incompatible sketch shape")
        self.table += other.table
        return self

    def query(self, keys: np.ndarray) -> np.ndarray:
        """Point estimates (min over rows) — exact integers."""
        keys = np.asarray(keys, dtype=np.int64)
        est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(self.depth):
            est = np.minimum(est, self.table[j][self._cells(j, keys)])
        return est
