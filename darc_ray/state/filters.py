"""Approximate membership filters: cuckoo (primary) and bloom (fallback).

Role in the engine (SURVEY §1.2, north star): the URL-seen fast path.
A filter answers "definitely new?" cheaply; a *maybe seen* answer is
confirmed against the exact per-shard store, because false positives
would silently drop URLs and break seen-set equality with the
reference (SURVEY §7.4).  False negatives are impossible by
construction (every inserted key is either in the table or the filter
has degraded to all-positive).

At test scale the exact store is an in-memory dict; the filter is what
makes the design hold at 10^10 URLs where the exact store is a
disk-backed per-shard table and the filter is the only thing consulted
per candidate in the common case.
"""

from __future__ import annotations

import hashlib

import numpy as np


class CuckooFilter:
    """4-way bucketized cuckoo filter with 16-bit fingerprints.

    ~98%+ load factor is not attempted; we size generously (bits are
    cheap: 2 bytes/key ≈ 20 GB per 10^10 keys across all shards).  On
    insert failure after max kicks the filter degrades to
    all-positive (``overflowed``) — the safe direction.
    """

    def __init__(self, capacity: int, seed: int = 0) -> None:
        n_buckets = max(8, int(capacity / 4 * 1.25))
        # round up to power of two for cheap masking
        self.n_buckets = 1 << (n_buckets - 1).bit_length()
        self.table = np.zeros((self.n_buckets, 4), dtype=np.uint16)
        self.seed = seed
        self.count = 0
        self.overflowed = False
        self._mask = self.n_buckets - 1

    def _fp_index(self, key: bytes) -> tuple[int, int]:
        d = hashlib.blake2b(key, digest_size=8, salt=self.seed.to_bytes(4, "big") + b"ckoo").digest()
        fp = (int.from_bytes(d[:2], "big") % 65535) + 1   # 1..65535, 0 = empty
        i1 = int.from_bytes(d[2:8], "big") & self._mask
        return fp, i1

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ (fp * 0x5BD1E995)) & self._mask

    def insert(self, key: bytes) -> None:
        if self.overflowed:
            self.count += 1
            return
        fp, i1 = self._fp_index(key)
        for idx in (i1, self._alt(i1, fp)):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return
        # evict loop
        rng = np.random.default_rng((fp << 32) | i1)
        idx = i1 if rng.integers(2) else self._alt(i1, fp)
        cur_fp = fp
        for _ in range(500):
            slot = int(rng.integers(4))
            cur_fp, self.table[idx][slot] = int(self.table[idx][slot]), cur_fp
            idx = self._alt(idx, cur_fp)
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur_fp
                self.count += 1
                return
        self.overflowed = True      # degrade: contains() now always True
        self.count += 1

    def contains(self, key: bytes) -> bool:
        if self.overflowed:
            return True
        fp, i1 = self._fp_index(key)
        if (self.table[i1] == fp).any():
            return True
        return bool((self.table[self._alt(i1, fp)] == fp).any())

    def contains_batch(self, keys: list[bytes]) -> np.ndarray:
        out = np.empty(len(keys), dtype=bool)
        for i, k in enumerate(keys):
            out[i] = self.contains(k)
        return out


class BloomFilter:
    """Plain k-hash bloom filter fallback (no deletion — fine for the
    ever-seen role)."""

    def __init__(self, capacity: int, fp_rate: float = 0.01, seed: int = 0) -> None:
        import math

        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = 1 << (m - 1).bit_length()
        self.k = max(1, round(m / max(1, capacity) * math.log(2)))
        self.bits = np.zeros(self.m // 8, dtype=np.uint8)
        self.seed = seed
        self.count = 0

    def _positions(self, key: bytes) -> np.ndarray:
        d = hashlib.blake2b(key, digest_size=16,
                            salt=self.seed.to_bytes(4, "big") + b"blum").digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        return np.array([(h1 + i * h2) % self.m for i in range(self.k)], dtype=np.int64)

    def insert(self, key: bytes) -> None:
        pos = self._positions(key)
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.count += 1

    def contains(self, key: bytes) -> bool:
        pos = self._positions(key)
        return bool(np.all(self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)))

    def contains_batch(self, keys: list[bytes]) -> np.ndarray:
        out = np.empty(len(keys), dtype=bool)
        for i, k in enumerate(keys):
            out[i] = self.contains(k)
        return out
