"""Hash kernels: canonical URL identity + layout partitioning.

The canonical URL key is the sha256 hex digest of the url string,
matching the reference (``/root/reference/darc/link.py:394``).  The
frontier partition id is derived from the leading 8 hex chars of that
digest — stable, uniform, and free once the digest exists.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Sequence

import numpy as np


def sha256_hex(urls: Iterable[str]) -> list[str]:
    """sha256 hexdigest per url (darc/link.py:394 semantics)."""
    h = hashlib.sha256
    return [h(u.encode("utf-8", "surrogatepass")).hexdigest() for u in urls]


def partition_of(url_hashes: Sequence[str], num_partitions: int) -> np.ndarray:
    """Partition id = int(hash_hex[:8], 16) % P, as int32."""
    out = np.empty(len(url_hashes), dtype=np.int32)
    for i, hh in enumerate(url_hashes):
        out[i] = int(hh[:8], 16) % num_partitions
    return out


def shard_of(url_hashes: Sequence[str], num_shards: int) -> np.ndarray:
    """Seen-set shard id — distinct hex span from :func:`partition_of`
    so shard and partition skew are independent."""
    out = np.empty(len(url_hashes), dtype=np.int32)
    for i, hh in enumerate(url_hashes):
        out[i] = int(hh[8:16], 16) % num_shards
    return out


def host_shard_of(hosts: Sequence[str | None], num_shards: int) -> np.ndarray:
    """Host-state shard id from a stable (non-PYTHONHASHSEED) host hash."""
    out = np.empty(len(hosts), dtype=np.int32)
    for i, h in enumerate(hosts):
        if h is None:
            out[i] = 0
        else:
            d = hashlib.blake2b(h.encode("utf-8", "surrogatepass"), digest_size=8).digest()
            out[i] = int.from_bytes(d, "big") % num_shards
    return out


def group_indices(sid: np.ndarray, n_groups: int) -> list[np.ndarray]:
    """Vectorized routing: indices per group id (argsort + searchsorted;
    avoids n_groups × O(n) python scans)."""
    order = np.argsort(sid, kind="stable")
    bounds = np.searchsorted(sid[order], np.arange(n_groups + 1))
    return [order[bounds[g]:bounds[g + 1]] for g in range(n_groups)]


def stable_u64(values: Iterable[str]) -> np.ndarray:
    """64-bit stable content hash (blake2b-8) per string — used for
    exact text dedup and fingerprinting where sha256 width is overkill."""
    out_list = []
    for v in values:
        d = hashlib.blake2b(v.encode("utf-8", "surrogatepass"), digest_size=8).digest()
        out_list.append(int.from_bytes(d, "big"))
    return np.array(out_list, dtype=np.uint64)
