"""64-bit string hashing, scalar and vectorized.

The hash keys the whole engine: the URL-seen set, host-based partitioning
(``part = hash64(host) % P``), deterministic priorities, and the synthetic-web
generator. FNV-1a 64 over UTF-8 bytes with a splitmix64 finalizer; the
vectorized variant iterates over byte *positions* (one numpy op per position
across the whole batch) so hashing a batch of URLs costs O(max_len) kernel
launches, not O(total_bytes) Python bytecodes.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def _splitmix_fin(h: int) -> int:
    h = (h ^ (h >> 30)) * 0xBF58476D1CE4E5B9 & _M64
    h = (h ^ (h >> 27)) * 0x94D049BB133111EB & _M64
    return h ^ (h >> 31)


def hash64(s: str) -> int:
    """FNV-1a-64 + splitmix64 finalizer of the UTF-8 bytes of ``s``."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = (h ^ b) * _FNV_PRIME & _M64
    return _splitmix_fin(h)


def hash64_batch(strings) -> np.ndarray:
    """Vectorized :func:`hash64` over a sequence of strings → uint64 array.

    Bit-identical to the scalar version. Builds a padded byte matrix and folds
    FNV-1a column by column with numpy uint64 arithmetic (wrapping multiply ==
    mod-2^64), masking out already-terminated rows.
    """
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    mat = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(bufs):
        mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    with np.errstate(over="ignore"):
        h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
        prime = np.uint64(_FNV_PRIME)
        for j in range(maxlen):
            live = lens > j
            col = mat[:, j].astype(np.uint64)
            nh = (h ^ col) * prime
            h = np.where(live, nh, h)
        # splitmix64 finalizer, vectorized
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    return h


def priority_of(url_hashes: np.ndarray) -> np.ndarray:
    """Deterministic crawl priority in [0, 1) derived from the URL hash.

    A pure function of the canonical URL so that concurrent discovery of the
    same URL can never race on its priority (see state/shard.py).
    """
    u = np.asarray(url_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        mixed = (u ^ (u >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    frac = (mixed >> np.uint64(40)).astype(np.float64) / float(1 << 24)
    return frac.astype(np.float32)


def part_of(host_hashes: np.ndarray, num_parts: int) -> np.ndarray:
    """Partition id for host-affine routing: ``hash64(host) % P``."""
    return (np.asarray(host_hashes, dtype=np.uint64) % np.uint64(num_parts)).astype(
        np.int32
    )
