"""URL-seen membership structures: bloom pre-filter + cuckoo filter + exact mode.

The reference's seen set is a single Redis set with exact string membership
(`/root/reference/worker/src/rmqredis.rs:267-290`, SADD at
`proxy/src/main.rs:222-237`). At 10^10-URL scale an exact set is ~1 TB of
strings, so the scale path keeps membership per shard as:

- a **bloom pre-filter** (numpy bitset, k derived hashes): "definitely new"
  answers skip the cuckoo probe entirely — the common case on a growing crawl;
- a **cuckoo filter** (2-choice, 4-slot buckets, 16-bit fingerprints, power-of
  -two buckets, ~2.25 bytes/URL at 95% load): compact membership with a small,
  *measured* false-positive rate. A false positive silently drops a URL, so
  a URL is only declared "seen" when BOTH structures say seen — the combined
  fp rate is the product of the two.
- an **overflow dict** absorbs cuckoo insert failures, preserving the
  no-false-negatives invariant unconditionally.

Exact mode (a Python set of canonical URL strings) reproduces Redis semantics
bit-for-bit and is what the oracle-parity tests run against; approx mode is
the 10^10-scale path with capacity/fp knobs.

Unlike the reference — where the seen set is populated *asynchronously* via a
RabbitMQ queue and a proxy process, so concurrent workers race and fetch
duplicates (`SURVEY.md §3.4`) — ``check_and_insert`` here is atomic per shard.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1


def _mix(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return h ^ (h >> np.uint64(33))


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        ln2 = float(np.log(2.0))
        m = max(64, int(np.ceil(-capacity * np.log(fp_rate) / (ln2 * ln2))))
        self.m = int(m)
        self.k = max(1, int(round(self.m / max(capacity, 1) * ln2)))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        h1 = np.asarray(hashes, dtype=np.uint64)
        h2 = _mix(h1) | np.uint64(1)
        idx = np.empty((self.k, len(h1)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
        return idx

    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx = self._indices(hashes).ravel()
        np.bitwise_or.at(
            self.bits, (idx >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (idx & np.uint64(63)),
        )

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(hashes)
        word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def nbytes(self) -> int:
        return self.bits.nbytes


class CuckooFilter:
    """2-choice cuckoo filter: power-of-two buckets × 4 slots × uint16 fp."""

    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0x5EED):
        nbuckets = 1
        while nbuckets * 4 * 0.95 < capacity:
            nbuckets <<= 1
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.table = np.zeros((nbuckets, 4), dtype=np.uint16)
        # homeless (bucket_idx, fingerprint) pairs after a failed kick chain;
        # a member's two candidate buckets are closed under the xor alternation,
        # so checking (i1, fp) / (i2, fp) against this set keeps lookups exact.
        self.overflow: set[tuple[int, int]] = set()
        self.count = 0
        self._rng = np.random.Generator(np.random.PCG64(seed))

    def _fp_idx(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        h = np.asarray(hashes, dtype=np.uint64)
        fp = ((h >> np.uint64(48)) % np.uint64(0xFFFF) + np.uint64(1)).astype(np.uint16)
        i1 = (h & self.mask).astype(np.uint64)
        i2 = (i1 ^ _mix(fp.astype(np.uint64))) & self.mask
        return fp, i1, i2

    def _alt(self, i: int, fp: int) -> int:
        return int((np.uint64(i) ^ _mix(np.array([fp], dtype=np.uint64))[0]) & self.mask)

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_idx(hashes)
        b1 = self.table[i1.astype(np.int64)]
        b2 = self.table[i2.astype(np.int64)]
        hit = (b1 == fp[:, None]).any(axis=1) | (b2 == fp[:, None]).any(axis=1)
        if self.overflow:
            for j in np.nonzero(~hit)[0]:
                f = int(fp[j])
                if (int(i1[j]), f) in self.overflow or (int(i2[j]), f) in self.overflow:
                    hit[j] = True
        return hit

    def add_many(self, hashes: np.ndarray) -> None:
        fp, i1, i2 = self._fp_idx(hashes)
        tbl = self.table
        for j in range(len(hashes)):
            f = int(fp[j])
            a, b = int(i1[j]), int(i2[j])
            placed = False
            for idx in (a, b):
                row = tbl[idx]
                empt = np.nonzero(row == 0)[0]
                if len(empt):
                    row[empt[0]] = f
                    placed = True
                    break
            if not placed:
                cur_i, cur_f = a, f
                for _ in range(self.MAX_KICKS):
                    slot = int(self._rng.integers(0, 4))
                    cur_f, tbl[cur_i, slot] = int(tbl[cur_i, slot]), cur_f
                    cur_i = self._alt(cur_i, cur_f)
                    row = tbl[cur_i]
                    empt = np.nonzero(row == 0)[0]
                    if len(empt):
                        row[empt[0]] = cur_f
                        placed = True
                        break
                if not placed:
                    self.overflow.add((cur_i, cur_f))
            self.count += 1

    def nbytes(self) -> int:
        return self.table.nbytes + 8 * len(self.overflow)


class SeenSet:
    """Shard-local seen set. mode='exact' (Redis-parity, test path) or
    mode='approx' (bloom + cuckoo, 10^10-scale path)."""

    def __init__(self, mode: str = "exact", capacity: int = 1 << 20,
                 bloom_fp: float = 0.01):
        self.mode = mode
        if mode == "exact":
            self._set: set[str] = set()
        else:
            self.bloom = BloomFilter(capacity, bloom_fp)
            self.cuckoo = CuckooFilter(capacity)

    def check_and_insert(self, urls: list[str], hashes: np.ndarray) -> np.ndarray:
        """Boolean mask of rows that are NEW (inserted now, atomically)."""
        n = len(urls)
        new = np.zeros(n, dtype=bool)
        if self.mode == "exact":
            s = self._set
            for i, u in enumerate(urls):
                if u not in s:
                    s.add(u)
                    new[i] = True
            return new
        h = np.asarray(hashes, dtype=np.uint64)
        in_bloom = self.bloom.contains_many(h)
        maybe = np.nonzero(in_bloom)[0]
        seen = np.zeros(n, dtype=bool)
        if len(maybe):
            seen[maybe] = self.cuckoo.contains_many(h[maybe])
        new = ~seen
        idx = np.nonzero(new)[0]
        if len(idx):
            self.bloom.add_many(h[idx])
            self.cuckoo.add_many(h[idx])
        return new

    def __len__(self) -> int:
        return len(self._set) if self.mode == "exact" else self.cuckoo.count

    def nbytes(self) -> int:
        if self.mode == "exact":
            return sum(len(u) for u in self._set) + 60 * len(self._set)
        return self.bloom.nbytes() + self.cuckoo.nbytes()

    # -- checkpoint ---------------------------------------------------------
    def state_dict(self) -> dict:
        if self.mode == "exact":
            return {"mode": "exact", "urls": sorted(self._set)}
        return {
            "mode": "approx",
            "bloom_bits": self.bloom.bits,
            "bloom_m": self.bloom.m,
            "bloom_k": self.bloom.k,
            "cuckoo_table": self.cuckoo.table,
            "overflow": np.array(sorted(self.cuckoo.overflow), dtype=np.int64).reshape(-1, 2),
            "count": self.cuckoo.count,
        }

    def load_state_dict(self, st: dict) -> None:
        if st["mode"] == "exact":
            self.mode = "exact"
            self._set = set(st["urls"])
            return
        if not hasattr(self, "bloom"):
            # instance was constructed in exact mode: build the filters lazily
            # — their geometry is entirely rebuilt from the restored arrays
            # below, so the constructor capacity is irrelevant
            self.bloom = BloomFilter(1 << 10, 0.01)
            self.cuckoo = CuckooFilter(1 << 10)
        self.mode = "approx"
        self.bloom.bits = np.asarray(st["bloom_bits"], dtype=np.uint64)
        self.bloom.m = int(st["bloom_m"])
        self.bloom.k = int(st["bloom_k"])
        self.cuckoo.table = np.asarray(st["cuckoo_table"], dtype=np.uint16)
        # rebuild the bucket geometry from the restored table — a capacity
        # mismatch between checkpoint and current config would otherwise leave
        # a stale mask that can't reach half the table (false negatives)
        self.cuckoo.nbuckets = self.cuckoo.table.shape[0]
        self.cuckoo.mask = np.uint64(self.cuckoo.nbuckets - 1)
        self.cuckoo.overflow = {
            (int(a), int(b)) for a, b in np.asarray(st["overflow"]).reshape(-1, 2)
        }
        self.cuckoo.count = int(st["count"])
