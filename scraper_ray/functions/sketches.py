"""Mergeable sketches for near-dedup at scale: MinHash (+LSH banding) and
SimHash. Pure numpy, deterministic, designed to be computed per batch inside
``map_batches`` and grouped/merged by a small ``groupby`` — never a Python
loop over the whole corpus.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64_batch


class MinHasher:
    """num_perm independent hash views over shingle hashes.

    Each "permutation" i is ``mix64(h ^ seed_i)`` with a strong 64-bit
    finalizer (splitmix64) and an independent random seed — the standard
    industrial MinHash construction (xor-seed + avalanche mix), whose min
    over a set approximates a random permutation's min. (An earlier version
    claimed a universal hash mod 2^61-1 but wrapped the multiply mod 2^64,
    which is neither — xor+mix is both honest and faster.)

    signature(doc) is a uint64[num_perm]; Jaccard(a, b) ≈ mean(sig_a == sig_b).
    ``band_hashes(sig)`` gives per-band hashes for LSH bucketing: docs sharing
    any band bucket are candidate near-duplicates.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.nbands = bands
        self.rows_per_band = num_perm // bands
        rng = np.random.Generator(np.random.PCG64(seed))
        self.seeds = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: set[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = hash64_batch(sorted(shingles))
        with np.errstate(over="ignore"):
            v = h[None, :] ^ self.seeds[:, None]  # (num_perm, n_shingles)
            v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            v = v ^ (v >> np.uint64(31))
        return v.min(axis=1)

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """uint64[bands] — hash of each band's rows (for LSH group keys)."""
        sig = sig.reshape(self.nbands, self.rows_per_band)
        with np.errstate(over="ignore"):
            out = np.full(self.nbands, 0xCBF29CE484222325, dtype=np.uint64)
            prime = np.uint64(0x100000001B3)
            for r in range(self.rows_per_band):
                out = (out ^ sig[:, r]) * prime
        return out

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())

    # -- batch (vectorized) variants — bit-identical to the scalar paths ----

    def signatures_batch(self, shingle_sets: list) -> np.ndarray:
        """uint64[(ndocs, num_perm)], row i == ``signature(shingle_sets[i])``.

        One ``hash64_batch`` over ALL documents' shingles concatenated, one
        vectorized mix, per-document min via ``np.minimum.reduceat`` — the
        per-document Python loop was the dominant sigs-stage cost (0.7ms/doc
        measured), not the hashing itself.
        """
        ndocs = len(shingle_sets)
        out = np.full((ndocs, self.num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        all_sh: list[str] = []
        offsets: list[int] = []
        doc_idx: list[int] = []
        pos = 0
        for i, s in enumerate(shingle_sets):
            if s:
                # no sort: min over the mixed hashes is order-independent
                all_sh.extend(s)
                offsets.append(pos)
                doc_idx.append(i)
                pos += len(s)
        if not all_sh:
            return out
        h = hash64_batch(all_sh)
        with np.errstate(over="ignore"):
            v = h[None, :] ^ self.seeds[:, None]  # (num_perm, total_shingles)
            v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            v = v ^ (v >> np.uint64(31))
        mins = np.minimum.reduceat(v, np.asarray(offsets), axis=1)
        out[np.asarray(doc_idx)] = mins.T
        return out

    def band_hashes_batch(self, sigs: np.ndarray) -> np.ndarray:
        """uint64[(ndocs, bands)], row i == ``band_hashes(sigs[i])``."""
        s = sigs.reshape(len(sigs), self.nbands, self.rows_per_band)
        with np.errstate(over="ignore"):
            out = np.full((len(sigs), self.nbands), 0xCBF29CE484222325,
                          dtype=np.uint64)
            prime = np.uint64(0x100000001B3)
            for r in range(self.rows_per_band):
                out = (out ^ s[:, :, r]) * prime
        return out


def simhash(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash over token hashes (optionally weighted)."""
    if len(token_hashes) == 0:
        return 0
    h = np.asarray(token_hashes, dtype=np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    w = np.ones(len(h)) if weights is None else np.asarray(weights, dtype=np.float64)
    score = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    val = np.uint64(0)
    for k in range(64):
        if score[k] > 0:
            val |= np.uint64(1) << np.uint64(k)
    return int(val)


def simhash_text(text: str) -> int:
    toks = text.lower().split()
    if not toks:
        return 0
    return simhash(hash64_batch(toks))


def simhash_batch(texts: list) -> np.ndarray:
    """uint64[ndocs], element i == ``simhash_text(texts[i])`` — one
    ``hash64_batch`` over all tokens, per-document bit-score sums via
    ``np.add.reduceat`` (the scalar path builds a bits matrix per doc)."""
    all_toks: list[str] = []
    offsets: list[int] = []
    doc_idx: list[int] = []
    pos = 0
    for i, t in enumerate(texts):
        toks = t.lower().split()
        if toks:
            all_toks.extend(toks)
            offsets.append(pos)
            doc_idx.append(i)
            pos += len(toks)
    out = np.zeros(len(texts), dtype=np.uint64)
    if not all_toks:
        return out
    h = hash64_batch(all_toks)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    score = np.add.reduceat(bits * 2 - 1, np.asarray(offsets), axis=0)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    packed = ((score > 0).astype(np.uint64) * weights).sum(
        axis=1, dtype=np.uint64)
    out[np.asarray(doc_idx)] = packed
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def hamming64_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    while True:
        nz = x != 0
        if not nz.any():
            break
        cnt[nz] += 1
        x = x & (x - np.uint64(1))
    return cnt


class HyperLogLog:
    """Mergeable distinct-count sketch (Flajolet et al. 2007, the standard
    public construction): 2^p byte registers; add = per-register max of the
    rank (leading-zero count + 1) of the hashed value's low bits; merge =
    elementwise max; estimate = bias-corrected harmonic mean with the
    small-range (linear counting) correction. Deterministic given the
    input hash set; relative standard error ≈ 1.04 / sqrt(2^p).

    Designed for the partial-aggregate pattern: one sketch per batch inside
    ``map_batches`` (registers travel as a 2^p-byte blob), merged at the
    combiner/driver — a distinct-count over 100 TB moves KBs, not keys."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = (np.zeros(self.m, dtype=np.uint8)
                          if registers is None else registers)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = np.asarray(h, dtype=np.uint64)
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = leading zeros of w within 64-p bits, + 1; w == 0 → max rank
        nbits = 64 - self.p
        rank = np.full(len(h), nbits + 1, dtype=np.uint8)
        nz = w != 0
        if nz.any():
            # leading zeros via float64 exponent trick is inexact for 64-bit;
            # use a vectorized bit-halving count instead
            x = w[nz]
            lz = np.zeros(x.shape, dtype=np.int64)
            for shift in (32, 16, 8, 4, 2, 1):
                mask = x < (np.uint64(1) << np.uint64(64 - shift))
                lz[mask] += shift
                x = np.where(mask, x << np.uint64(shift), x)
            rank_nz = np.minimum(lz + 1, nbits + 1).astype(np.uint8)
            full = np.zeros(len(h), dtype=np.uint8)
            full[nz] = rank_nz
            rank = np.where(nz, full, rank).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting, small range
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, p: int = 12) -> "HyperLogLog":
        # a p mismatch must fail loudly: merge() only asserts p equality,
        # so a blob serialized under a different p would otherwise become a
        # sketch whose register count silently disagrees with its p
        if len(blob) != 1 << p:
            raise ValueError(
                f"register blob is {len(blob)} bytes but p={p} implies "
                f"{1 << p}; was it serialized with a different p?")
        return cls(p, np.frombuffer(blob, dtype=np.uint8).copy())


class SpaceSaving:
    """Mergeable heavy-hitters summary (Metwally et al. 2005 Space-Saving):
    at most ``capacity`` tracked keys; offering a new key when full evicts
    the minimum-count key and inherits its count as the new key's
    overestimation error. Guarantees: every key with true count >
    n/capacity is tracked, and est_count - true_count <= err <= n/capacity.

    ``offer`` takes pre-aggregated (key, count) pairs — the per-batch
    partial is an exact value_counts; merge sums common keys (errors add)
    and admits the rest through the same eviction rule, preserving the
    bound (errors of merged summaries add)."""

    def __init__(self, capacity: int = 64):
        self.capacity = capacity
        self.counts: dict[int, int] = {}
        self.errors: dict[int, int] = {}

    def offer(self, keys, counts) -> "SpaceSaving":
        for k, c in sorted(zip((int(x) for x in keys),
                               (int(x) for x in counts))):
            if k in self.counts:
                self.counts[k] += c
            elif len(self.counts) < self.capacity:
                self.counts[k] = c
                self.errors[k] = 0
            else:
                mk = min(self.counts, key=lambda x: (self.counts[x], x))
                mc = self.counts.pop(mk)
                self.errors.pop(mk)  # evicted key's error dies with it
                self.counts[k] = mc + c
                self.errors[k] = mc
        return self

    def to_bytes(self) -> bytes:
        """Canonical serialization (sorted items) for in-pipeline
        transport of capacity-bounded summaries."""
        import pickle

        return pickle.dumps((self.capacity, sorted(self.counts.items()),
                             sorted(self.errors.items())))

    @classmethod
    def from_bytes(cls, blob: bytes) -> "SpaceSaving":
        import pickle

        cap, counts, errors = pickle.loads(blob)
        s = cls(cap)
        s.counts = dict(counts)
        s.errors = dict(errors)
        return s

    def _floor(self) -> int:
        """Upper bound on any UNTRACKED key's true count: the summary's min
        estimate once it has ever been full (SS invariant), else 0."""
        if len(self.counts) >= self.capacity:
            return min(self.counts.values())
        return 0

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Mergeable-summaries combine (Agarwal et al. 2012): a key
        untracked in one side is estimated at that side's floor (its true
        count there cannot exceed it), with the floor added to the error;
        then the union is truncated back to capacity by estimate. Bounds
        add: est-true ≤ err ≤ n_A/cap + n_B/cap = n/cap. (A naive
        common-keys-only merge UNDERESTIMATES keys the other side evicted
        — caught by the kernel test.)"""
        fs, fo = self._floor(), other._floor()
        union: dict[int, tuple[int, int]] = {}
        for k in set(self.counts) | set(other.counts):
            cs, co = self.counts.get(k), other.counts.get(k)
            est = (cs if cs is not None else fs) + (co if co is not None else fo)
            err = ((self.errors[k] if cs is not None else fs)
                   + (other.errors[k] if co is not None else fo))
            union[k] = (est, err)
        top = sorted(union.items(),
                     key=lambda kv: (-kv[1][0], kv[0]))[: self.capacity]
        self.counts = {k: e for k, (e, _) in top}
        self.errors = {k: r for k, (_, r) in top}
        return self

    def top(self, k: int):
        """[(key, est_count, err)] by est desc, key asc — deterministic."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(key, c, self.errors[key]) for key, c in items[:k]]
