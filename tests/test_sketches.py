"""Batch (vectorized) sketch kernels are bit-identical to the scalar paths
they replaced in the hot map_batches stages. Pure-Python."""

import numpy as np

from scraper_ray.functions.sketches import (
    MinHasher, hamming64, hamming64_batch, simhash_batch, simhash_text,
)
from scraper_ray.functions.textstats import char_ngrams, word_shingles

TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "",
    "one two",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "the quick brown fox jumps over the lazy dog again and again",  # dup
    "unicode tüxt with wörds and ümlauts everywhere tüxt wörds",
]


def test_signatures_batch_matches_scalar():
    for mk in (lambda t: word_shingles(t, 3), lambda t: char_ngrams(t, 5)):
        mh = MinHasher(num_perm=64, bands=16)
        sets = [mk(t) for t in TEXTS]
        batch = mh.signatures_batch(sets)
        for i, s in enumerate(sets):
            assert (batch[i] == mh.signature(s)).all(), (i, TEXTS[i])


def test_band_hashes_batch_matches_scalar():
    mh = MinHasher(num_perm=64, bands=16)
    sets = [word_shingles(t, 3) for t in TEXTS]
    sigs = mh.signatures_batch(sets)
    bh = mh.band_hashes_batch(sigs)
    for i in range(len(TEXTS)):
        assert (bh[i] == mh.band_hashes(sigs[i])).all(), i


def test_simhash_batch_matches_scalar():
    got = simhash_batch(TEXTS)
    exp = [simhash_text(t) for t in TEXTS]
    assert got.tolist() == exp
    # identical texts → identical simhash; hamming of dup pair is 0
    assert got[0] == got[4]
    assert hamming64(int(got[0]), int(got[4])) == 0


def test_fingerprint_batch_matches_scalar():
    from scraper_ray.functions.textstats import fingerprint, fingerprint_batch

    got = fingerprint_batch(TEXTS)
    assert got.tolist() == [fingerprint(t) for t in TEXTS]


def test_hamming64_batch_matches_scalar():
    rng = np.random.Generator(np.random.PCG64(3))
    a = rng.integers(0, 1 << 63, size=50, dtype=np.uint64)
    b = rng.integers(0, 1 << 63, size=50, dtype=np.uint64)
    got = hamming64_batch(a, b)
    assert got.tolist() == [hamming64(int(x), int(y)) for x, y in zip(a, b)]


def test_hyperloglog_accuracy_and_merge_order_independence():
    """HLL estimate within 3 standard errors at several cardinalities;
    merging partials in any order gives the identical registers."""
    import numpy as np

    from scraper_ray.functions.hashing import hash64_batch
    from scraper_ray.functions.sketches import HyperLogLog

    for n in (50, 1000, 20000):
        h = hash64_batch([f"key-{i}" for i in range(n)])
        est = HyperLogLog(12).add_hashes(h).estimate()
        se = 1.04 / (2 ** 6)  # 1.04/sqrt(2^12)
        assert abs(est - n) <= 3 * se * n + 2, (n, est)
        # split into partials, merge forward and backward
        parts = [HyperLogLog(12).add_hashes(h[i::7]) for i in range(7)]
        a = HyperLogLog(12)
        for pp in parts:
            a.merge(pp)
        b = HyperLogLog(12)
        for pp in reversed(parts):
            b.merge(pp)
        assert np.array_equal(a.registers, b.registers)
        assert abs(a.estimate() - est) < 1e-9
    # serialization roundtrip
    blob = a.to_bytes()
    assert np.array_equal(HyperLogLog.from_bytes(blob, 12).registers,
                          a.registers)
    # p mismatch between serialize and deserialize must fail loudly, not
    # produce a sketch whose register count disagrees with its p
    import pytest
    with pytest.raises(ValueError, match="register blob"):
        HyperLogLog.from_bytes(blob, 11)
    with pytest.raises(ValueError, match="register blob"):
        HyperLogLog.from_bytes(HyperLogLog(10).to_bytes(), 12)


def test_space_saving_bounds_and_heavy_hitter_containment():
    """Space-Saving invariants on a skewed stream: every key with true
    count > n/capacity is tracked; est - true <= err <= n/capacity."""
    import numpy as np

    from scraper_ray.functions.sketches import SpaceSaving

    rng = np.random.Generator(np.random.PCG64(7))
    # zipf-ish: keys 0..9 heavy, long tail 10..499
    stream = np.concatenate([
        np.repeat(np.arange(10), 200),               # 10 × 200
        rng.integers(10, 500, size=2000),            # tail
    ])
    rng.shuffle(stream)
    true = {int(k): int(c) for k, c in
            zip(*np.unique(stream, return_counts=True))}
    n = len(stream)
    cap = 32
    # feed as chunked exact partials (the map_batches shape)
    merged = SpaceSaving(cap)
    for chunk in np.array_split(stream, 13):
        k, c = np.unique(chunk, return_counts=True)
        merged.merge(SpaceSaving(cap).offer(k, c))
    bound = n / cap
    for key, est, err in merged.top(cap):
        assert err <= bound + 1e-9
        assert 0 <= est - true.get(key, 0) <= err + 1e-9, (key, est, err)
    tracked = set(merged.counts)
    for key, c in true.items():
        if c > bound:
            assert key in tracked, (key, c, bound)
