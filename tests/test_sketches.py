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
