"""Seen-set structures: no-false-negatives (hard invariant — a false negative
duplicates a fetch; a false positive silently drops a URL, so we also measure
the fp rate), exact-mode Redis parity, checkpoint round-trips."""

import numpy as np

from scraper_ray.functions.hashing import hash64_batch
from scraper_ray.state.seen import BloomFilter, CuckooFilter, SeenSet


def _hashes(n, tag=""):
    return hash64_batch([f"http://h{i % 97}.test/{tag}/{i}" for i in range(n)])


def test_bloom_no_false_negatives():
    h = _hashes(20_000)
    bf = BloomFilter(20_000, 0.01)
    bf.add_many(h)
    assert bf.contains_many(h).all()


def test_bloom_fp_rate_bounded():
    h = _hashes(20_000)
    bf = BloomFilter(20_000, 0.01)
    bf.add_many(h)
    other = _hashes(20_000, "other")
    fp = bf.contains_many(other).mean()
    assert fp < 0.03, fp


def test_cuckoo_no_false_negatives_and_fp():
    h = _hashes(50_000)
    cf = CuckooFilter(50_000)
    cf.add_many(h)
    assert cf.contains_many(h).all()
    other = _hashes(50_000, "other")
    fp = cf.contains_many(other).mean()
    assert fp < 0.01, fp  # 16-bit fingerprints → ~2^-13 per probe pair


def test_cuckoo_overflow_preserves_membership():
    # overfill far past capacity: inserts must never be forgotten
    n = 4000
    h = _hashes(n)
    cf = CuckooFilter(1000)  # deliberately undersized
    cf.add_many(h)
    assert cf.contains_many(h).all()


def test_seen_exact_semantics():
    s = SeenSet("exact")
    urls = ["http://a.test/", "http://b.test/", "http://a.test/"]
    h = hash64_batch(urls)
    new = s.check_and_insert(urls, h)
    assert new.tolist() == [True, True, False]
    again = s.check_and_insert(urls, h)
    assert again.tolist() == [False, False, False]
    assert len(s) == 2


def test_seen_approx_combined():
    s = SeenSet("approx", capacity=10_000)
    urls = [f"http://h{i % 13}.test/p/{i}" for i in range(5000)]
    h = hash64_batch(urls)
    new = s.check_and_insert(urls, h)
    assert new.all()
    rep = s.check_and_insert(urls, h)
    assert not rep.any()


def test_seen_state_roundtrip_exact_and_approx():
    for mode in ("exact", "approx"):
        s = SeenSet(mode, capacity=10_000)
        urls = [f"http://x{i}.test/" for i in range(1000)]
        h = hash64_batch(urls)
        s.check_and_insert(urls, h)
        st = s.state_dict()
        s2 = SeenSet(mode, capacity=10_000)
        s2.load_state_dict(st)
        rep = s2.check_and_insert(urls, h)
        assert not rep.any(), mode


def test_seen_state_load_across_modes():
    """An approx-mode state dict restores onto an exact-constructed instance
    (filters built lazily; geometry comes from the restored arrays)."""
    s = SeenSet("approx", capacity=10_000)
    urls = [f"http://x{i}.test/" for i in range(500)]
    h = hash64_batch(urls)
    s.check_and_insert(urls, h)
    s2 = SeenSet("exact", capacity=10_000)
    s2.load_state_dict(s.state_dict())
    assert s2.mode == "approx"
    assert not s2.check_and_insert(urls, h).any()
