"""StateShard unit tests (driven in-process — the actor wrapper adds nothing
semantically): atomic anti-join, politeness-budgeted deterministic drain,
spill/unspill, checkpoint/restore."""

import numpy as np

from scraper_ray.functions.hashing import hash64_batch, priority_of
from scraper_ray.state.shard import StateShard


def _insert(sh, urls, hosts, depth=0):
    h = hash64_batch(urls)
    p = priority_of(h)
    return sh.check_and_insert(urls, hosts, h, p, [depth] * len(urls))


def test_check_and_insert_dedup_within_call_and_across():
    sh = StateShard(0, 1)
    r = _insert(sh, ["http://a.test/", "http://a.test/", "http://b.test/"],
                ["a.test", "a.test", "b.test"])
    assert r["submitted"] == 2
    r2 = _insert(sh, ["http://a.test/", "http://c.test/"], ["a.test", "c.test"])
    assert r2["submitted"] == 1
    assert sh.frontier_size() == 3


def test_drain_priority_order_and_politeness():
    sh = StateShard(0, 1, rate=2.0, burst=2.0)
    urls = [f"http://a.test/p/{i}" for i in range(10)]
    _insert(sh, urls, ["a.test"] * 10)
    t1 = sh.drain()
    assert t1.num_rows == 2  # politeness: 2 per host per wave
    prios = t1["priority"].to_pylist()
    assert prios == sorted(prios, reverse=True)
    # drained rows are the global top-2 priorities of that host
    all_p = sorted(priority_of(hash64_batch(urls)).tolist(), reverse=True)
    assert np.allclose(sorted(prios, reverse=True), all_p[:2])
    t2 = sh.drain()
    assert t2.num_rows == 2
    assert set(t2["url"].to_pylist()).isdisjoint(set(t1["url"].to_pylist()))


def test_drain_multi_host_canonical_sort():
    sh = StateShard(0, 1, rate=5, burst=5)
    urls = [f"http://{h}.test/x{i}" for h in ("b", "a") for i in range(3)]
    hosts = [u.split("//")[1].split("/")[0] for u in urls]
    _insert(sh, urls, hosts)
    t = sh.drain()
    rows = list(zip(t["priority"].to_pylist(), t["host"].to_pylist(),
                    t["url"].to_pylist()))
    assert rows == sorted(rows, key=lambda r: (-r[0], r[1], r[2]))


def test_spill_and_unspill(tmp_path):
    sh = StateShard(0, 1, rate=100, burst=100, spill_threshold=50,
                    spill_dir=str(tmp_path / "spill"))
    urls = [f"http://a.test/p/{i}" for i in range(120)]
    _insert(sh, urls, ["a.test"] * 120)
    assert sh._spilled_rows > 0
    assert sh.frontier_size() == 120
    got = []
    for _ in range(10):
        t = sh.drain()
        if t.num_rows == 0 and sh.frontier_size() == 0:
            break
        got.extend(t["url"].to_pylist())
    assert sorted(got) == sorted(urls)


def test_checkpoint_restore_roundtrip(tmp_path):
    for mode in ("exact", "approx"):
        sh = StateShard(3, 8, seen_mode=mode, rate=1, burst=1)
        urls = [f"http://h{i % 5}.test/p/{i}" for i in range(50)]
        hosts = [f"h{i % 5}.test" for i in range(50)]
        _insert(sh, urls, hosts)
        sh.drain()
        d = str(tmp_path / mode)
        sh.checkpoint(d)
        sh2 = StateShard(3, 8, seen_mode=mode, rate=1, burst=1)
        sh2.restore(d)
        assert sh2.frontier_size() == sh.frontier_size()
        assert sh2.tokens == sh.tokens
        # previously seen URLs must stay culled after restore
        r = _insert(sh2, urls[:10], hosts[:10])
        assert r["submitted"] == 0
        # both drain identically from here
        a, b = sh.drain(), sh2.drain()
        assert a.equals(b)
