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


# -- cold-frontier fence tests (drain-surviving spill tier) ------------------

import pyarrow as pa


def _finsert(sh, rows):
    """frontier_insert with explicit (url, host, priority) rows."""
    sh.frontier_insert(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "host": pa.array([r[1] for r in rows], pa.string()),
        "priority": pa.array([r[2] for r in rows], pa.float32()),
        "depth": pa.array([0] * len(rows), pa.int32()),
    }))


def test_drain_skips_cold_spill_when_fence_is_beaten(tmp_path):
    """A drain whose per-host in-memory top-k strictly outranks the spill
    fence must release the identical rows WITHOUT touching the spill files
    — the cold tier survives the drain (zero unspill I/O)."""
    sh = StateShard(0, 1, rate=2, burst=2, spill_threshold=1 << 40,
                    spill_dir=str(tmp_path / "s"))
    _finsert(sh, [(f"http://a.test/cold{i}", "a.test", 0.01 * i)
                  for i in range(10)])
    sh._spill()  # cold half (lowest 5 priorities) goes to parquet
    assert sh._spill_files and sh._spilled_rows == 5
    fence = sh._spill_fence["a.test"]
    _finsert(sh, [(f"http://a.test/hot{i}", "a.test", 0.9 + 0.01 * i)
                  for i in range(5)])
    t = sh.drain()
    assert t["url"].to_pylist() == ["http://a.test/hot4", "http://a.test/hot3"]
    assert sh.unspill_events == 0          # the drain did NOT unspill
    assert sh._spill_files                 # cold tier intact
    assert sh._spill_fence["a.test"] == fence
    # keep draining: once the above-fence rows run out the fence check
    # fails and the cold rows fold back in — nothing is ever starved
    got = []
    for _ in range(20):
        t = sh.drain()
        if t.num_rows == 0 and sh.frontier_size() == 0:
            break
        got.extend(t["url"].to_pylist())
    assert sh.frontier_size() == 0
    assert len(got) == 13 and sh.unspill_events >= 1


def test_fence_drains_match_always_unspill_reference(tmp_path):
    """Wave-by-wave byte-equality between a shard that spills (with fence
    ties across the memory/spill boundary — the case that forces the
    strict-inequality check) and a never-spilled reference."""
    rows = []
    for i in range(12):
        rows.append((f"http://a.test/x{i}", "a.test", 0.5))   # all tied
    for i in range(8):
        rows.append((f"http://b.test/y{i}", "b.test", 0.1 * (i % 4)))
    ref = StateShard(0, 1, rate=3, burst=3)
    spl = StateShard(0, 1, rate=3, burst=3, spill_threshold=1 << 40,
                     spill_dir=str(tmp_path / "s"))
    _finsert(ref, rows)
    _finsert(spl, rows)
    spl._spill()
    for wave in range(10):
        a, b = ref.drain(), spl.drain()
        assert a.equals(b), f"wave {wave} diverged"
        if wave == 3:  # re-spill mid-stream: fences must recompute
            spl._spill()
    assert ref.frontier_size() == spl.frontier_size() == 0


def test_fence_unspill_rewrites_only_needed_hosts(tmp_path):
    """Selective unspill folds back only the hosts whose fence failed and
    rewrites the remainder — other hosts' cold rows stay spilled."""
    sh = StateShard(0, 1, rate=2, burst=2, spill_threshold=1 << 40,
                    spill_dir=str(tmp_path / "s"))
    _finsert(sh, [(f"http://a.test/a{i}", "a.test", 0.01 * i)
                  for i in range(6)])
    _finsert(sh, [(f"http://b.test/b{i}", "b.test", 0.01 * i)
                  for i in range(6)])
    sh._spill()
    # host a gets fresh hot rows (fence beaten); host b does not, so b's
    # heap (3 in-memory rows, k=2, top-2 prio > its own fence...) — force
    # b's fence to fail by draining its memory rows down first
    _finsert(sh, [(f"http://a.test/hot{i}", "a.test", 1.0 + 0.01 * i)
                  for i in range(4)])
    sh.drain()  # b releases its top-2 memory rows; 1 memory row left < k=2
    assert sh.unspill_events == 0
    t = sh.drain()  # now b must unspill; a still has hot rows above fence
    assert sh.unspill_events == 1
    assert "b.test" not in sh._spill_fence     # b folded back in
    assert "a.test" in sh._spill_fence         # a's cold tier survived
    assert sh._spill_files                      # rewritten remainder exists
    hosts_left = set()
    import pyarrow.parquet as pq_
    for f in sh._spill_files:
        hosts_left |= set(pq_.read_table(f)["host"].to_pylist())
    assert hosts_left == {"a.test"}
    assert t.num_rows > 0


def test_checkpoint_preserves_cold_tier(tmp_path):
    """A checkpoint must snapshot spilled rows WITHOUT folding them into
    memory (per-round checkpoints would otherwise destroy the
    drain-surviving cold tier every round), and restore must reproduce the
    exact frontier."""
    sh = StateShard(0, 1, rate=2, burst=2, spill_threshold=1 << 40,
                    spill_dir=str(tmp_path / "s"))
    _finsert(sh, [(f"http://a.test/c{i}", "a.test", 0.01 * i)
                  for i in range(10)])
    sh._spill()
    files_before = list(sh._spill_files)
    d = str(tmp_path / "ckpt")
    sh.checkpoint(d)
    # spill state untouched by the snapshot
    assert sh._spill_files == files_before
    assert sh._spilled_rows == 5 and "a.test" in sh._spill_fence
    # restore rebuilds the FULL frontier (memory + cold rows)
    sh2 = StateShard(0, 1, rate=2, burst=2)
    sh2.restore(d)
    assert sh2.frontier_size() == 10
    got = []
    for _ in range(10):
        t = sh2.drain()
        if t.num_rows == 0:
            break
        got.extend(t["url"].to_pylist())
    ref = []
    for _ in range(10):
        t = sh.drain()
        if t.num_rows == 0 and sh.frontier_size() == 0:
            break
        ref.extend(t["url"].to_pylist())
    assert got == ref


def test_fence_fuzz_matches_always_unspill_reference(tmp_path):
    """Property fuzz: random inserts (ties included), random spill points,
    random rates — the fence-gated spilling shard must drain wave-for-wave
    byte-identically to a never-spilled reference until both are empty."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    counter = itertools.count()

    @settings(deadline=None, max_examples=40)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 2),            # host index
                      st.integers(0, 15)),          # priority (16ths: f32-exact)
            min_size=1, max_size=40),
        spill_waves=st.sets(st.integers(0, 6)),
        rate=st.integers(1, 4),
    )
    def run(rows, spill_waves, rate):
        case = next(counter)
        ref = StateShard(0, 1, rate=rate, burst=rate)
        spl = StateShard(0, 1, rate=rate, burst=rate,
                         spill_threshold=1 << 40,
                         spill_dir=str(tmp_path / f"s{case}"))
        finsert_rows = [
            (f"http://h{h}.test/u{i}", f"h{h}.test", p / 16.0)
            for i, (h, p) in enumerate(rows)
        ]
        _finsert(ref, finsert_rows)
        _finsert(spl, finsert_rows)
        for wave in range(8):
            if wave in spill_waves:
                spl._spill()
            a, b = ref.drain(), spl.drain()
            assert a.equals(b), f"case {case} wave {wave}"
            if ref.frontier_size() == 0 and spl.frontier_size() == 0:
                break
        assert ref.frontier_size() == spl.frontier_size()

    run()


def test_restore_into_previously_spilled_shard_clears_spill_state(tmp_path):
    """restore() on a shard instance that has spilled must drop the stale
    spill registrations: the checkpoint snapshot already contains those rows
    (memory + spill files concatenated), so keeping them would double-count
    frontier_size and fold duplicates back in on a later fence-failing
    drain (ADVICE round 3)."""
    import os

    sh = StateShard(0, 1, rate=100, burst=100, spill_threshold=1 << 40,
                    spill_dir=str(tmp_path / "spill"))
    urls = [f"http://a.test/p/{i}" for i in range(40)]
    _insert(sh, urls, ["a.test"] * 40)
    sh._spill()
    assert sh._spill_files and sh._spilled_rows > 0
    old_files = list(sh._spill_files)
    d = str(tmp_path / "ckpt")
    sh.checkpoint(d)  # snapshot contains memory + spilled rows
    sh.restore(d)  # restore into the SAME (previously-spilled) instance
    assert sh._spill_files == [] and sh._spilled_rows == 0
    assert sh._spill_fence == {}
    assert all(not os.path.exists(p) for p in old_files)  # orphans deleted
    assert sh.frontier_size() == 40  # not double-counted
    got = []
    for _ in range(10):
        t = sh.drain()
        if t.num_rows == 0:
            break
        got.extend(t["url"].to_pylist())
    assert sorted(got) == sorted(urls)  # no duplicate frontier URLs
