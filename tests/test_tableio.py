"""Archive fragment compaction: row preservation, key-hash layout,
resumability, config guard."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scraper_ray.functions.hashing import hash64_batch
from scraper_ray.sources.tableio import append_fragment, compact_dataset


def _mk_archive(base, rounds=4, rows_per=50):
    n = 0
    for r in range(rounds):
        hosts = [f"h{(n + i) % 7}.test" for i in range(rows_per)]
        t = pa.table({
            "url": [f"http://{h}/p{n + i}" for i, h in enumerate(hosts)],
            "host": hosts,
            "round": pa.array([r] * rows_per, pa.int32()),
            "caption": [f"cap{n + i}" for i in range(rows_per)],
        })
        append_fragment(t, os.path.join(base, f"round={r:04d}"))
        append_fragment(t.slice(0, 10), os.path.join(base, f"round={r:04d}"))
        n += rows_per
    return base


@pytest.mark.usefixtures("ray_session")
def test_compact_preserves_rows_and_is_resumable(tmp_path):
    src = _mk_archive(str(tmp_path / "archive"))
    out = str(tmp_path / "compact")
    stats = compact_dataset(src, out, num_parts=4)
    assert stats["fragments_in"] == 8
    assert stats["fragments_out"] <= 4
    assert stats["rows"] == 4 * (50 + 10)

    # content preserved exactly (url+caption multiset)
    import ray.data as rd
    orig = rd.read_parquet(src).to_pandas()
    comp = rd.read_parquet(
        [os.path.join(out, f) for f in os.listdir(out)
         if f.endswith(".parquet")]).to_pandas()
    a = orig[["url", "host", "caption"]].sort_values("url").reset_index(drop=True)
    b = comp[["url", "host", "caption"]].sort_values("url").reset_index(drop=True)
    assert a.equals(b)

    # layout: each fragment holds only its hash partition's hosts
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        part = int(f.split("=")[1].split(".")[0])
        hosts = pq.read_table(os.path.join(out, f), columns=["host"])
        pk = hash64_batch(hosts["host"].to_pylist()) % 4
        assert set(pk.tolist()) == {part}

    # resume: finished fragments are skipped (mtimes unchanged)
    mt = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    stats2 = compact_dataset(src, out, num_parts=4)
    assert stats2["rows"] == stats["rows"]
    for f, m in mt.items():
        assert os.path.getmtime(os.path.join(out, f)) == m

    # config / source guard refuses mismatched resumes
    with pytest.raises(ValueError, match="mismatch"):
        compact_dataset(src, out, num_parts=8)
    extra = pa.table({"url": ["http://h0.test/x"], "host": ["h0.test"],
                      "round": pa.array([9], pa.int32()), "caption": ["c"]})
    append_fragment(extra, os.path.join(src, "round=0009"))
    with pytest.raises(ValueError, match="mismatch"):
        compact_dataset(src, out, num_parts=4)


@pytest.mark.usefixtures("ray_session")
def test_compact_refuses_concurrent_writer_and_reclaims_stale_lock(tmp_path):
    """Single-writer guard (r4 verdict item 7): while a LIVE process holds
    compact.lock a second invocation fails loudly instead of interleaving
    fragment writes; a lock left by a dead pid is reclaimed and the run
    proceeds; the lock never survives a completed run."""
    src = _mk_archive(str(tmp_path / "archive"))
    out = str(tmp_path / "compact")
    os.makedirs(out, exist_ok=True)
    lock = os.path.join(out, "compact.lock")

    # live holder (this very process) → loud refusal, nothing written
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    with pytest.raises(RuntimeError, match="already running"):
        compact_dataset(src, out, num_parts=4)
    assert os.path.exists(lock)  # a refused run must not steal the lock
    assert not any(f.endswith(".parquet") for f in os.listdir(out))

    # stale holder (dead pid from a finished child) → reclaimed, run ok
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)
    with open(lock, "w") as f:
        f.write(str(pid))
    stats = compact_dataset(src, out, num_parts=4)
    assert stats["rows"] == 4 * (50 + 10)
    assert not os.path.exists(lock)  # released after completion
