"""Additional crawl-engine guarantees: approx-seen parity, politeness rate
bounds, errors-table routing, metrics sidecar, property-fuzzed canonicalizer."""

import os

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scraper_ray.functions.errors import ERR, OK, REJECT, outcome_of
from scraper_ray.functions.urlnorm import canonicalize
from scraper_ray.pipelines.crawl import CrawlConfig, read_archive, read_order, run_crawl
from scraper_ray.pipelines.oracle import oracle_crawl
from scraper_ray.sources.fixtures import build_images_table


def _cfg(tmp_path, **kw):
    base = dict(out_dir=str(tmp_path / "c"), num_parts=4, max_rounds=4,
                rate=2.0, burst=3.0, n_hosts=10, max_degree=6, n_images=16,
                html=False, fetch_concurrency=2, batch_size=64)
    base.update(kw)
    return CrawlConfig(**base)


@pytest.mark.usefixtures("ray_session")
def test_approx_seen_matches_exact(tmp_path):
    """The bloom+cuckoo scale path must produce the same crawl as exact mode
    (no false negatives by construction; false positives are the product of
    both structures' rates — unobservable at this scale)."""
    images = build_images_table(16)
    a = _cfg(tmp_path / "exact", seen_mode="exact")
    b = _cfg(tmp_path / "approx", seen_mode="approx", seen_capacity=1 << 16)
    ra = run_crawl(a, images)
    rb = run_crawl(b, images)
    oa, ob = read_order(a.out_dir), read_order(b.out_dir)
    key = lambda t: sorted(zip(t["round"].to_pylist(), t["rank"].to_pylist(),
                               t["url"].to_pylist()))
    assert key(oa) == key(ob)
    assert ra["pages_total"] == rb["pages_total"]
    for ma, mb in zip(ra["metrics"], rb["metrics"]):
        assert ma["submitted_links"] == mb["submitted_links"]


@pytest.mark.usefixtures("ray_session")
def test_spill_is_order_transparent(tmp_path):
    """A tiny spill threshold must not change the crawl vs the no-spill run
    (spilled low-priority rows fold back in before a host's heap runs dry)."""
    images = build_images_table(16)
    a = _cfg(tmp_path / "nospill", max_rounds=5, max_degree=8)
    b = _cfg(tmp_path / "spill", max_rounds=5, max_degree=8, spill_threshold=10)
    ra = run_crawl(a, images)
    rb = run_crawl(b, images)
    assert any(s["spill_events"] > 0 for s in rb["shard_stats"]), "spill never triggered"
    key = lambda t: sorted(zip(t["round"].to_pylist(), t["rank"].to_pylist(),
                               t["url"].to_pylist()))
    assert key(read_order(a.out_dir)) == key(read_order(b.out_dir))
    assert ra["pages_total"] == rb["pages_total"]


@pytest.mark.usefixtures("ray_session")
def test_politeness_rate_bound(tmp_path):
    """No host may be fetched more than burst times in one wave, nor more
    than k*rate + burst times over k waves (token-bucket invariant)."""
    cfg = _cfg(tmp_path, rate=2.0, burst=3.0, max_rounds=5)
    run_crawl(cfg, build_images_table(16))
    order = read_order(cfg.out_dir)
    per_round_host: dict = {}
    total_host: dict = {}
    for url, rnd in zip(order["url"].to_pylist(), order["round"].to_pylist()):
        host = url.split("/")[2]
        per_round_host[(rnd, host)] = per_round_host.get((rnd, host), 0) + 1
        total_host[host] = total_host.get(host, 0) + 1
    rounds = max(order["round"].to_pylist()) + 1
    for (rnd, host), n in per_round_host.items():
        assert n <= int(cfg.burst), (rnd, host, n)
    for host, n in total_host.items():
        assert n <= rounds * cfg.rate + cfg.burst, (host, n)


@pytest.mark.usefixtures("ray_session")
def test_max_wave_per_part_budget(tmp_path):
    """Per-part wave caps bound every wave, and token refills still reach
    hosts skipped by the budget (no starvation — all frontier URLs are
    eventually fetched once the frontier stops growing)."""
    cfg = _cfg(tmp_path, max_wave_per_part=5, max_rounds=12, max_degree=3,
               n_hosts=6, rate=2.0, burst=2.0)
    res = run_crawl(cfg, build_images_table(16))
    for m in res["metrics"]:
        assert m["wave_rows"] <= cfg.max_wave_per_part * cfg.num_parts
    order = read_order(cfg.out_dir)
    # every host that appears is served across rounds (tokens refilled even
    # when the budget cut its wave short)
    hosts = {u.split("/")[2] for u in order["url"].to_pylist()}
    assert len(hosts) >= 4


@pytest.mark.usefixtures("ray_session")
def test_errors_table_routing(tmp_path):
    """Robots-disallowed and injected network failures land in the errors
    table with the right error_kind; archive excludes them; funnel counts
    them as errors."""
    cfg = _cfg(tmp_path, fail_mod=7, max_rounds=4, robots_mod=2)
    res = run_crawl(cfg, build_images_table(16))
    assert res["errors_total"] > 0
    errors_dir = os.path.join(cfg.out_dir, "errors")
    rows = []
    for name in sorted(os.listdir(errors_dir)):
        d = os.path.join(errors_dir, name)
        for f in os.listdir(d):
            t = pq.read_table(os.path.join(d, f))
            rows.extend(zip(t["url"].to_pylist(), t["error_kind"].to_pylist()))
    assert len(rows) == res["errors_total"]
    kinds = {k for _, k in rows}
    assert kinds <= {"RobotsDisallowed", "NetworkError", "DecodeError"}
    assert "NetworkError" in kinds
    arch_urls = set(read_archive(cfg.out_dir)["url"].to_pylist())
    assert arch_urls.isdisjoint({u for u, _ in rows})
    # oracle agrees on error counts per round
    oracle = oracle_crawl(cfg, build_images_table(16))
    for got, exp in zip(res["metrics"], oracle["metrics"]):
        assert got["errors"] == exp["errors"]


@pytest.mark.usefixtures("ray_session")
def test_metrics_sidecar_written(tmp_path):
    cfg = _cfg(tmp_path, max_rounds=3)
    res = run_crawl(cfg, build_images_table(16))
    t = pq.read_table(os.path.join(cfg.out_dir, "metrics.parquet"))
    assert t.num_rows == len(res["metrics"])
    for field in ("round", "wave_rows", "receive_ms", "download_ms",
                  "extract_ms", "normalise_ms", "filter_ms", "culling_ms",
                  "archive_ms", "extracted_links", "submitted_links"):
        assert field in t.column_names, field


def test_cli_env_fallback_layering(monkeypatch, tmp_path):
    """CLI > env > default, mirroring the reference CLI's per-option
    .env(...) layering (main.rs:80-269)."""
    from scraper_ray.pipelines.crawl import parse_cli

    # default (no env, no flag)
    cfg, resume = parse_cli(["--out", str(tmp_path)])
    assert cfg.max_rounds == 8 and cfg.num_parts == 16 and not resume
    # env overrides default
    monkeypatch.setenv("SCRAPER_RAY_ROUNDS", "3")
    monkeypatch.setenv("SCRAPER_RAY_SEEN_MODE", "exact")
    monkeypatch.setenv("SCRAPER_RAY_NO_HTML", "true")
    monkeypatch.setenv("SCRAPER_RAY_OUT", str(tmp_path / "envout"))
    cfg, _ = parse_cli([])
    assert cfg.max_rounds == 3 and cfg.seen_mode == "exact"
    assert cfg.html is False
    assert cfg.out_dir == str(tmp_path / "envout")
    # explicit flag beats env
    cfg, _ = parse_cli(["--out", str(tmp_path), "--rounds", "5"])
    assert cfg.max_rounds == 5 and cfg.out_dir == str(tmp_path)
    # round-3 knobs: seen partitioning, chunk affinity, spill threshold
    monkeypatch.setenv("SCRAPER_RAY_SEEN_PARTITION", "url")
    monkeypatch.setenv("SCRAPER_RAY_CHUNK_AFFINITY", "host")
    monkeypatch.setenv("SCRAPER_RAY_SPILL_THRESHOLD", "1234")
    cfg, _ = parse_cli(["--out", str(tmp_path)])
    assert cfg.seen_partition == "url" and cfg.chunk_affinity == "host"
    assert cfg.spill_threshold == 1234
    cfg, _ = parse_cli(["--out", str(tmp_path), "--seen-partition", "host",
                        "--chunk-affinity", "balanced",
                        "--spill-threshold", "99"])
    assert cfg.seen_partition == "host" and cfg.chunk_affinity == "balanced"
    assert cfg.spill_threshold == 99


def test_error_outcome_mapping():
    assert outcome_of("") == OK
    assert outcome_of("NetworkError") == REJECT
    assert outcome_of("InvalidPage") == ERR
    assert outcome_of("RobotsDisallowed") == ERR
    assert outcome_of("SomethingNew") == ERR


# property-fuzzed canonicalizer: idempotent, never crashes, output parses
_URL_CHARS = st.text(
    alphabet="abcxyzABC019%/?#&=.:@!$'()*+,;~_- é中", max_size=40
)


@settings(max_examples=300, deadline=None)
@given(scheme=st.sampled_from(["http", "HTTP", "https", "ftp", "urn", ""]),
       host=st.text(alphabet="abcXY01.-ü�", max_size=12),
       rest=_URL_CHARS)
def test_canonicalize_fuzz_idempotent(scheme, host, rest):
    url = f"{scheme}://{host}/{rest}" if scheme else f"{host}/{rest}"
    c = canonicalize(url)
    if c is not None:
        assert canonicalize(c) == c, (url, c)


# -- end-to-end wall-clock politeness (HTTPDownloader × chunk_affinity) ------

@pytest.mark.usefixtures("ray_session")
def test_wallclock_politeness_end_to_end_host_affinity(tmp_path):
    """run_crawl × chunk_affinity='host' × HTTPDownloader: the per-actor
    WallClockTokenBucket is the GLOBAL per-host bound (each host maps to
    exactly one worker), so the observed request stream per host must obey
    requests-in-any-window <= burst + rate * window — the property
    downloader.py promises only under host affinity, now tested through
    the whole engine rather than on the class in isolation."""
    import functools

    from scraper_ray.stages.downloader import RecordingHTTPDownloader

    rec_dir = str(tmp_path / "rec")
    os.makedirs(rec_dir)
    rate, burst = 60.0, 4.0
    cfg = _cfg(tmp_path, html=True, chunk_affinity="host",
               rate=8.0, burst=8.0,          # shard-level (semantic) budget
               n_hosts=4, num_parts=4, max_rounds=3, fetch_concurrency=2,
               seeds=[f"http://h{i}.test/seed" for i in range(4)])
    res = run_crawl(cfg, build_images_table(4),
                    downloader_factory=functools.partial(
                        RecordingHTTPDownloader, rec_dir,
                        rate_per_sec=rate, burst=burst))
    assert res["pages_total"] > 8  # the link tree actually fed the crawl

    by_host: dict = {}
    host_pids: dict = {}
    for fn in os.listdir(rec_dir):
        pid = fn.split(".")[0]
        with open(os.path.join(rec_dir, fn)) as f:
            for line in f:
                host, ts = line.split("\t")
                by_host.setdefault(host, []).append(float(ts))
                host_pids.setdefault(host, set()).add(pid)
    assert by_host, "no requests recorded"
    # host affinity: every host's requests came from exactly ONE worker
    for host, pids in host_pids.items():
        assert len(pids) == 1, (host, pids)
    # token-bucket property per host over the merged wall-clock stream:
    # any i<j span of (j-i+1) requests needs at least ((j-i+1)-burst)/rate
    # seconds (epsilon for bucket float drift)
    for host, ts in by_host.items():
        ts = sorted(ts)
        n = len(ts)
        for i in range(n):
            for j in range(i + 1, n):
                max_allowed = burst + rate * (ts[j] - ts[i]) + 1.001
                assert (j - i + 1) <= max_allowed, (
                    host, i, j, ts[j] - ts[i])


# -- driver data-plane isolation ---------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_driver_never_resolves_wave_row_tables(tmp_path, monkeypatch):
    """The crawl driver must route wave-table ObjectRefs to the worker pool
    without ever ray.get-ing them (round-3 verdict item 1): at 10^6+ hosts a
    per-round pull of every shard's wave through one driver process is the
    multi-node bottleneck. We wrap ray.get IN THE DRIVER PROCESS and assert
    no resolved value is a frontier-schema row table (workers resolve in
    their own processes, unaffected by the monkeypatch)."""
    import pyarrow as pa
    import ray

    frontier_cols = {"url", "host", "priority", "depth"}
    violations = []
    real_get = ray.get

    def spy_get(obj, **kw):
        out = real_get(obj, **kw)
        vals = out if isinstance(out, list) else [out]
        for v in vals:
            if isinstance(v, pa.Table) and frontier_cols <= set(v.column_names):
                violations.append(v.column_names)
        return out

    monkeypatch.setattr(ray, "get", spy_get)
    cfg = _cfg(tmp_path, max_rounds=4)
    res = run_crawl(cfg, build_images_table(cfg.n_images))
    assert res["pages_total"] > 20  # the crawl actually ran waves
    assert violations == []
