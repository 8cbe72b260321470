"""Bounded transient-error requeue (the reference's *intended* Reject
semantics, `errors.rs:89-183`: network/server errors requeue — its actual
requeue flag is bugged false, `rmqredis.rs:230-251`, which remains the engine
default ``retry_limit=0``, pinned by test_crawl_parity).

With ``retry_limit=N``: a transiently-failed wave row re-enters its host
shard's frontier with retries+1 (no seen-set re-check), is re-drained under
the same politeness budget, and only lands in the errors table once its
budget is spent. Injected failures are attempt-salted
(``SynthWebDownloader._fail_salt``) so retry outcomes are deterministic per
(url, attempt) yet independent across attempts."""

import os

import pyarrow.parquet as pq
import pytest

from scraper_ray.pipelines.crawl import (
    CrawlConfig, dump_seen, read_archive, read_order, run_crawl,
)
from scraper_ray.sources.fixtures import build_images_table

FUNNEL = ["pages", "errors", "retried", "extracted_links", "normalised_links",
          "filtered_links", "culled_links", "submitted_links"]


def _cfg(out, **kw):
    base = dict(
        out_dir=str(out), num_parts=4, max_rounds=6, rate=2.0, burst=3.0,
        n_hosts=10, max_degree=6, n_images=24, html=False, fail_mod=5,
        fetch_concurrency=2, batch_size=64,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _error_rows(out_dir):
    base = os.path.join(out_dir, "errors")
    rows = []
    for name in sorted(os.listdir(base)):
        d = os.path.join(base, name)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, f))
                rows += list(zip(t["url"].to_pylist(),
                                 t["error_kind"].to_pylist()))
    return rows


@pytest.mark.usefixtures("ray_session")
def test_every_transient_failure_eventually_fetched(tmp_path):
    """With a retry budget the failure probability can't survive (fail_mod=5,
    limit=8 → P(exhaust) = 5^-9), every transiently-failed URL must be
    fetched exactly once; NetworkError disappears from the errors table."""
    cfg = _cfg(tmp_path / "c", retry_limit=8, max_rounds=10)
    res = run_crawl(cfg, build_images_table(cfg.n_images))
    assert res["retried_total"] > 0
    arch = read_archive(cfg.out_dir)
    urls = arch["url"].to_pylist()
    assert len(urls) == len(set(urls))  # fetched exactly once
    # archive = attempts - terminal errors - requeued attempts
    assert arch.num_rows == (res["pages_total"] - res["errors_total"]
                             - res["retried_total"])
    # every wave attempt appears in the canonical order table — a retried URL
    # once per attempt
    assert read_order(cfg.out_dir).num_rows == res["pages_total"]
    kinds = {k for _, k in _error_rows(cfg.out_dir)}
    assert "NetworkError" not in kinds
    # funnel monotone per round, retried counted per round
    for m in res["metrics"]:
        assert m["pages"] >= m["errors"] + m["retried"]
        assert sum(m[k] for k in ("errors", "retried")) <= m["pages"]
    assert sum(m["retried"] for m in res["metrics"]) == res["retried_total"]


@pytest.mark.usefixtures("ray_session")
def test_exhausted_retry_lands_in_errors_with_kind(tmp_path):
    """limit=1 with a harsh fail_mod: some URLs deterministically fail both
    attempts and must surface as NetworkError rows once (not per attempt)."""
    cfg = _cfg(tmp_path / "c", retry_limit=1, fail_mod=3, max_rounds=8)
    res = run_crawl(cfg, build_images_table(cfg.n_images))
    net = [u for u, k in _error_rows(cfg.out_dir) if k == "NetworkError"]
    assert len(net) > 0
    assert len(net) == len(set(net))  # one terminal row per exhausted URL
    assert res["retried_total"] >= len(net)  # each exhausted URL retried once
    arch = read_archive(cfg.out_dir)
    assert arch.num_rows == (res["pages_total"] - res["errors_total"]
                             - res["retried_total"])
    assert set(net).isdisjoint(set(arch["url"].to_pylist()))


@pytest.mark.usefixtures("ray_session")
def test_retry_parity_across_parallelism_and_modes(tmp_path):
    """Identical crawl results (order, archive, seen, funnel incl. retried)
    at different pool sizes / shard counts / seen partitioning / html mode —
    the engine determinism invariant extended to the retry path."""
    images = build_images_table(24)
    ref = _cfg(tmp_path / "ref", retry_limit=2)
    res_ref = run_crawl(ref, images)
    assert res_ref["retried_total"] > 0

    variants = [
        dict(fetch_concurrency=4, num_parts=2),
        dict(seen_partition="url"),
        dict(chunk_affinity="host"),
        dict(html=True),
    ]
    key_o = lambda t: sorted(zip(t["round"].to_pylist(), t["rank"].to_pylist(),
                                 t["url"].to_pylist()))
    rows_a = lambda t: sorted(zip(t["url"].to_pylist(), t["round"].to_pylist(),
                                  t["image_id"].to_pylist()))
    for i, kw in enumerate(variants):
        cfg = _cfg(tmp_path / f"v{i}", retry_limit=2, **kw)
        res = run_crawl(cfg, images)
        assert res["pages_total"] == res_ref["pages_total"], kw
        assert res["retried_total"] == res_ref["retried_total"], kw
        assert res["errors_total"] == res_ref["errors_total"], kw
        assert key_o(read_order(cfg.out_dir)) == key_o(read_order(ref.out_dir)), kw
        assert rows_a(read_archive(cfg.out_dir)) == rows_a(read_archive(ref.out_dir)), kw
        assert dump_seen(res["_shards"]) == dump_seen(res_ref["_shards"]), kw
        # html mode renders pages whose raw href count can differ from the
        # direct-mode link lists (duplicates pre-dedup) — its upstream
        # extraction funnel is pinned against the oracle separately; across
        # modes compare the semantic outcomes only
        keys = (["pages", "errors", "retried", "culled_links",
                 "submitted_links"] if kw.get("html") else FUNNEL)
        for mv, mr in zip(res["metrics"], res_ref["metrics"]):
            for k in keys:
                assert mv[k] == mr[k], (k, kw)


@pytest.mark.usefixtures("ray_session")
def test_retry_state_survives_checkpoint_resume(tmp_path):
    """Frontier rows carrying retries>0 must round-trip through the
    checkpoint (FRONTIER_SCHEMA retries column): killed-and-resumed equals
    uninterrupted."""
    images = build_images_table(24)
    full = _cfg(tmp_path / "full", retry_limit=2, max_rounds=6)
    res_full = run_crawl(full, images)
    assert res_full["retried_total"] > 0

    part = _cfg(tmp_path / "part", retry_limit=2, max_rounds=3)
    run_crawl(part, images)
    part2 = _cfg(tmp_path / "part", retry_limit=2, max_rounds=6)
    res2 = run_crawl(part2, images, resume=True)

    key = lambda t: sorted(zip(t["round"].to_pylist(), t["rank"].to_pylist(),
                               t["url"].to_pylist()))
    assert key(read_order(full.out_dir)) == key(read_order(part2.out_dir))
    rows = lambda t: sorted(zip(t["url"].to_pylist(), t["round"].to_pylist(),
                                t["image_id"].to_pylist()))
    assert rows(read_archive(full.out_dir)) == rows(read_archive(part2.out_dir))
    assert dump_seen(res_full["_shards"]) == dump_seen(res2["_shards"])
    assert res_full["retried_total"] == res2["retried_total"]
    for mf, mp in zip(res_full["metrics"], res2["metrics"]):
        for k in FUNNEL:
            assert mf[k] == mp[k]
