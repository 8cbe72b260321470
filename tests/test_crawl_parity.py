"""End-to-end oracle parity: the distributed Ray engine must reproduce the
sequential oracle's crawl ordering, final URL-seen set, archive rows and
funnel metrics exactly, under the same seed list + politeness budget
(BASELINE.json north_rule). Also: per-row archive image/caption invariants and
checkpoint/resume byte-equality."""

import numpy as np
import pyarrow.compute as pc
import pytest

from scraper_ray.functions import codec
from scraper_ray.pipelines.crawl import (
    CrawlConfig, dump_seen, read_archive, read_order, run_crawl,
)
from scraper_ray.pipelines.oracle import oracle_crawl
from scraper_ray.sources.fixtures import build_images_table, index_of_image_id


def _cfg(tmp_path, **kw):
    base = dict(
        out_dir=str(tmp_path / "crawl"),
        num_parts=4,
        max_rounds=4,
        rate=2.0,
        burst=3.0,
        n_hosts=10,
        max_degree=6,
        n_images=24,
        html=True,
        fetch_concurrency=2,
        batch_size=64,
    )
    base.update(kw)
    return CrawlConfig(**base)


FUNNEL = ["pages", "errors", "extracted_links", "normalised_links",
          "filtered_links", "culled_links", "submitted_links"]


def _assert_parity(res, cfg, images):
    oracle = oracle_crawl(cfg, images)
    # 1. crawl ordering (exact, per round+rank)
    order = read_order(cfg.out_dir)
    got = list(zip(order["url"].to_pylist(),
                   order["round"].to_pylist(),
                   order["rank"].to_pylist()))
    got.sort(key=lambda t: (t[1], t[2]))
    exp = sorted(oracle["order"], key=lambda t: (t[1], t[2]))
    assert got == exp
    # 2. final URL-seen set (exact membership)
    assert dump_seen(res["_shards"]) == oracle["seen"]
    # 3. archive rows (url, round, image_id, caption)
    arch = read_archive(cfg.out_dir)
    got_rows = sorted(zip(arch["url"].to_pylist(), arch["round"].to_pylist(),
                          arch["image_id"].to_pylist(),
                          arch["caption"].to_pylist()))
    assert got_rows == oracle["archive"]
    # 4. funnel metrics per round (reference field names,
    #    worker/src/metrics/influx_client.rs:117-130)
    assert len(res["metrics"]) == len(oracle["metrics"])
    for got_m, exp_m in zip(res["metrics"], oracle["metrics"]):
        for k in FUNNEL:
            assert got_m[k] == exp_m[k], (k, got_m, exp_m)
        # monotone funnel, as the reference asserts
        seq = [got_m[k] for k in FUNNEL[2:]]
        assert seq == sorted(seq, reverse=True)
    return oracle


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_html_mode(tmp_path):
    cfg = _cfg(tmp_path)
    images = build_images_table(cfg.n_images)
    res = run_crawl(cfg, images)
    assert res["pages_total"] > 20
    _assert_parity(res, cfg, images)


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_direct_mode_with_filter_and_failures(tmp_path):
    cfg = _cfg(
        tmp_path, html=False, filter_mode="black", filter_entries=["h3.test"],
        fail_mod=11, max_rounds=5,
    )
    images = build_images_table(cfg.n_images)
    res = run_crawl(cfg, images)
    oracle = _assert_parity(res, cfg, images)
    assert res["errors_total"] > 0  # robots + injected failures exercised
    assert all("h3.test" != u.split("/")[2] for u in oracle["seen"])


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_url_partitioned_seen(tmp_path):
    """The skew-aware mode (seen set keyed by url_hash, frontier forwarded
    shard-to-shard to its host partition) must preserve exact parity."""
    cfg = _cfg(tmp_path, html=False, seen_partition="url", max_rounds=5)
    images = build_images_table(cfg.n_images)
    res = run_crawl(cfg, images)
    assert res["pages_total"] > 20
    _assert_parity(res, cfg, images)


@pytest.mark.usefixtures("ray_session")
def test_archive_per_row_invariants(tmp_path):
    """decoded-pixel allclose (exact for lossless, PSNR≥40dB for lossy) +
    caption equality vs regenerated ground truth (BASELINE.json input_hint)."""
    cfg = _cfg(tmp_path, max_rounds=3)
    images = build_images_table(cfg.n_images)
    run_crawl(cfg, images)
    arch = read_archive(cfg.out_dir)
    assert arch.num_rows > 10
    for i in range(arch.num_rows):
        image_id = arch["image_id"][i].as_py()
        idx = index_of_image_id(image_id)
        truth = codec.gen_pixels(idx)
        fmt = arch["fmt"][i].as_py()
        px = codec.decode(arch["bytes"][i].as_py(), fmt)
        assert px.shape == truth.shape
        assert (arch["w"][i].as_py(), arch["h"][i].as_py()) == (
            truth.shape[1], truth.shape[0])
        if fmt == "lqi":
            assert codec.psnr(truth, px) >= 40.0
        else:
            assert np.array_equal(px, truth)
        assert arch["caption"][i].as_py() == codec.gen_caption(idx)
        assert arch["phash"][i].as_py() == codec.phash(truth)


@pytest.mark.usefixtures("ray_session")
def test_host_affine_chunking_identical_results(tmp_path):
    """chunk_affinity='host' (stable shard→worker mapping for wall-clock
    politeness deployments) produces bit-identical crawl results to the
    default balanced chunking."""
    images = build_images_table(24)
    bal = _cfg(tmp_path / "bal")
    res_b = run_crawl(bal, images)
    aff = _cfg(tmp_path / "aff", chunk_affinity="host")
    res_a = run_crawl(aff, images)

    assert res_b["pages_total"] == res_a["pages_total"]
    key = lambda t: sorted(zip(t["round"].to_pylist(), t["rank"].to_pylist(),
                               t["url"].to_pylist()))
    assert key(read_order(bal.out_dir)) == key(read_order(aff.out_dir))
    rows = lambda t: sorted(zip(t["url"].to_pylist(), t["round"].to_pylist(),
                                t["image_id"].to_pylist()))
    assert rows(read_archive(bal.out_dir)) == rows(read_archive(aff.out_dir))
    assert dump_seen(res_b["_shards"]) == dump_seen(res_a["_shards"])
    for mb, ma in zip(res_b["metrics"], res_a["metrics"]):
        for k in FUNNEL:
            assert mb[k] == ma[k]


@pytest.mark.usefixtures("ray_session")
def test_resume_from_checkpoint_identical_outputs(tmp_path):
    """Kill after round k, resume → outputs identical to an uninterrupted run."""
    images = build_images_table(24)
    full = _cfg(tmp_path / "full", max_rounds=4)
    res_full = run_crawl(full, images)

    part = _cfg(tmp_path / "part", max_rounds=2)
    run_crawl(part, images)
    part2 = _cfg(tmp_path / "part", max_rounds=4)
    res2 = run_crawl(part2, images, resume=True)

    of, op = read_order(full.out_dir), read_order(part2.out_dir)
    key = lambda t: sorted(zip(t["round"].to_pylist(), t["rank"].to_pylist(),
                               t["url"].to_pylist()))
    assert key(of) == key(op)
    af, ap = read_archive(full.out_dir), read_archive(part2.out_dir)
    rows = lambda t: sorted(zip(t["url"].to_pylist(), t["round"].to_pylist(),
                                t["image_id"].to_pylist()))
    assert rows(af) == rows(ap)
    assert dump_seen(res_full["_shards"]) == dump_seen(res2["_shards"])
    for mf, mp in zip(res_full["metrics"], res2["metrics"]):
        for k in FUNNEL:
            assert mf[k] == mp[k]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("kw", [
    dict(num_parts=1),                                  # degenerate: 1 shard
    dict(num_parts=8, n_hosts=5, max_rounds=5),         # parts > hosts
    dict(rate=1.0, burst=1.0, max_rounds=6),            # tight politeness
    dict(max_degree=12, n_hosts=16, max_rounds=3,       # wide fanout,
         seen_partition="url"),                         # url-routed seen
])
def test_engine_matches_oracle_config_sweep(tmp_path, kw):
    """Parity must hold across the config space, not just the pinned
    fixtures: shard-count degeneracies (1 shard; more shards than hosts),
    budget-starved politeness, and wide fanout under url-hash seen
    partitioning all reproduce the sequential oracle exactly."""
    cfg = _cfg(tmp_path, html=False, **kw)
    images = build_images_table(cfg.n_images)
    res = run_crawl(cfg, images)
    _assert_parity(res, cfg, images)
