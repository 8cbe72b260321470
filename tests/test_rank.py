"""Distributed PageRank over the crawled host graph (pipelines/rank.py):
dense-numpy oracle parity, partition-count invariance, determinism, skew
sanity (the synthetic web's hot host must rank first), and the driver-
data-plane guard (no rank/contribution array is ever resolved driver-side
— the `test_driver_never_resolves_wave_row_tables` pattern)."""

import shutil

import numpy as np
import pytest

from scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
from scraper_ray.pipelines.rank import host_edges_from_crawl, pagerank
from scraper_ray.sources.fixtures import build_images_table


def _dense_pagerank(edges, damping=0.85, tol=1e-12, iters=100):
    hosts = sorted(set(edges["src"]) | set(edges["dst"]))
    hi = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    M = np.zeros((n, n))
    for _, r in edges.iterrows():
        M[hi[r["dst"]], hi[r["src"]]] += r["weight"]
    colsum = M.sum(axis=0)
    dang = colsum == 0
    M[:, ~dang] /= colsum[~dang]
    rk = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = (1 - damping) / n + damping * (M @ rk + rk[dang].sum() / n)
        if np.abs(new - rk).sum() < tol:
            rk = new
            break
        rk = new
    return hosts, rk


def _crawl_edges(tmp_path, **kw):
    """(edge Dataset, edge DataFrame twin for the dense oracle)."""
    base = dict(num_parts=4, max_rounds=5, n_hosts=12, max_degree=6,
                n_images=24, html=False, rate=5.0, burst=8.0,
                fetch_concurrency=2)
    base.update(kw)
    out = str(tmp_path / "crawl")
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(out_dir=out, **base)
    run_crawl(cfg, build_images_table(cfg.n_images))
    ds = host_edges_from_crawl(out, cfg.web_dict())
    return ds, ds.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_dense_numpy_oracle(tmp_path):
    ds, edges = _crawl_edges(tmp_path)
    assert len(edges) > 0
    pr = pagerank(ds, num_parts=4)
    hosts, truth = _dense_pagerank(edges)
    got = pr.set_index("host")["rank"].reindex(hosts).to_numpy()
    assert abs(pr["rank"].sum() - 1.0) < 1e-9
    assert np.abs(got - truth).max() < 1e-10


@pytest.mark.usefixtures("ray_session")
def test_pagerank_partition_invariant_and_deterministic(tmp_path):
    """Different partition counts regroup the fixed-order float sums —
    agreement to 1e-12; the SAME partition count is bit-identical. Also
    pins DataFrame input ≡ Dataset input (the test-convenience path)."""
    ds, edges = _crawl_edges(tmp_path)
    hosts = sorted(set(edges["src"]) | set(edges["dst"]))
    by_p = {p: pagerank(edges, num_parts=p)
            .set_index("host")["rank"].reindex(hosts).to_numpy()
            for p in (1, 2, 8)}
    assert np.abs(by_p[1] - by_p[8]).max() < 1e-12
    assert np.abs(by_p[2] - by_p[8]).max() < 1e-12
    again = (pagerank(edges, num_parts=8)
             .set_index("host")["rank"].reindex(hosts).to_numpy())
    assert np.array_equal(by_p[8], again)
    via_ds = (pagerank(ds, num_parts=8)
              .set_index("host")["rank"].reindex(hosts).to_numpy())
    # Dataset blocks split the same edges differently than the 1-block
    # DataFrame path, but pair aggregation + (src, dst) sort make the
    # bundles identical → bit-equal
    assert np.array_equal(by_p[8], via_ds)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_hot_host_ranks_first(tmp_path):
    """The synthetic web routes hot_host_pct% of links to host h0 — it
    must carry the top rank on a larger skewed crawl."""
    ds, _ = _crawl_edges(tmp_path, n_hosts=30, hot_host_pct=40,
                         max_rounds=6, rate=20.0, burst=30.0)
    pr = pagerank(ds, num_parts=4)
    top = pr.sort_values("rank", ascending=False).iloc[0]["host"]
    assert top == "h0.test", pr.sort_values("rank", ascending=False).head()


@pytest.mark.usefixtures("ray_session")
def test_pagerank_driver_never_resolves_arrays(tmp_path, monkeypatch):
    """Round-4 verdict item: the iteration loop must not be a driver
    data-plane. Wrap ray.get IN THE DRIVER PROCESS and assert no resolved
    value is a numeric numpy array (rank vectors / contribution arrays /
    dangling index sets) — the driver may resolve partition sizes,
    dangling-mass and delta scalars, and the ONE final result DataFrame."""
    import pandas as pd
    import ray

    ds, edges = _crawl_edges(tmp_path)
    violations = []
    frames = []
    real_get = ray.get

    def spy_get(obj, **kw):
        out = real_get(obj, **kw)
        vals = out if isinstance(out, list) else [out]
        for v in vals:
            if isinstance(v, np.ndarray) and v.dtype.kind in "fiu":
                violations.append((v.dtype, v.shape))
            if isinstance(v, pd.DataFrame):
                frames.append(set(v.columns))
        return out

    monkeypatch.setattr(ray, "get", spy_get)
    pr = pagerank(ds, num_parts=4)
    assert len(pr) == len(set(edges["src"]) | set(edges["dst"]))
    assert violations == []
    # the only DataFrame the driver resolves is the final deliverable
    assert all(f == {"host", "rank"} for f in frames), frames
