"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ..., "num_cpus": N,
   "crawl": {fetched_per_sec, inserts_per_sec, pages_total, ...}}

Headline pipeline = the crawl engine (BASELINE.json metric: sustained
fetched-URLs/sec + frontier-inserts/sec), run in direct (non-HTML) mode with
the approx (bloom+cuckoo) seen set over a generated images table, plus a set
of representative dataset queries over $GRAFT_SF_DIR.

``--scaling`` runs the headline crawl at two parallelism levels in fresh
taskset-pinned processes (4 vs 16 cores — the sandbox stand-in for N vs 4N
nodes; see scaling() for why not 8/32 on this noisy host), reports both
throughputs and the scaling efficiency, and records the result in BASELINE.md.

The query half runs in a fresh taskset-pinned subprocess on the 16 quietest
cores, best-of-2 per query with per-sample steal recorded (``--queries-only``
is that subprocess's entry) — unpinned query numbers on this host are
steal-hostage and incomparable across rounds (r1→r2 showed ±2s phantom
regressions).

This script OWNS its Ray session (the driver contract's entry()/queries() do
not call ray.init).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline crawl configuration — sized so a bench run fetches ~40-60k pages;
# P fixed regardless of num_cpus so only executor parallelism varies
CRAWL_KW = dict(
    num_parts=16,
    seen_mode="approx",
    # 'host' remains the bench default; since the shard-to-shard frontier
    # forwards are batched per round the url-partitioned mode measures at
    # parity (18.2k vs 17.7k pages/s @16 pinned cores) and is the right
    # choice when a hot host's seen-set shard becomes memory/CPU-bound.
    seen_partition="host",
    seen_capacity=1 << 21,
    rate=150.0,
    burst=300.0,
    max_rounds=8,
    n_hosts=200,
    max_degree=12,
    hot_host_pct=30,
    html=False,
    n_images=256,
    batch_size=4096,
    verify_decode=True,  # per-page decode+PSNR — the north-star fetch/decode stage
)

BENCH_QUERIES = [
    "pricing_summary",
    "priority_revenue_join",
    "cull_known_anti_join",
    "events_daily",
    "sessionize",
    "dedup_exact",
    "token_stats",
    "ann_topk",
    "minhash_near_dup",
    "simhash_dups",
]

#: round-4+ operators timed once each (steal recorded) and reported under
#: "queries_extended" — SEPARATE from BENCH_QUERIES so the headline
#: crawl_plus_queries_sec stays comparable across rounds
EXTENDED_QUERIES = [
    "range_join_clicks",
    "tfidf_top_terms",
    "grouped_token_quantiles",
    "pii_scrub",
    "data_mixture",
    "bpe_pretoken_stats",
    "full_outer_user_value",
    "top_docs_per_source",
    "embedding_centroids_fixed",
    "image_embed_topk",
    "running_revenue",
    "rolling_event_value",
    "global_sort_page",
    "daily_active_users",
    "rollup_revenue",
    "incremental_dedup",
    "json_extract_stats",
    # round-5 additions
    "lag_event_gap",
    "pivot_status_priority",
    "mode_event_type",
    "top_doc_list",
    "value_quantiles_cont",
    "exists_orders",
    "exists_orders_bloom",
    "small_qty_revenue",
    "decontaminate",
    "image_embed_dups",
]


def run_crawl_bench(num_cpus: int, html: bool = False,
                    retry: bool = False) -> dict:
    from scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from scraper_ray.sources.fixtures import cached_images_table, seed_urls

    # /dev/shm when available: the archive write bandwidth of a real cluster
    # scales with nodes (per-node disks / object store); a single sandbox
    # disk does not, so tmpfs is the honest stand-in for the scaling run
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out_dir = f"{base}/scraper_ray_bench_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    images = cached_images_table(CRAWL_KW["n_images"])
    kw = dict(CRAWL_KW)
    if html:
        # html-mode sample: per-page render + parse/extract replaces the
        # fused direct path (verify_decode off — the html path measures the
        # parse pipeline, the direct sample already covers decode+PSNR);
        # page graph is identical (parity-pinned), only throughput differs
        kw.update(html=True, verify_decode=False)
    if retry:
        # failure-mode sample (VERDICT r4 item 5): 1/5 of fetch attempts
        # fail transiently (attempt-salted, so retries are independent);
        # retry_limit=2 exercises StateShard.reinsert + the requeue path
        # under load — measures what bounded retry costs when it is BUSY,
        # complementing the idle-machinery sample of r4
        kw.update(fail_mod=5, retry_limit=2)
    cfg = CrawlConfig(
        out_dir=out_dir,
        seeds=seed_urls(CRAWL_KW["n_hosts"]),
        # 0.75×cpus fetch workers: the worker-count ratio between the two
        # levels stays 4× and shards/driver/raylet keep dedicated cores
        fetch_concurrency=max(2, (num_cpus * 3) // 4),
        checkpoint_every=0,  # no per-round checkpoint in the timed loop
        **kw,
    )
    res = run_crawl(cfg, images)
    retried = int(res.get("retried_total", 0))
    # steady-state throughput: exclude the first two ramp-up waves
    # (BASELINE.md protocol: warm-up excluded, >=3 timed waves)
    steady = [m for m in res["metrics"] if m["round"] >= 2]
    steady_sec = sum(m["finishing_ms"] for m in steady) / 1000.0
    steady_pages = sum(m["pages"] for m in steady)
    steady_inserts = sum(m["submitted_links"] for m in steady)
    return {
        "pages_total": res["pages_total"],
        "rounds": res["rounds"],
        "submitted_total": res["submitted_total"],
        "elapsed_sec": round(res["elapsed_sec"], 3),
        "fetched_per_sec": round(steady_pages / steady_sec, 1) if steady_sec else 0.0,
        "inserts_per_sec": round(steady_inserts / steady_sec, 1) if steady_sec else 0.0,
        "fetched_per_sec_total": round(res["fetched_per_sec"], 1),
        **({"retried_total": retried} if retry else {}),
    }


def run_queries(sf_dir: str, reps: int = 2) -> tuple[dict, dict, dict]:
    """Best-of-``reps`` per query with per-sample steal recorded — the same
    quiet-window protocol as the crawl bench (r2's unpinned single-sample
    query numbers were steal-hostage and incomparable across rounds)."""
    from scraper_ray.pipelines.queries import QUERIES

    # untimed warm-up: first Ray Data execution pays one-off module/executor
    # init and cold page cache (BASELINE.md protocol: warm-up excluded)
    import ray.data as rd

    rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey"]).count()
    out, samples = {}, {}
    for name in BENCH_QUERIES:
        samples[name] = []
        for _ in range(max(1, reps)):
            s0 = _read_steal()
            t0 = time.perf_counter()
            QUERIES[name](sf_dir)
            dt = round(time.perf_counter() - t0, 3)
            samples[name].append(
                {"sec": dt, "steal_jiffies": _read_steal() - s0})
        out[name] = min(s["sec"] for s in samples[name])
    ext = {}
    for name in EXTENDED_QUERIES:
        s0 = _read_steal()
        t0 = time.perf_counter()
        QUERIES[name](sf_dir)
        ext[name] = {"sec": round(time.perf_counter() - t0, 3),
                     "steal_jiffies": _read_steal() - s0}
    return out, samples, ext


#: Query-bench pinning: 16 taskset-pinned quiet cores (same rationale as
#: the scaling runs — ray.init(num_cpus=32) does not restrict cores and the
#: host's noisy neighbours camp on ~half the vCPUs, so unpinned 32-slot
#: numbers measure the neighbour, not the engine).
QUERY_PIN_CORES = int(os.environ.get("QUERY_PIN_CORES", "16"))


def run_queries_pinned(sf_dir: str) -> dict:
    """Run the query bench in a fresh taskset-pinned subprocess on the
    quietest cores; falls back to in-process unpinned if taskset fails."""
    cores = ",".join(str(c) for c in _quiet_cores(QUERY_PIN_CORES))
    env = dict(os.environ, RAY_GRAFT_CPUS=str(QUERY_PIN_CORES),
               GRAFT_SF_DIR=sf_dir)
    try:
        proc = subprocess.run(
            ["taskset", "-c", cores, sys.executable, __file__,
             "--queries-only"],
            env=env, capture_output=True, text=True, check=True,
        )
        rec = json.loads(proc.stdout.strip().splitlines()[-1])
        rec["pinned_cores"] = QUERY_PIN_CORES
        return rec
    except (subprocess.CalledProcessError, FileNotFoundError,
            json.JSONDecodeError, IndexError) as e:
        # surface the real failure before falling back — a silent unpinned
        # rerun would hide a pinned-only crash behind plausible numbers
        err = getattr(e, "stderr", "") or ""
        print(f"pinned query bench failed ({type(e).__name__}); falling "
              f"back to unpinned in-process run\n{err[-2000:]}",
              file=sys.stderr)
        q, s, ext = run_queries(sf_dir)
        return {"queries": q, "samples": s, "extended": ext,
                "pinned_cores": 0}


def run_retry_pinned() -> dict:
    """Retry-mode crawl (fail_mod=5, retry_limit=2) in fresh taskset-pinned
    subprocesses on the 16 quietest cores, best-of-2 with per-sample steal
    (VERDICT r4 item 5: the retry machinery was only ever measured idle —
    this sample measures it busy, in a window whose steal is recorded)."""
    samples: list[dict] = []
    best = None
    for _ in range(2):
        cores = ",".join(str(c) for c in _quiet_cores(QUERY_PIN_CORES))
        env = dict(os.environ, RAY_GRAFT_CPUS=str(QUERY_PIN_CORES),
                   GRAFT_SF_DIR=SF_DIR)
        s0 = _read_steal()
        try:
            out = subprocess.run(
                ["taskset", "-c", cores, sys.executable, __file__,
                 "--crawl-only", "--retry"],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            rec = json.loads(out.strip().splitlines()[-1])["crawl"]
            rec["pinned_cores"] = QUERY_PIN_CORES
        except (subprocess.CalledProcessError, FileNotFoundError,
                json.JSONDecodeError, IndexError, KeyError) as e:
            err = getattr(e, "stderr", "") or ""
            print(f"pinned retry bench failed ({type(e).__name__}); "
                  f"falling back to unpinned in-process run\n{err[-2000:]}",
                  file=sys.stderr)
            rec = run_crawl_bench(NUM_CPUS, retry=True)
            rec["pinned_cores"] = 0
        rec["steal_jiffies"] = _read_steal() - s0
        samples.append({"fetched_per_sec": rec["fetched_per_sec"],
                        "steal_jiffies": rec["steal_jiffies"]})
        if best is None or rec["fetched_per_sec"] > best["fetched_per_sec"]:
            best = rec
    best["samples"] = samples
    return best


def queries_only() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    q, s, ext = run_queries(SF_DIR)
    print(json.dumps({"queries": q, "samples": s, "extended": ext,
                      "num_cpus": NUM_CPUS}))
    ray.shutdown()


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    # best-of-2 with per-run steal recorded: this host's hypervisor
    # neighbours steal up to ~18/32 vCPUs in moving windows, so a single
    # sample conflates engine speed with whoever was noisy that minute —
    # the same quiet-window protocol the scaling runs use (SCALE_REPS)
    samples = []
    for _ in range(max(1, int(os.environ.get("CRAWL_REPS", "3")))):
        s0 = _read_steal()
        rec = run_crawl_bench(NUM_CPUS)
        rec["steal_jiffies"] = _read_steal() - s0
        samples.append(rec)
    crawl = max(samples, key=lambda r: r["fetched_per_sec"])
    crawl["samples"] = [
        {"fetched_per_sec": r["fetched_per_sec"],
         "steal_jiffies": r["steal_jiffies"]} for r in samples
    ]
    # html-mode sample (best-of-2, steal recorded): the per-page
    # render+parse path the parity suite pins against direct mode —
    # previously never measured by bench (VERDICT r3 item 3)
    html_samples = []
    for _ in range(2):
        s0 = _read_steal()
        rec = run_crawl_bench(NUM_CPUS, html=True)
        rec["steal_jiffies"] = _read_steal() - s0
        html_samples.append(rec)
    crawl_html = max(html_samples, key=lambda r: r["fetched_per_sec"])
    crawl_html["samples"] = [
        {"fetched_per_sec": r["fetched_per_sec"],
         "steal_jiffies": r["steal_jiffies"]} for r in html_samples
    ]
    crawl_retry = run_retry_pinned()
    qrec = run_queries_pinned(SF_DIR)
    queries = qrec["queries"]
    total = crawl["elapsed_sec"] + sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "crawl_plus_queries_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "query_samples": qrec.get("samples", {}),
                "queries_extended": qrec.get("extended", {}),
                "query_pinned_cores": qrec.get("pinned_cores", 0),
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "crawl": crawl,
                "crawl_html": crawl_html,
                "crawl_retry": crawl_retry,
            }
        )
    )
    ray.shutdown()


SCALE_LO, SCALE_HI = 4, 16  # N vs 4N cores (3 vs 12 fetch workers)
# best-of-N per level (quietest steal window); raise via env on noisy days
SCALE_REPS = int(os.environ.get("SCALE_REPS", "3"))


def _read_steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def _quiet_cores(k: int, sample_sec: float = 1.5) -> list[int]:
    """The k quietest core ids right now (highest idle+iowait delta, lowest
    steal): this host's neighbours camp on the low core ids, so static 0..n-1
    pinning measured the neighbour, not the engine."""

    def snap():
        out = {}
        with open("/proc/stat") as f:
            for line in f:
                if line.startswith("cpu") and line[3].isdigit():
                    p = line.split()
                    out[int(p[0][3:])] = (int(p[4]) + int(p[5]), int(p[8]))
        return out

    a = snap()
    time.sleep(sample_sec)
    b = snap()
    scored = sorted(
        a.keys(),
        key=lambda c: (b[c][0] - a[c][0]) - 4 * (b[c][1] - a[c][1]),
        reverse=True,
    )
    return sorted(scored[:k])


def scaling() -> None:
    """Same crawl at N and 4N CPUs in fresh taskset-pinned processes;
    efficiency = tput_4N / (4 * tput_N).

    Protocol notes (measured on this sandbox):
    - ``ray.init(num_cpus=n)`` only limits scheduling slots, so each run is
      pinned with ``taskset`` to genuinely model an n-core cluster;
    - the host hypervisor steals up to ~18 of the 32 vCPUs under load
      (/proc/stat steal jiffies), which makes 32-core runs hostage to
      noisy neighbours — the comparison therefore uses 4 vs 16 cores and
      takes the best of 3 runs per level (the quietest window), reporting
      the per-run steal so the interference is visible in the record.
    """
    results = {}
    samples: dict[int, list] = {}
    for n in (SCALE_LO, SCALE_HI):
        best = None
        samples[n] = []
        for _ in range(SCALE_REPS):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SF_DIR=SF_DIR)
            cores = ",".join(str(c) for c in _quiet_cores(n))
            cmd = ["taskset", "-c", cores, sys.executable, __file__,
                   "--crawl-only"]
            s0 = _read_steal()
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, check=True,
            ).stdout
            steal = _read_steal() - s0
            rec = json.loads(out.strip().splitlines()[-1])
            rec["steal_jiffies"] = steal
            samples[n].append(
                {"fetched_per_sec": rec["crawl"]["fetched_per_sec"],
                 "steal_jiffies": steal}
            )
            if best is None or (rec["crawl"]["fetched_per_sec"]
                                > best["crawl"]["fetched_per_sec"]):
                best = rec
        results[n] = best
    t_lo = results[SCALE_LO]["crawl"]["fetched_per_sec"]
    t_hi = results[SCALE_HI]["crawl"]["fetched_per_sec"]
    eff = t_hi / (4 * t_lo) if t_lo else 0.0
    out = {
        f"fetched_per_sec_{SCALE_LO}": t_lo,
        f"fetched_per_sec_{SCALE_HI}": t_hi,
        f"inserts_per_sec_{SCALE_LO}": results[SCALE_LO]["crawl"]["inserts_per_sec"],
        f"inserts_per_sec_{SCALE_HI}": results[SCALE_HI]["crawl"]["inserts_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "pages_total": results[SCALE_HI]["crawl"]["pages_total"],
        "samples": samples,
    }
    print(json.dumps(out))
    _record_baseline(out)


def _record_baseline(out: dict) -> None:
    """Record the run under an auto-managed section WITHOUT touching the
    hand-written analysis above it (the old truncate-at-marker behaviour
    destroyed the consolidated multi-run narrative every --scaling run)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    marker = "## Latest --scaling run (auto-updated by bench.py)"
    lo, hi = SCALE_LO, SCALE_HI
    block = (
        f"{marker}\n\n"
        f"Identical crawl pinned via taskset to {lo} vs {hi} quiet cores "
        f"(N vs 4N; fetch pools 3 vs 12 workers), best of {SCALE_REPS} runs "
        f"per level; only near-zero-steal samples are cross-comparable.\n\n"
        f"| fetched/s @{lo}cpu | fetched/s @{hi}cpu | inserts/s @{lo}cpu "
        f"| inserts/s @{hi}cpu | efficiency | pages |\n"
        f"|---|---|---|---|---|---|\n"
        f"| {out[f'fetched_per_sec_{lo}']} | {out[f'fetched_per_sec_{hi}']} "
        f"| {out[f'inserts_per_sec_{lo}']} | {out[f'inserts_per_sec_{hi}']} "
        f"| {out['scaling_efficiency']} | {out['pages_total']} |\n\n"
        f"All samples (fetched/s, steal jiffies during run): "
        f"{json.dumps(out.get('samples', {}))}\n"
    )
    try:
        with open(path) as f:
            text = f.read()
        if marker in text:
            # replace only the auto block: marker → next '## ' heading or EOF
            start = text.index(marker)
            nxt = text.find("\n## ", start + len(marker))
            tail = "" if nxt < 0 else text[nxt + 1:]
            text = text[:start] + block + ("\n" + tail if tail else "")
        else:
            text = text.rstrip() + "\n\n" + block
        with open(path, "w") as f:
            f.write(text)
    except OSError:
        pass


def crawl_only() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    crawl = run_crawl_bench(NUM_CPUS, retry="--retry" in sys.argv)
    print(json.dumps({"crawl": crawl, "num_cpus": NUM_CPUS}))
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--crawl-only" in sys.argv:
        crawl_only()
    elif "--queries-only" in sys.argv:
        queries_only()
    else:
        main()
