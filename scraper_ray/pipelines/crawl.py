"""The crawl wave driver loop (SURVEY.md §3.5) — Ray-Data-native restatement of
the reference's continuous consume loop (`/root/reference/worker/src/worker.rs:58-172`).

Each wave (round):

1. **drain** — every StateShard releases its politeness-budgeted,
   priority-ordered slice of the frontier (replaces the RabbitMQ ``frontier``
   queue consume, `rmqredis.rs:213-257`); the canonical wave order
   ``(-priority, host, url)`` lives in the shards' order fragments (sorted at
   read time by ``read_order``) — the deterministic wave order the reference
   never had (its order was broker+HashSet nondeterministic). The wave tables
   themselves never transit the driver: it resolves row COUNTS only and
   routes ObjectRef spans to the worker pool.
2. **fetch** — ``map_batches(Fetcher, concurrency=…)`` actor pool resolves
   pages + image payloads (zero-copy Arrow batches; the wave is then
   materialized once — bounded by the politeness budget — so the archive sink
   and the link path both consume it without recompute).
3. **archive** — non-error rows append to the Lance/Parquet archive table
   under ``archive/round=NNNN/`` (idempotent per-round fragment naming →
   resumable); error rows go to ``errors/round=NNNN/``.
4. **route** — ``map_batches(LinkRouter)`` extracts/canonicalizes/filters
   per page and routes candidates to their host-partition shard for the
   atomic anti-join + frontier insert.
5. **checkpoint** — per-partition shard snapshots + a manifest carrying
   lineage (per-round funnel counts, per-stage timings mirroring the
   reference's metrics schema, `influx_client.rs:61-135`) and archive paths.

The driver never materializes anything unbounded: wave size is capped by the
politeness budget, link rows are narrow strings routed task→actor, and the
only driver-side rows are per-batch summary counts.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import hash64_batch, part_of, priority_of
from ..functions.urlnorm import canonicalize_batch
from ..sources import tableio
from ..sources.fixtures import build_images_table, seed_urls
from ..stages.fetch import WaveWorkerPool
from ..stages.filters import HostFilter
from ..state.shard import StateShard

ARCHIVE_COLUMNS = [
    "url", "host", "round", "depth", "image_id", "bytes", "w", "h", "fmt",
    "caption", "phash",
]

ORDER_SCHEMA = pa.schema(
    [("url", pa.string()), ("round", pa.int32()), ("rank", pa.int64())]
)


@dataclasses.dataclass
class CrawlConfig:
    out_dir: str
    seeds: list = dataclasses.field(default_factory=lambda: seed_urls(8))
    num_parts: int = 8
    seen_mode: str = "exact"  # 'exact' (test parity) | 'approx' (bloom+cuckoo)
    # 'host': one combined shard call per link; 'url': seen set partitioned by
    # url_hash (uniform under hot-host skew) + shard-to-shard frontier forward
    seen_partition: str = "host"
    seen_capacity: int = 1 << 20
    rate: float = 2.0  # politeness: URLs released per host per wave
    burst: float = 4.0
    max_rounds: int = 8
    max_pages: int = 0  # 0 = unlimited
    max_wave_per_part: int = 0  # 0 = unlimited
    # synthetic web
    n_hosts: int = 40
    max_degree: int = 8
    hot_host_pct: int = 30
    private_mod: int = 7
    robots_mod: int = 4
    html: bool = True
    n_images: int = 64
    # filtering
    filter_mode: str = "none"
    filter_entries: list = dataclasses.field(default_factory=list)
    # execution
    fetch_concurrency: int = 4
    batch_size: int = 256
    # 'balanced' (default): zero-copy concat + even slices — best wall-clock.
    # 'host': chunks stay per-shard and each shard maps to a FIXED worker
    # (part % nworkers), so one Fetcher owns every host of that partition
    # across all rounds — required when a real-HTTP downloader's per-actor
    # WallClockTokenBucket must be the global per-host politeness bound.
    chunk_affinity: str = "balanced"
    checkpoint_every: int = 1
    fail_mod: int = 0
    # bounded transient-error requeue: 0 (default) reproduces the reference's
    # ACTUAL drop behaviour (Reject's requeue flag bugged false,
    # rmqredis.rs:230-251); N>0 enables the *intended* Reject semantics
    # (errors.rs:89-183) — transient kinds re-enter their host shard's
    # frontier with retries+1 until the per-URL budget is spent, after which
    # they land in the errors table
    retry_limit: int = 0
    verify_decode: bool = False  # per-row decode+PSNR invariant during fetch
    spill_threshold: int = 2_000_000

    def web_dict(self) -> dict:
        return {
            "n_hosts": self.n_hosts,
            "max_degree": self.max_degree,
            "hot_host_pct": self.hot_host_pct,
            "private_mod": self.private_mod,
            "robots_mod": self.robots_mod,
            "html": self.html,
        }


def _round_dir(base: str, r: int) -> str:
    return os.path.join(base, f"round={r:04d}")


def _seed_shards(cfg: CrawlConfig, shards, filt: HostFilter):
    """Canonicalize + filter + route the seed list (depth 0, round 'seed').

    The reference seeds out-of-band by publishing URLs straight to the work
    exchange (SURVEY.md §3.3); here seeds take the same canonicalize → filter
    → check_and_insert path as discovered links.
    """
    import ray

    canon, hosts = canonicalize_batch(cfg.seeds)
    kept = [(u, h) for u, h in zip(canon, hosts) if filt.keep(h)]
    if not kept:
        return 0
    urls = [u for u, _ in kept]
    hosts = [h for _, h in kept]
    hashes = hash64_batch(urls)
    prios = priority_of(hashes)
    cand = pa.table({
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "url_hash": pa.array(hashes),
        "priority": pa.array(prios),
        "depth": pa.array([0] * len(urls), pa.int32()),
    })
    if cfg.seen_partition == "url":
        parts = part_of(hashes, cfg.num_parts)
        method = "check_and_route"
    else:
        parts = part_of(hash64_batch(hosts), cfg.num_parts)
        method = "check_and_insert_table"
    futs = []
    for p in np.unique(parts):
        idx = np.nonzero(parts == p)[0]
        futs.append(getattr(shards[int(p)], method).remote(cand.take(idx)))
    total = 0
    inner = []
    for r in ray.get(futs):
        if "futs" in r:
            inner.extend(r["futs"])
            total += r["culled"]
        elif "submitted" in r:
            total += r["submitted"]
        else:
            total += r["culled"]
    if method == "check_and_route":
        for r in ray.get([s.flush_forwards.remote() for s in shards]):
            inner.extend(r["futs"])
    ray.get(inner)
    return total


def run_crawl(cfg: CrawlConfig, images_table: pa.Table | None = None,
              resume: bool = False, downloader_factory=None) -> dict:
    """Run (or resume) a crawl; returns the lineage/metrics summary dict.

    ``downloader_factory``: optional picklable zero-arg callable building a
    ``stages.downloader.Downloader`` INSIDE each pool actor — the seam for
    real-HTTP deployments (pair it with ``chunk_affinity='host'`` so each
    actor's wall-clock token buckets are the global per-host bound)."""
    import ray

    if cfg.chunk_affinity not in ("balanced", "host"):
        raise ValueError(
            f"chunk_affinity must be 'balanced' or 'host', got "
            f"{cfg.chunk_affinity!r}")
    out = cfg.out_dir
    archive_dir = os.path.join(out, "archive")
    errors_dir = os.path.join(out, "errors")
    order_dir = os.path.join(out, "order")
    ckpt_dir = os.path.join(out, "ckpt")
    spill_dir = os.path.join(out, "spill")
    for d in (archive_dir, errors_dir, order_dir, ckpt_dir, spill_dir):
        os.makedirs(d, exist_ok=True)

    if images_table is None:
        images_table = build_images_table(cfg.n_images)
    images_ref = ray.put(images_table)
    filt = HostFilter(cfg.filter_mode, cfg.filter_entries)

    # multi-node placement: SPREAD the state shards and pool workers across
    # nodes so a fixed-size cluster doesn't land every shard (and its spill
    # I/O + frontier heap) on one host — on a single-node cluster the option
    # is omitted entirely so sandbox behaviour (and the parity suites) are
    # bit-identical with or without it
    n_alive = sum(1 for n in ray.nodes() if n.get("Alive"))
    spread = {"scheduling_strategy": "SPREAD"} if n_alive > 1 else {}
    ShardActor = ray.remote(num_cpus=0.05, **spread)(StateShard)
    shards = [
        ShardActor.remote(
            p, cfg.num_parts, cfg.seen_mode, cfg.seen_capacity,
            cfg.rate, cfg.burst, cfg.spill_threshold,
            os.path.join(spill_dir, f"part{p:04d}"),
        )
        for p in range(cfg.num_parts)
    ]
    if cfg.seen_partition == "url":
        ray.get([s.set_peers.remote(shards) for s in shards])

    # persistent fetch/route worker pool, created ONCE for all waves (see
    # stages/fetch.py WaveWorkerPool for the rationale and measurements)
    PoolActor = ray.remote(num_cpus=1, **spread)(WaveWorkerPool)
    workers = [
        PoolActor.remote(
            images_ref=images_ref,
            web_cfg=cfg.web_dict(),
            fail_mod=cfg.fail_mod,
            shard_handles=shards,
            filter_cfg=filt.to_dict(),
            num_parts=cfg.num_parts,
            archive_dir=archive_dir,
            errors_dir=errors_dir,
            verify_decode=cfg.verify_decode,
            seen_partition=cfg.seen_partition,
            downloader_factory=downloader_factory,
            retry_limit=cfg.retry_limit,
        )
        for _ in range(cfg.fetch_concurrency)
    ]

    manifest_path = os.path.join(ckpt_dir, "manifest.json")
    metrics_rows: list[dict] = []
    start_round = 0
    pages_total = 0
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        # crawl-semantic config must match the checkpoint exactly — resuming
        # with e.g. a different seen_capacity would silently corrupt the
        # restored cuckoo geometry / partitioning / politeness semantics.
        # Execution knobs (rounds, budgets, concurrency, batch size) may vary.
        _MUTABLE = {"max_rounds", "max_pages", "max_wave_per_part",
                    "fetch_concurrency", "batch_size", "checkpoint_every",
                    "spill_threshold", "out_dir", "chunk_affinity"}
        old_cfg = manifest.get("config", {})
        for k, v in dataclasses.asdict(cfg).items():
            if k in _MUTABLE or k not in old_cfg:
                continue
            if old_cfg[k] != v:
                raise ValueError(
                    f"resume config mismatch on {k!r}: checkpoint has "
                    f"{old_cfg[k]!r}, current config has {v!r}"
                )
        # the manifest names the last FULLY-written checkpoint epoch; a crash
        # mid-checkpoint leaves a partial epoch dir that is simply ignored
        epoch_dir = os.path.join(ckpt_dir, manifest["ckpt_epoch"])
        ray.get([s.restore.remote(epoch_dir) for s in shards])
        start_round = manifest["next_round"]
        metrics_rows = manifest["metrics"]
        pages_total = manifest["pages_total"]
        # drop outputs of rounds replayed after the checkpoint (idempotent resume)
        for base in (archive_dir, errors_dir, order_dir):
            for name in os.listdir(base):
                if not name.startswith("round="):
                    continue
                rnum = int(name.split("=")[1].split(".")[0])
                if rnum >= start_round:
                    p = os.path.join(base, name)
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    else:
        # fresh run on a previously-used out_dir: clear stale outputs so
        # read_archive/read_order can never mix rows from an earlier run
        for base in (archive_dir, errors_dir, order_dir, ckpt_dir, spill_dir):
            shutil.rmtree(base, ignore_errors=True)
            os.makedirs(base, exist_ok=True)
        _seed_shards(cfg, shards, filt)

    t_start = time.perf_counter()
    r = start_round
    while r < cfg.max_rounds:
        if cfg.max_pages and pages_total >= cfg.max_pages:
            break
        t_round = time.perf_counter()
        # 1. drain (politeness-budgeted, priority-ordered per shard); each
        # shard writes its own order fragment — the canonical GLOBAL wave
        # order is derived at read time (read_order), so the driver neither
        # sorts nor holds the concatenated wave (at 10^6 hosts the old
        # driver-side concat+sort was the loop's hotspot)
        t0 = time.perf_counter()
        max_rows = cfg.max_wave_per_part or None
        odir = _round_dir(order_dir, r)
        if os.path.exists(odir):
            shutil.rmtree(odir)  # idempotent replay after resume
        os.makedirs(odir, exist_ok=True)
        # the wave tables NEVER transit the driver: drain_wave returns
        # (table, num_rows) as two object refs; the driver resolves only the
        # counts and routes (table_ref, offset, length) spans to the pool —
        # workers ray.get/slice locally (plasma-cached, zero-copy). See
        # WaveWorkerPool.process_spans.
        pairs = [s.drain_wave.options(num_returns=2)
                 .remote(True, max_rows, odir, r) for s in shards]
        table_refs = [p[0] for p in pairs]
        counts = ray.get([p[1] for p in pairs])
        wave_rows = int(sum(counts))
        if wave_rows == 0:
            os.rmdir(odir)
            sizes = ray.get([s.frontier_size.remote() for s in shards])
            if sum(sizes) == 0:
                break
            r += 1
            continue
        receive_ms = (time.perf_counter() - t0) * 1000

        # 2-4. fused wave stage: fetch + archive-fragment write + link routing
        # in ONE actor-pool execution (image bytes never re-enter the object
        # store; the archive write parallelizes across the pool)
        for base in (archive_dir, errors_dir):
            rdir = _round_dir(base, r)
            if os.path.exists(rdir):
                shutil.rmtree(rdir)
        # adaptive chunking: ~2 chunks per pool worker (tail overlap without
        # a per-batch shard-call storm); cfg.batch_size caps chunk rows.
        # Chunk boundaries are computed on the COUNTS only — the global wave
        # is the logical concatenation of the non-empty shard tables in shard
        # order, and each chunk becomes a list of (table_ref, offset, length)
        # spans (a chunk may straddle a shard boundary). Chunk sizes divide
        # the wave evenly: slicing shard-by-shard left workers with 2-vs-3
        # unequal chunks and the round barrier waiting on stragglers
        # (measured ~12% at 16 cores). Results are chunk-boundary-insensitive
        # by design (atomic seen-set, depth = round discovered), pinned by
        # the parity suite.
        bs = max(min(512, cfg.batch_size),
                 min(cfg.batch_size,
                     -(-wave_rows // (2 * cfg.fetch_concurrency))))
        if cfg.chunk_affinity == "host":
            # host-affine: shard p's slices always go to worker p % W, so
            # each worker's wall-clock token buckets own their hosts
            # globally (the host→shard map is fixed). Chunks within a
            # shard stay on that worker.
            futs = []
            for p, (ref, n_p) in enumerate(zip(table_refs, counts)):
                if not n_p:
                    continue
                w = workers[p % len(workers)]
                k = max(1, -(-n_p // bs))
                step = -(-n_p // k)
                futs.extend(
                    w.process_spans.remote(
                        [(ref, off, min(step, n_p - off))], r)
                    for off in range(0, n_p, step))
        else:
            nonempty = [(ref, n_p)
                        for ref, n_p in zip(table_refs, counts) if n_p]
            starts = np.cumsum([0] + [n for _, n in nonempty])
            nchunks = max(1, -(-wave_rows // bs))
            step = (wave_rows + nchunks - 1) // nchunks
            futs = []
            for i in range(nchunks):
                g0, g1 = i * step, min((i + 1) * step, wave_rows)
                if g0 >= g1:
                    continue
                spans = []
                j = int(np.searchsorted(starts, g0, side="right")) - 1
                while j < len(nonempty) and starts[j] < g1:
                    ref, n_p = nonempty[j]
                    off = max(0, g0 - int(starts[j]))
                    end = min(n_p, g1 - int(starts[j]))
                    if end > off:
                        spans.append((ref, int(off), int(end - off)))
                    j += 1
                futs.append(workers[i % len(workers)]
                            .process_spans.remote(spans, r))
        summaries = ray.get(futs)

        agg = {k: 0.0 for k in (
            "pages", "errors", "retried", "extracted_links", "normalised_links",
            "filtered_links", "culled_links", "submitted_links",
            "download_ms", "extract_ms", "normalise_ms", "filter_ms",
            "culling_ms", "archive_ms",
        )}
        shard_futs = []
        for row in summaries:
            shard_futs.extend(row.pop("shard_futs", []))
            for k in agg:
                agg[k] += row[k]
        # resolve the non-blocking shard anti-join calls at the round barrier
        # (all inserts must land before the next drain); in url-partition
        # mode there is a second level: the per-round BATCHED shard-to-shard
        # frontier forwards, flushed once per (shard, peer) pair
        inner_futs = []
        for res in ray.get(shard_futs):
            agg["culled_links"] += res["culled"]
            if "futs" in res:
                inner_futs.extend(res["futs"])
            else:
                agg["submitted_links"] += res.get("submitted", 0)
        if cfg.seen_partition == "url":
            for res in ray.get([s.flush_forwards.remote() for s in shards]):
                inner_futs.extend(res["futs"])
        for res in ray.get(inner_futs):
            agg["submitted_links"] += res["submitted"]
        pages_total += int(agg["pages"])
        row = {
            "round": r,
            "wave_rows": wave_rows,
            "receive_ms": receive_ms,
            "finishing_ms": (time.perf_counter() - t_round) * 1000,
            **{k: (int(v) if not k.endswith("_ms") else v) for k, v in agg.items()},
        }
        metrics_rows.append(row)

        # 5. checkpoint + lineage manifest (epoch-atomic: shards write into a
        # fresh epoch dir FIRST, the manifest switches to it SECOND, older
        # epochs are pruned LAST — a crash at any point leaves a manifest
        # naming a complete epoch)
        if cfg.checkpoint_every and (r + 1) % cfg.checkpoint_every == 0:
            _checkpoint_epoch(shards, ckpt_dir, manifest_path, r + 1,
                              metrics_rows, pages_total, cfg)
        r += 1

    elapsed = time.perf_counter() - t_start
    _checkpoint_epoch(shards, ckpt_dir, manifest_path, r, metrics_rows,
                      pages_total, cfg)
    if metrics_rows:
        pq.write_table(
            pa.Table.from_pylist(metrics_rows), os.path.join(out, "metrics.parquet")
        )
    shard_stats = ray.get([s.stats.remote() for s in shards])
    result = {
        "rounds": len(metrics_rows),
        "pages_total": pages_total,
        "errors_total": int(sum(m["errors"] for m in metrics_rows)),
        "retried_total": int(sum(m.get("retried", 0) for m in metrics_rows)),
        "submitted_total": int(sum(m["submitted_links"] for m in metrics_rows)),
        "elapsed_sec": elapsed,
        "fetched_per_sec": pages_total / elapsed if elapsed > 0 else 0.0,
        "inserts_per_sec": (
            sum(m["submitted_links"] for m in metrics_rows) / elapsed
            if elapsed > 0 else 0.0
        ),
        "metrics": metrics_rows,
        "shard_stats": shard_stats,
        "archive_dir": archive_dir,
        "out_dir": out,
    }
    result["_shards"] = shards  # callers (tests) may inspect state; else GC'd
    return result


def _checkpoint_epoch(shards, ckpt_dir: str, manifest_path: str,
                      next_round: int, metrics: list[dict], pages_total: int,
                      cfg: CrawlConfig) -> None:
    import ray

    epoch = f"epoch={next_round:04d}"
    epoch_dir = os.path.join(ckpt_dir, epoch)
    ray.get([s.checkpoint.remote(epoch_dir) for s in shards])
    _write_manifest(manifest_path, next_round, metrics, pages_total, cfg,
                    ckpt_epoch=epoch)
    for name in os.listdir(ckpt_dir):
        if name.startswith("epoch=") and name != epoch:
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


def _write_manifest(path: str, next_round: int, metrics: list[dict],
                    pages_total: int, cfg: CrawlConfig,
                    ckpt_epoch: str = "") -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "next_round": next_round,
                "ckpt_epoch": ckpt_epoch,
                "pages_total": pages_total,
                "metrics": metrics,
                "config": {k: v for k, v in dataclasses.asdict(cfg).items()},
            },
            f,
        )
    os.replace(tmp, path)


def read_archive(out_dir: str) -> pa.Table:
    """All archive rows across rounds as one Arrow table."""
    base = os.path.join(out_dir, "archive")
    parts = []
    for name in sorted(os.listdir(base)):
        d = os.path.join(base, name)
        if os.path.isdir(d):
            try:
                parts.append(tableio.read_table(d))
            except FileNotFoundError:
                pass
    if not parts:
        # properly-typed empty table — all-null-typed columns break typed
        # concat/filter on a legitimately-empty archive
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "round": pa.array([], pa.int32()),
                "depth": pa.array([], pa.int32()),
                "image_id": pa.array([], pa.string()),
                "bytes": pa.array([], pa.binary()),
                "w": pa.array([], pa.int32()),
                "h": pa.array([], pa.int32()),
                "fmt": pa.array([], pa.string()),
                "caption": pa.array([], pa.string()),
                "phash": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(parts)


def read_order(out_dir: str) -> pa.Table:
    """Canonical per-round wave order (url, round, rank), derived at read
    time from the per-part fragments the shards write during drain. The sort
    by ``(round, -priority, host, url)`` happens HERE, over whatever subset
    the reader asks for — never on the crawl driver's hot loop."""
    base = os.path.join(out_dir, "order")
    tables = []
    for name in sorted(os.listdir(base)):
        d = os.path.join(base, name)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                tables.append(pq.read_table(os.path.join(d, f)))
    if not tables:
        return pa.table({"url": [], "round": [], "rank": []}, schema=ORDER_SCHEMA)
    t = pa.concat_tables(tables)
    idx = pa.compute.sort_indices(
        t,
        sort_keys=[("round", "ascending"), ("priority", "descending"),
                   ("host", "ascending"), ("url", "ascending")],
    )
    t = t.take(idx)
    rounds = t["round"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, np.diff(rounds) != 0])
    counts = np.diff(np.r_[starts, len(rounds)])
    rank = np.arange(len(rounds), dtype=np.int64) - np.repeat(starts, counts)
    return pa.table(
        {"url": t["url"], "round": t["round"], "rank": pa.array(rank)},
        schema=ORDER_SCHEMA,
    )


def dump_seen(shards) -> list[str]:
    """Union of all shards' exact seen sets (test/parity helper)."""
    import ray

    out: list[str] = []
    for urls in ray.get([s.dump_seen.remote() for s in shards]):
        out.extend(urls)
    return sorted(out)


def _env_default(name: str, default, cast=str):
    """CLI > env > default option layering, mirroring the reference CLI
    (every clap option carries ``.env("SCRAPER_…")``,
    `/root/reference/worker/src/main.rs:80-269`). Env var:
    ``SCRAPER_RAY_<NAME>``; used as the argparse default so an explicit
    flag always wins."""
    raw = os.environ.get(f"SCRAPER_RAY_{name}")
    if raw is None or raw == "":
        return default
    if cast is bool:
        return raw.strip().lower() in ("1", "true", "yes", "on")
    try:
        return cast(raw)
    except ValueError:
        raise SystemExit(
            f"error: invalid SCRAPER_RAY_{name}={raw!r}: "
            f"expected {cast.__name__}"
        )


def parse_cli(argv=None):
    """Parse CLI args (with env fallback) into (CrawlConfig, resume flag)."""
    import argparse

    ed = _env_default
    p = argparse.ArgumentParser(description="Ray-Data crawl engine")
    p.add_argument("--out", default=ed("OUT", None),
                   help="output directory (env SCRAPER_RAY_OUT)")
    p.add_argument("--seeds", default=ed("SEEDS", None),
                   help="file with one seed URL per line")
    p.add_argument("--rounds", type=int, default=ed("ROUNDS", 8, int))
    p.add_argument("--parts", type=int, default=ed("PARTS", 16, int))
    p.add_argument("--rate", type=float, default=ed("RATE", 2.0, float))
    p.add_argument("--burst", type=float, default=ed("BURST", 4.0, float))
    p.add_argument("--hosts", type=int, default=ed("HOSTS", 40, int))
    p.add_argument("--degree", type=int, default=ed("DEGREE", 8, int))
    p.add_argument("--images", type=int, default=ed("IMAGES", 256, int))
    p.add_argument("--seen-mode", choices=["exact", "approx"],
                   default=ed("SEEN_MODE", "approx"))
    p.add_argument("--seen-partition", choices=["host", "url"],
                   default=ed("SEEN_PARTITION", "host"),
                   help="'url' = skew-aware url-hash seen partitioning")
    p.add_argument("--chunk-affinity", choices=["balanced", "host"],
                   default=ed("CHUNK_AFFINITY", "balanced"),
                   help="'host' pins each host partition to one fetch "
                        "worker (wall-clock politeness deployments)")
    p.add_argument("--spill-threshold", type=int,
                   default=ed("SPILL_THRESHOLD", 2_000_000, int),
                   help="per-shard frontier rows before cold spill")
    p.add_argument("--retry-limit", type=int,
                   default=ed("RETRY_LIMIT", 0, int),
                   help="bounded transient-error requeues per URL (0 = "
                        "reference's actual drop behaviour)")
    p.add_argument("--filter-mode", choices=["none", "black", "white"],
                   default=ed("FILTER_MODE", "none"))
    p.add_argument("--filter-file", default=ed("FILTER_FILE", None),
                   help="host-substring list, one per line")
    p.add_argument("--concurrency", type=int,
                   default=ed("CONCURRENCY", 8, int))
    p.add_argument("--resume", action="store_true",
                   default=ed("RESUME", False, bool))
    p.add_argument("--no-html", action="store_true",
                   default=ed("NO_HTML", False, bool),
                   help="direct link mode (bench/scale)")
    args = p.parse_args(argv)
    if not args.out:
        p.error("--out (or SCRAPER_RAY_OUT) is required")
    # argparse validates choices= only for supplied flags, not env defaults
    if args.seen_mode not in ("exact", "approx"):
        p.error(f"invalid seen-mode {args.seen_mode!r} (exact|approx)")
    if args.filter_mode not in ("none", "black", "white"):
        p.error(f"invalid filter-mode {args.filter_mode!r} (none|black|white)")
    if args.seen_partition not in ("host", "url"):
        p.error(f"invalid seen-partition {args.seen_partition!r} (host|url)")
    if args.chunk_affinity not in ("balanced", "host"):
        p.error(f"invalid chunk-affinity {args.chunk_affinity!r} "
                "(balanced|host)")

    entries = []
    if args.filter_file:
        from ..stages.filters import read_filter_file

        entries = read_filter_file(args.filter_file)
    seeds = seed_urls(args.hosts)
    if args.seeds:
        with open(args.seeds) as f:
            seeds = [line.strip() for line in f if line.strip()]
    cfg = CrawlConfig(
        out_dir=args.out, seeds=seeds, num_parts=args.parts,
        seen_mode=args.seen_mode, seen_partition=args.seen_partition,
        rate=args.rate, burst=args.burst,
        max_rounds=args.rounds, n_hosts=args.hosts, max_degree=args.degree,
        n_images=args.images, html=not args.no_html,
        filter_mode=args.filter_mode, filter_entries=entries,
        fetch_concurrency=args.concurrency,
        chunk_affinity=args.chunk_affinity,
        spill_threshold=args.spill_threshold,
        retry_limit=args.retry_limit,
    )
    return cfg, args.resume


def main(argv=None) -> None:
    """CLI entry for ``ray job submit -- python -m scraper_ray.pipelines.crawl …``.

    Owns its Ray session (guarded — the driver-contract functions never init).
    """
    import json as _json

    cfg, resume = parse_cli(argv)

    import ray

    if not ray.is_initialized():
        # honour RAY_ADDRESS so `ray job submit` / an existing cluster is
        # used when present (the north-rule deployment mode); local
        # otherwise. The sandbox presets RAY_ADDRESS=local.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    res = run_crawl(cfg, resume=resume)
    res.pop("_shards", None)
    res.pop("metrics", None)
    print(_json.dumps(res, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()
