"""Fetch + link-routing stage bodies for ``map_batches``.

``Fetcher`` is the actor-pool stage (callable class → one instance per actor;
state built once in ``__init__``): it resolves each frontier URL through a
pluggable :class:`~scraper_ray.stages.downloader.Downloader` (the seam
mirroring the reference's HTTP downloader trait,
`/root/reference/worker/src/traits.rs:46-48` / `downloader.rs:26-41`). The
default is the deterministic synthetic-web downloader, which enforces
robots.txt and serves each page's image+caption payload zero-copy from the
broadcast images table (``ray.put`` once on the driver, ``ray.get`` once per
actor); a deployment plugs in an HTTP client via
``stages.downloader.HTTPDownloader``.

``LinkRouter`` is the downstream stage: per PAGE (the reference normalises and
dedups per resolved page, `worker/src/worker.rs:85-133`) it extracts links
(document order), canonicalizes with keep-first dedup, applies the host
filter, then routes the surviving candidate links to their host-partition
StateShard for the atomic seen-set anti-join + frontier insert. It emits one
funnel-count summary row per input batch — the reference's monotone funnel
``extracted → normalised → filtered → culled → submitted``
(`worker/src/metrics/influx_client.rs:117-130`).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64_batch, part_of, priority_of
from ..functions.urlnorm import canonicalize_batch
from .extract import extract_links
from .filters import HostFilter

def _retries_of(batch: pa.Table):
    """Per-row attempt counts of a wave batch (None when the caller built a
    plain frontier batch without the column — all attempt 0)."""
    if "retries" in batch.column_names:
        return batch["retries"].to_numpy(zero_copy_only=False)
    return None


FETCH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("round", pa.int32()),
        ("error_kind", pa.string()),
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("body", pa.string()),
        ("links", pa.list_(pa.string())),
        ("download_ms", pa.float64()),
    ]
)


class Fetcher:
    def __init__(
        self,
        images_ref=None,
        web_cfg: dict | None = None,
        round_idx: int = 0,
        fail_mod: int = 0,
        verify_decode: bool = False,
        downloader=None,
        downloader_factory=None,
    ):
        """``downloader`` is the pluggable resolver seam
        (stages/downloader.py, mirroring `worker/src/traits.rs:46-48`);
        default = the deterministic SynthWebDownloader over the broadcast
        images table (``ray.get`` once per actor). ``downloader_factory``
        is the remote-friendly form: a picklable zero-arg callable invoked
        INSIDE the actor (per-actor client state — sockets, token buckets —
        must not be built on the driver and shipped)."""
        self.verify_decode = verify_decode
        self.round_idx = round_idx
        if downloader is None and downloader_factory is not None:
            downloader = downloader_factory()
        if downloader is None:
            import ray

            from .downloader import SynthWebDownloader

            images = (
                ray.get(images_ref)
                if isinstance(images_ref, ray.ObjectRef)
                else images_ref
            )
            downloader = SynthWebDownloader(images, web_cfg or {}, fail_mod)
        self.dl = downloader
        # retained for crawl-config plumbing (SynthWeb-backed pools only)
        self.web = getattr(downloader, "web", None)
        # the per-row attempt hint is advisory — downloaders keeping the
        # plain (urls, hosts) seam signature never see it
        import inspect

        self._dl_retry_aware = (
            "retries" in inspect.signature(downloader.fetch_batch).parameters)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        depths = batch["depth"].to_pylist()
        retries = _retries_of(batch)
        if not self.dl.html_mode:
            return self._call_vectorized(urls, hosts, depths, t0, retries)
        # html mode: ONE batched resolve (robots/failure/payload-index in a
        # single hashing pass), then per-page work is only the html render +
        # downstream parse — the inherently per-page part
        pb, bodies = self.dl.fetch_batch_html(urls, hosts, retries)
        return self._assemble(urls, hosts, depths, pb, bodies, t0)

    def _verify(self, idx: int) -> bool:
        """Per-row archive invariant during fetch (BASELINE.json input_hint):
        decode the payload and check exact pixels (lossless) / PSNR ≥ 40 dB
        (lossy) against the regenerable ground truth. Deliberately uncached —
        the stand-in for decoding genuinely distinct fetched content."""
        from ..functions import codec
        from ..sources.fixtures import index_of_image_id

        dl = self.dl
        gt = codec.gen_pixels(index_of_image_id(dl.image_id[idx]))
        try:
            px = codec.decode(dl.blob[idx], dl.fmt[idx])
        except Exception:
            return False
        if px.shape != gt.shape:
            return False
        if dl.fmt[idx] == "lqi":
            return codec.psnr(gt, px) >= 40.0
        return bool(np.array_equal(px, gt))

    def _call_vectorized(self, urls, hosts, depths, t0, retries=None):
        """Direct (non-HTML) mode: one batched downloader resolve —
        the scale path; bit-identical outputs to the scalar loop."""
        tv0 = time.perf_counter()
        pb = (self.dl.fetch_batch(urls, hosts, retries)
              if self._dl_retry_aware else self.dl.fetch_batch(urls, hosts))
        return self._assemble(urls, hosts, depths, pb, None, t0, tv0)

    def _assemble(self, urls, hosts, depths, pb, bodies, t0, tv0=None):
        """Row-aligned FETCH_SCHEMA table from a PageBatch (+ optional html
        bodies). Shared by the direct and html paths; per-row conditionals
        only in the cheap list builds."""
        n = len(urls)
        dl = self.dl
        tv1 = time.perf_counter()
        err_kinds = np.asarray(pb.error_kind, dtype=object)
        ok = err_kinds == ""
        idxs = pb.payload_idx
        # ok-with-no-payload (idx < 0) is part of the PageBatch contract
        # (fetch_one returns ('', -1, body) for payload-less pages): never
        # index the store with a negative handle — Python's negative indexing
        # would silently attach the LAST page's payload (see the fetch_one
        # fix above; this mirrors it for the batch path)
        has_payload = ok & (idxs >= 0)
        if self.verify_decode:
            bad = np.zeros(n, dtype=bool)
            for i in np.nonzero(has_payload)[0]:
                if not self._verify(int(idxs[i])):
                    bad[i] = True
            if bad.any():
                err_kinds = np.where(bad, "DecodeError", err_kinds)
                ok &= ~bad
                has_payload &= ~bad
        tv2 = time.perf_counter()
        if os.environ.get("SCRAPER_RAY_DEBUG_TIMING"):
            import sys

            print(f"[fetchtiming] r={self.round_idx} rows={n} "
                  f"pagegen={tv1 - (tv0 or t0):.3f} verify={tv2 - tv1:.3f}",
                  file=sys.stderr, flush=True)
        if bool(np.array_equal(has_payload, ok)):
            # fast path (the common case: every ok row has a payload) —
            # no per-row payload conditional in the hot loop
            def col(store):
                return [store[idxs[i]] if ok[i] else None for i in range(n)]
        else:
            hp = has_payload

            def col(store):
                return [store[idxs[i]] if hp[i] else None for i in range(n)]

        cols = {
            "error_kind": err_kinds.tolist(),
            "body": ([""] * n if bodies is None else
                     [bodies[i] if ok[i] else "" for i in range(n)]),
            "image_id": col(dl.image_id),
            "bytes": col(dl.blob),
            "w": col(dl.w),
            "h": col(dl.h),
            "fmt": col(dl.fmt),
            "caption": col(dl.caption),
            "phash": col(dl.phash),
            "links": [pb.links[i] if ok[i] else [] for i in range(n)],
        }
        ms = (time.perf_counter() - t0) * 1000.0
        per_row = ms / max(n, 1)
        return pa.table(
            {
                "url": urls,
                "host": hosts,
                "depth": pa.array(depths, pa.int32()),
                "round": pa.array([self.round_idx] * n, pa.int32()),
                "error_kind": cols["error_kind"],
                "image_id": cols["image_id"],
                "bytes": pa.array(cols["bytes"], pa.binary()),
                "w": pa.array(cols["w"], pa.int32()),
                "h": pa.array(cols["h"], pa.int32()),
                "fmt": cols["fmt"],
                "caption": cols["caption"],
                "phash": pa.array(cols["phash"], pa.int64()),
                "body": cols["body"],
                "links": pa.array(cols["links"], pa.list_(pa.string())),
                "download_ms": pa.array([per_row] * n, pa.float64()),
            },
            schema=FETCH_SCHEMA,
        )


SUMMARY_SCHEMA = pa.schema(
    [
        ("pages", pa.int64()),
        ("errors", pa.int64()),
        ("retried", pa.int64()),
        ("archive_ms", pa.float64()),
        ("extracted_links", pa.int64()),
        ("normalised_links", pa.int64()),
        ("filtered_links", pa.int64()),
        ("culled_links", pa.int64()),
        ("submitted_links", pa.int64()),
        ("download_ms", pa.float64()),
        ("extract_ms", pa.float64()),
        ("normalise_ms", pa.float64()),
        ("filter_ms", pa.float64()),
        ("culling_ms", pa.float64()),
    ]
)


class LinkRouter:
    def __init__(self, shard_handles: list, filter_cfg: dict, num_parts: int,
                 blocking: bool = True, seen_partition: str = "host"):
        self.shards = shard_handles
        self.filter = HostFilter.from_dict(filter_cfg)
        self.num_parts = num_parts
        # 'host': combined seen+frontier shard per host partition (one hop).
        # 'url': seen set keyed by url_hash (uniform under hot-host skew),
        #        frontier forwarded shard-to-shard to its host partition.
        self.seen_partition = seen_partition
        # blocking=False: return shard futures instead of ray.get-ing them —
        # a worker blocked in ray.get spin-waits and burns a core while its
        # pool-mates compute; the driver resolves the futures at the round
        # barrier instead (it has to wait for the round anyway)
        self.blocking = blocking
        self.pending_futs: list = []

    def __call__(self, batch: pa.Table) -> pa.Table:
        rnd = batch["round"][0].as_py() if batch.num_rows else 0
        return self.route_pages(
            batch["url"].to_pylist(),
            batch["body"].to_pylist(),
            batch["links"].to_pylist(),
            batch["error_kind"].to_pylist(),
            rnd + 1,
            float(pa.compute.sum(batch["download_ms"]).as_py() or 0.0),
        )

    def route_pages(self, urls, bodies, link_lists, errors, child_depth: int,
                    dl_sum: float, retried: int = 0) -> pa.Table:
        import ray

        extracted = normalised = filtered = nerrors = 0
        t_extract = t_norm = t_filter = 0.0
        cand_urls: list[str] = []
        cand_hosts: list[str] = []
        for i in range(len(urls)):
            if errors[i]:
                nerrors += 1
                continue
            t0 = time.perf_counter()
            raw = extract_links(bodies[i], urls[i]) if bodies[i] else (link_lists[i] or [])
            t1 = time.perf_counter()
            canon, hosts = canonicalize_batch(raw)  # per-page keep-first dedup
            t2 = time.perf_counter()
            keep = self.filter
            for u, h in zip(canon, hosts):
                if keep.keep(h):
                    cand_urls.append(u)
                    cand_hosts.append(h)
            t3 = time.perf_counter()
            extracted += len(raw)
            normalised += len(canon)
            t_extract += t1 - t0
            t_norm += t2 - t1
            t_filter += t3 - t2
        filtered = len(cand_urls)

        t0 = time.perf_counter()
        culled = submitted = 0
        if cand_urls:
            hashes = hash64_batch(cand_urls)
            prios = priority_of(hashes)
            if self.seen_partition == "url":
                parts = part_of(hashes, self.num_parts)
            else:
                parts = part_of(hash64_batch(cand_hosts), self.num_parts)
            cand = pa.table({
                "url": pa.array(cand_urls, pa.string()),
                "host": pa.array(cand_hosts, pa.string()),
                "url_hash": pa.array(hashes),
                "priority": pa.array(prios),
                # depth = round discovered (deterministic under concurrent
                # discovery, unlike parent-depth+1 which depends on which
                # chunk's shard call lands first)
                "depth": pa.array([child_depth] * len(cand_urls), pa.int32()),
            })
            method = ("check_and_route" if self.seen_partition == "url"
                      else "check_and_insert_table")
            futs = []
            for p in np.unique(parts):
                idx = np.nonzero(parts == p)[0]
                futs.append(
                    getattr(self.shards[int(p)], method).remote(cand.take(idx))
                )
            if self.blocking:
                inner = []
                touched = [int(p) for p in np.unique(parts)]
                for res in ray.get(futs):
                    culled += res["culled"]
                    if "futs" in res:
                        inner.extend(res["futs"])
                    else:
                        submitted += res.get("submitted", 0)
                if self.seen_partition == "url":
                    # flush the touched shards' per-round forward buffers —
                    # blocking mode has no round barrier to do it at
                    for res in ray.get([self.shards[p].flush_forwards.remote()
                                        for p in touched]):
                        inner.extend(res["futs"])
                for r2 in ray.get(inner):
                    submitted += r2["submitted"]
            else:
                self.pending_futs.extend(futs)
        t_cull = time.perf_counter() - t0

        return self._summary_row(len(urls), nerrors, 0.0, extracted, normalised,
                                 filtered, culled, submitted, dl_sum,
                                 t_extract * 1000, t_norm * 1000,
                                 t_filter * 1000, t_cull * 1000,
                                 retried=retried)

    @staticmethod
    def _summary_row(pages, nerrors, archive_ms, extracted, normalised,
                     filtered, culled, submitted, dl_sum, extract_ms,
                     normalise_ms, filter_ms, culling_ms,
                     retried: int = 0) -> pa.Table:
        return pa.table(
            {
                "pages": pa.array([pages], pa.int64()),
                "errors": pa.array([nerrors], pa.int64()),
                "retried": pa.array([retried], pa.int64()),
                "archive_ms": pa.array([archive_ms], pa.float64()),
                "extracted_links": pa.array([extracted], pa.int64()),
                "normalised_links": pa.array([normalised], pa.int64()),
                "filtered_links": pa.array([filtered], pa.int64()),
                "culled_links": pa.array([culled], pa.int64()),
                "submitted_links": pa.array([submitted], pa.int64()),
                "download_ms": pa.array([dl_sum], pa.float64()),
                "extract_ms": pa.array([extract_ms], pa.float64()),
                "normalise_ms": pa.array([normalise_ms], pa.float64()),
                "filter_ms": pa.array([filter_ms], pa.float64()),
                "culling_ms": pa.array([culling_ms], pa.float64()),
            },
            schema=SUMMARY_SCHEMA,
        )


class WaveWorker(Fetcher):
    """The fused per-wave stage: fetch + archive-fragment write + link
    routing, one actor pool, one dataset execution per wave.

    Fusing matters at scale: the image payload bytes are written straight to
    the archive fragment from the actor that fetched them — they never
    re-enter the object store, are never materialized wave-wide, and the
    archive write parallelizes across the pool. Fragment files are named
    ``b<uuid>`` under ``archive/round=NNNN/``; the driver deletes a replayed
    round's directory before re-running it, so resume stays idempotent.
    """

    def __init__(self, images_ref, web_cfg: dict, round_idx: int,
                 fail_mod: int, shard_handles: list, filter_cfg: dict,
                 num_parts: int, archive_dir: str, errors_dir: str,
                 verify_decode: bool = False, seen_partition: str = "host",
                 downloader=None, downloader_factory=None,
                 retry_limit: int = 0):
        super().__init__(images_ref, web_cfg, round_idx, fail_mod,
                         verify_decode, downloader=downloader,
                         downloader_factory=downloader_factory)
        self.router = LinkRouter(shard_handles, filter_cfg, num_parts,
                                 seen_partition=seen_partition)
        self.archive_dir = archive_dir
        self.errors_dir = errors_dir
        # bounded transient-error requeue (the reference's *intended* Reject
        # semantics, errors.rs:89-183 — its actual requeue flag is bugged to
        # false, rmqredis.rs:230-251; retry_limit=0 reproduces that drop)
        self.retry_limit = retry_limit

    def _retry_idx(self, batch: pa.Table, err_kinds: np.ndarray) -> np.ndarray:
        """Row indices to requeue: transient error kind AND attempt budget
        left. ``err_kinds`` is the row-aligned object array of error kinds
        ('' = ok)."""
        if not self.retry_limit:
            return np.empty(0, dtype=np.int64)
        from ..functions.errors import TRANSIENT_KINDS

        transient = np.isin(err_kinds, list(TRANSIENT_KINDS))
        if not transient.any():
            return np.empty(0, dtype=np.int64)
        retries = _retries_of(batch)
        if retries is None:
            retries = np.zeros(len(err_kinds), dtype=np.int32)
        return np.nonzero(transient & (retries < self.retry_limit))[0]

    def _requeue(self, batch: pa.Table, retry_idx: np.ndarray) -> None:
        """Route transiently-failed wave rows back to their host-partition
        shard's frontier with retries+1 (StateShard.reinsert skips the seen
        anti-join — the rows are frontier members by construction). Futures
        join the router's non-blocking set so the driver's round barrier
        guarantees the requeue lands before the next drain."""
        import ray

        from ..state.shard import FRONTIER_SCHEMA

        sub = batch.take(pa.array(retry_idx))
        urls = sub["url"].to_pylist()
        hosts = sub["host"].to_pylist()
        if "priority" in sub.column_names:
            prios = sub["priority"].to_numpy(zero_copy_only=False)
        else:  # plain frontier batch: priority is a pure url-hash function
            prios = priority_of(hash64_batch(urls))
        rets = _retries_of(sub)
        rets = (np.zeros(len(urls), dtype=np.int32) if rets is None
                else np.asarray(rets, dtype=np.int32)) + 1
        t = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "priority": pa.array(np.asarray(prios, np.float32)),
                "depth": sub["depth"].cast(pa.int32()),
                "retries": pa.array(rets),
            },
            schema=FRONTIER_SCHEMA,
        )
        parts = part_of(hash64_batch(hosts), self.router.num_parts)
        futs = []
        for p in np.unique(parts):
            idx = np.nonzero(parts == p)[0]
            futs.append(
                self.router.shards[int(p)].reinsert.remote(t.take(idx)))
        if self.router.blocking:
            ray.get(futs)
        else:
            self.router.pending_futs.extend(futs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..pipelines.crawl import ARCHIVE_COLUMNS
        from ..sources.tableio import append_fragment

        t_f0 = time.perf_counter()
        fetched = super().__call__(batch)
        t0 = time.perf_counter()
        if self.retry_limit:
            err_kinds = np.asarray(fetched["error_kind"].to_pylist(),
                                   dtype=object)
            retry_idx = self._retry_idx(batch, err_kinds)
        else:  # default path stays pure-Arrow: no per-row Python walk
            err_kinds = None
            retry_idx = np.empty(0, dtype=np.int64)
        ok_mask = pc.equal(fetched["error_kind"], "")
        ok_rows = fetched.filter(ok_mask).select(ARCHIVE_COLUMNS)
        t1 = time.perf_counter()
        rdir = os.path.join(self.archive_dir, f"round={self.round_idx:04d}")
        if ok_rows.num_rows:
            append_fragment(ok_rows, rdir)
        t2 = time.perf_counter()
        # terminal errors only: rows being requeued are neither archived nor
        # error rows — they re-enter the frontier via _requeue below
        if err_kinds is not None:
            term = np.asarray(err_kinds != "")
            term[retry_idx] = False
            term_mask = pa.array(term)
        else:
            term_mask = pc.invert(ok_mask)
        err_rows = fetched.filter(term_mask).select(
            ["url", "host", "round", "depth", "error_kind"]
        )
        if err_rows.num_rows:
            append_fragment(
                err_rows,
                os.path.join(self.errors_dir, f"round={self.round_idx:04d}"),
            )
        archive_ms = (time.perf_counter() - t0) * 1000.0
        if os.environ.get("SCRAPER_RAY_DEBUG_TIMING"):
            import sys

            print(
                f"[wavetiming] r={self.round_idx} rows={batch.num_rows} "
                f"fetch={t0 - t_f0:.3f} filter={t1 - t0:.3f} "
                f"write={t2 - t1:.3f}",
                file=sys.stderr, flush=True,
            )
        if len(retry_idx):
            self._requeue(batch, retry_idx)
            # blank the requeued rows for the router: page attempt counted,
            # no links followed, NOT a terminal error
            errors = err_kinds.tolist()
            bodies = fetched["body"].to_pylist()
            links = fetched["links"].to_pylist()
            for i in retry_idx:
                errors[i] = ""
                bodies[i] = ""
                links[i] = []
            summary = self.router.route_pages(
                fetched["url"].to_pylist(), bodies, links, errors,
                self.round_idx + 1,
                float(pc.sum(fetched["download_ms"]).as_py() or 0.0),
                retried=len(retry_idx),
            )
        else:
            summary = self.router(fetched)
        return summary.set_column(
            summary.schema.get_field_index("archive_ms"), "archive_ms",
            pa.array([archive_ms], pa.float64()),
        )


class WaveWorkerPool(WaveWorker):
    """Persistent-pool variant: the crawl driver creates these actors ONCE and
    dispatches wave chunks to them every round.

    Why not a fresh ``map_batches`` actor pool per wave: Ray gives each actor
    a dedicated process that dies with the pool, so an N-actor pool re-created
    every round costs N process spawns + interpreter imports per round — at 28
    actors × 7 rounds that overhead exceeded the wave compute by an order of
    magnitude (measured: 32-CPU run 4× *slower* than 8-CPU). The iterative
    frontier feedback loop is exactly the case where the Dataset API's
    per-pipeline pools don't fit and raw long-lived actors are warranted;
    everything inside a wave is still zero-copy Arrow batches.
    """

    def __init__(self, **kw):
        super().__init__(round_idx=0, **kw)
        self.router.blocking = False

    def process_spans(self, spans: list, round_idx: int) -> dict:
        """Resolve + slice wave ObjectRefs worker-side and run the fused wave
        stage on the result.

        ``spans`` is ``[(table_ref, offset, length), …]`` — the driver routes
        REFERENCES of the shard-drained wave tables (it never ``ray.get``s
        them), and each worker pulls only here. ``ray.get`` of the same ref
        is plasma-cached per node and the slice/concat is zero-copy, so a
        chunk spanning a shard boundary costs no row copies. Replaces the
        old driver-side concat+slice data-plane hop (round-3 verdict item 1).
        """
        import ray

        parts = [ray.get(ref).slice(off, ln) for ref, off, ln in spans]
        batch = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        return self.process(batch, round_idx)

    def process(self, batch: pa.Table, round_idx: int) -> dict:
        self.round_idx = round_idx
        if self.dl.html_mode:
            t = self(batch)
        else:
            t = self._process_direct(batch)
        out = {col: t[col][0].as_py() for col in t.column_names}
        out["shard_futs"] = self.router.pending_futs
        self.router.pending_futs = []
        return out

    def _process_direct(self, batch: pa.Table) -> pa.Table:
        """Direct-mode fused path with no intermediate wide Arrow table.

        The generic path builds the full 15-column fetched table (16+ MB of
        binary per chunk), filters it twice and re-walks it in the router —
        measured at 3-5× the useful compute on big waves. Here the archive
        fragment is built once straight from the broadcast blob references and
        the link lists stay in-process Python objects.
        """
        from ..sources.tableio import append_fragment

        t_all0 = time.perf_counter()
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        depths = batch["depth"].to_pylist()
        n = len(urls)
        dl = self.dl
        pb = (dl.fetch_batch(urls, hosts, _retries_of(batch))
              if self._dl_retry_aware else dl.fetch_batch(urls, hosts))
        err_kinds = np.asarray(pb.error_kind, dtype=object)
        ok = err_kinds == ""
        img_idx = pb.payload_idx
        # PageBatch contract: ok rows may carry no payload (idx < 0) — never
        # index the store with a negative handle (mirrors _call_vectorized)
        has_payload = ok & (img_idx >= 0)
        if self.verify_decode:
            for i in np.nonzero(has_payload)[0]:
                if not self._verify(int(img_idx[i])):
                    ok[i] = False
                    has_payload[i] = False
                    err_kinds[i] = "DecodeError"
        dl_ms = (time.perf_counter() - t_all0) * 1000.0

        t0 = time.perf_counter()
        t_build = t_write = 0.0
        ok_idx = np.nonzero(ok)[0]
        if len(ok_idx):
            if bool(np.array_equal(has_payload, ok)):
                # fast path: every ok row has a payload — numpy fancy index,
                # no per-row conditionals (the SynthWeb/bench hot loop)
                gi = img_idx[ok_idx]

                def col(store):
                    return [store[j] for j in gi]
            else:
                gi = [int(img_idx[i]) if has_payload[i] else -1 for i in ok_idx]

                def col(store):
                    return [store[j] if j >= 0 else None for j in gi]

            # every column EXPLICITLY typed: an all-None payload chunk
            # (payload-less ok rows) would otherwise infer arrow `null`
            # columns and write a schema-divergent archive fragment
            archive = pa.table({
                "url": pa.array([urls[i] for i in ok_idx], pa.string()),
                "host": pa.array([hosts[i] for i in ok_idx], pa.string()),
                "round": pa.array([self.round_idx] * len(ok_idx), pa.int32()),
                "depth": pa.array([depths[i] for i in ok_idx], pa.int32()),
                "image_id": pa.array(col(dl.image_id), pa.string()),
                "bytes": pa.array(col(dl.blob), pa.binary()),
                "w": pa.array(col(dl.w), pa.int32()),
                "h": pa.array(col(dl.h), pa.int32()),
                "fmt": pa.array(col(dl.fmt), pa.string()),
                "caption": pa.array(col(dl.caption), pa.string()),
                "phash": pa.array(col(dl.phash), pa.int64()),
            })
            t_build = time.perf_counter() - t0
            append_fragment(
                archive,
                os.path.join(self.archive_dir, f"round={self.round_idx:04d}"),
            )
            t_write = time.perf_counter() - t0 - t_build
            if os.environ.get("SCRAPER_RAY_DEBUG_TIMING"):
                import sys

                print(f"[archtiming] r={self.round_idx} rows={len(ok_idx)} "
                      f"build={t_build:.3f} write={t_write:.3f}",
                      file=sys.stderr, flush=True)
        retry_idx = self._retry_idx(batch, np.where(ok, "", err_kinds))
        retry_mask = np.zeros(n, dtype=bool)
        retry_mask[retry_idx] = True
        bad_idx = np.nonzero(~ok & ~retry_mask)[0]
        if len(bad_idx):
            kinds = [err_kinds[i] for i in bad_idx]
            append_fragment(
                pa.table({
                    "url": pa.array([urls[i] for i in bad_idx], pa.string()),
                    "host": pa.array([hosts[i] for i in bad_idx], pa.string()),
                    "round": pa.array([self.round_idx] * len(bad_idx), pa.int32()),
                    "depth": pa.array([depths[i] for i in bad_idx], pa.int32()),
                    "error_kind": pa.array(kinds, pa.string()),
                }),
                os.path.join(self.errors_dir, f"round={self.round_idx:04d}"),
            )
        if len(retry_idx):
            self._requeue(batch, retry_idx)
        archive_ms = (time.perf_counter() - t0) * 1000.0

        # retried rows: page attempt counted, no links, NOT a terminal error
        err_marks = ["" if (ok[i] or retry_mask[i]) else "x" for i in range(n)]
        summary = self.router.route_pages(
            urls, [""] * n, [pb.links[i] if ok[i] else [] for i in range(n)],
            err_marks, self.round_idx + 1, dl_ms,
            retried=len(retry_idx),
        )
        return summary.set_column(
            summary.schema.get_field_index("archive_ms"), "archive_ms",
            pa.array([archive_ms], pa.float64()),
        )
