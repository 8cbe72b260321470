"""Fetch + link-routing stage bodies for ``map_batches``.

``Fetcher`` is the actor-pool stage (callable class → one instance per actor;
state built once in ``__init__``): it resolves each frontier URL against the
deterministic synthetic web (the sandbox stand-in for the reference's HTTP
downloader, `/root/reference/worker/src/downloader.rs:26-41`), enforces
robots.txt via a per-actor robots cache, and attaches the page's image+caption
payload drawn zero-copy from the broadcast images table (``ray.put`` once on
the driver, ``ray.get`` once per actor).

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

import time

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64_batch, part_of, priority_of
from ..functions.urlnorm import canonicalize_batch
from ..sources.synthweb import SynthWeb, SynthWebConfig
from .extract import extract_links
from .filters import HostFilter

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
        images_ref,
        web_cfg: dict,
        round_idx: int = 0,
        fail_mod: int = 0,
    ):
        import ray

        images = (
            ray.get(images_ref)
            if isinstance(images_ref, ray.ObjectRef)
            else images_ref
        )
        # column-wise python lists once per actor; rows are tiny and access is O(1)
        self.image_id = images["image_id"].to_pylist()
        self.blob = images["bytes"].to_pylist()
        self.w = images["w"].to_pylist()
        self.h = images["h"].to_pylist()
        self.fmt = images["fmt"].to_pylist()
        self.caption = images["caption"].to_pylist()
        self.phash = images["phash"].to_pylist()
        cfg = SynthWebConfig(**{**web_cfg, "n_images": len(self.image_id)})
        self.web = SynthWeb(cfg)
        self.round_idx = round_idx
        self.fail_mod = fail_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        depths = batch["depth"].to_pylist()
        n = len(urls)
        cols: dict[str, list] = {k: [] for k in (
            "error_kind", "image_id", "bytes", "w", "h", "fmt", "caption",
            "phash", "body", "links",
        )}
        web = self.web
        from ..functions.hashing import hash64

        for i in range(n):
            url = urls[i]
            err = ""
            if web.is_disallowed(url):
                err = "RobotsDisallowed"
            elif self.fail_mod and hash64("fail::" + url) % self.fail_mod == 0:
                # deterministic injected transient failure — the reference maps
                # network errors to Reject, whose requeue flag is bugged to
                # false (rmqredis.rs:230-251), i.e. the task is dropped; we
                # reproduce the *actual* behaviour and record the error row.
                err = "NetworkError"
            if err:
                cols["error_kind"].append(err)
                cols["image_id"].append(None)
                cols["bytes"].append(None)
                cols["w"].append(None)
                cols["h"].append(None)
                cols["fmt"].append(None)
                cols["caption"].append(None)
                cols["phash"].append(None)
                cols["body"].append("")
                cols["links"].append([])
                continue
            idx = web.image_index(url)
            cols["error_kind"].append("")
            cols["image_id"].append(self.image_id[idx])
            cols["bytes"].append(self.blob[idx])
            cols["w"].append(self.w[idx])
            cols["h"].append(self.h[idx])
            cols["fmt"].append(self.fmt[idx])
            cols["caption"].append(self.caption[idx])
            cols["phash"].append(self.phash[idx])
            if web.cfg.html:
                cols["body"].append(web.html(url))
                cols["links"].append([])
            else:
                cols["body"].append("")
                cols["links"].append(web.out_links(url))
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
    def __init__(self, shard_handles: list, filter_cfg: dict, num_parts: int):
        self.shards = shard_handles
        self.filter = HostFilter.from_dict(filter_cfg)
        self.num_parts = num_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        urls = batch["url"].to_pylist()
        bodies = batch["body"].to_pylist()
        link_lists = batch["links"].to_pylist()
        errors = batch["error_kind"].to_pylist()
        depths = batch["depth"].to_pylist()

        extracted = normalised = filtered = nerrors = 0
        t_extract = t_norm = t_filter = 0.0
        cand_urls: list[str] = []
        cand_hosts: list[str] = []
        cand_depths: list[int] = []
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
                    cand_depths.append(depths[i] + 1)
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
            host_hashes = hash64_batch(cand_hosts)
            parts = part_of(host_hashes, self.num_parts)
            futs = []
            for p in np.unique(parts):
                idx = np.nonzero(parts == p)[0]
                futs.append(
                    self.shards[int(p)].check_and_insert.remote(
                        [cand_urls[j] for j in idx],
                        [cand_hosts[j] for j in idx],
                        hashes[idx],
                        prios[idx],
                        [cand_depths[j] for j in idx],
                    )
                )
            for res in ray.get(futs):
                culled += res["culled"]
                submitted += res["submitted"]
        t_cull = time.perf_counter() - t0

        dl = batch["download_ms"]
        dl_sum = float(pa.compute.sum(dl).as_py() or 0.0)
        return pa.table(
            {
                "pages": pa.array([len(urls)], pa.int64()),
                "errors": pa.array([nerrors], pa.int64()),
                "extracted_links": pa.array([extracted], pa.int64()),
                "normalised_links": pa.array([normalised], pa.int64()),
                "filtered_links": pa.array([filtered], pa.int64()),
                "culled_links": pa.array([culled], pa.int64()),
                "submitted_links": pa.array([submitted], pa.int64()),
                "download_ms": pa.array([dl_sum], pa.float64()),
                "extract_ms": pa.array([t_extract * 1000], pa.float64()),
                "normalise_ms": pa.array([t_norm * 1000], pa.float64()),
                "filter_ms": pa.array([t_filter * 1000], pa.float64()),
                "culling_ms": pa.array([t_cull * 1000], pa.float64()),
            },
            schema=SUMMARY_SCHEMA,
        )
