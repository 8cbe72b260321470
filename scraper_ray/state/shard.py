"""StateShard: one actor per hash partition owning seen-set + frontier state.

The reference splits this state across two network services — a RabbitMQ
``frontier`` queue (`/root/reference/worker/src/rmqredis.rs:126-151`) and a
Redis ``collection`` set (`rmqredis.rs:267-290`) — with an asynchronous
registration path between them that races (SURVEY.md §3.4). Here one actor
owns both for its partition (``part = hash64(host) % P``), so membership check
+ seen insert + frontier insert are a single atomic ``check_and_insert`` call
(the reference's *intent*: "prevents work duplications", traits.rs:36).

Host-affinity (all URLs of a host live in one shard) is what makes per-host
politeness single-owner: the shard's token buckets are the only ones that can
release that host's URLs into a wave.

Frontier = per-host priority heaps; drain order is the engine's canonical
deterministic order ``(-priority, url)`` per host, politeness-budgeted by a
per-host token bucket refilled once per wave. Cold overflow spills to Parquet
(``spill_threshold``) so a 10^10-URL frontier never has to fit in heap memory.

This class is deliberately Ray-free: the driver wraps it with
``ray.remote(StateShard)`` and tests drive it in-process.
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .seen import SeenSet

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.float32()),
        ("depth", pa.int32()),
        # bounded transient-retry counter (the reference's *intended* Reject
        # semantics, errors.rs:89-183: network/server errors requeue). 0 for
        # fresh links; incremented by reinsert() on each requeue.
        ("retries", pa.int32()),
    ]
)


class StateShard:
    def __init__(
        self,
        part: int,
        num_parts: int,
        seen_mode: str = "exact",
        seen_capacity: int = 1 << 20,
        rate: float = 2.0,
        burst: float = 4.0,
        spill_threshold: int = 2_000_000,
        spill_dir: str | None = None,
    ):
        self.part = part
        self.num_parts = num_parts
        self.seen = SeenSet(seen_mode, seen_capacity)
        # host -> heap of (-priority, url, depth, retries); url is unique
        # within a heap, so depth/retries never participate in ordering
        self.pending: dict[str, list] = {}
        self.pending_count = 0
        self.tokens: dict[str, float] = {}
        self.rate = rate
        self.burst = burst
        self.spill_threshold = spill_threshold
        self.spill_dir = spill_dir
        self._spill_files: list[str] = []
        self._spilled_rows = 0
        # cold-frontier fence: host -> max priority among its spilled rows.
        # A drain can provably skip unspilling a host whose in-memory top-k
        # all strictly outrank the fence (see drain()); this is what lets a
        # 10^10-row frontier's cold tier SURVIVE drains instead of paying a
        # full unspill-read every wave.
        self._spill_fence: dict[str, float] = {}
        self.unspill_events = 0
        self.spill_events = 0
        self.spilled_rows_total = 0
        self.inserted_total = 0
        self.drained_total = 0
        self.retried_total = 0
        self._fwd_buf: dict[int, list] = {}  # url-mode per-peer forward buffer

    # -- ingest -------------------------------------------------------------
    def check_and_insert(self, urls, hosts, hashes, priorities, depths) -> dict:
        """Atomic anti-join + frontier insert (J1 + K1 of SURVEY.md §2.2).

        Duplicates *within the call* are collapsed first (the caller batches
        arbitrary link rows). Returns funnel counts for this call.
        """
        n = len(urls)
        if n == 0:
            return {"culled": 0, "submitted": 0}
        first_idx: dict[str, int] = {}
        order: list[int] = []
        for i, u in enumerate(urls):
            if u not in first_idx:
                first_idx[u] = i
                order.append(i)
        uniq_urls = [urls[i] for i in order]
        uniq_hashes = np.asarray(hashes, dtype=np.uint64)[order]
        new_mask = self.seen.check_and_insert(uniq_urls, uniq_hashes)
        submitted = 0
        for j in np.nonzero(new_mask)[0]:
            i = order[int(j)]
            host = hosts[i]
            heapq.heappush(
                self.pending.setdefault(host, []),
                (-float(priorities[i]), urls[i], int(depths[i]), 0),
            )
            self.pending_count += 1
            submitted += 1
        self.inserted_total += submitted
        if self.pending_count > self.spill_threshold and self.spill_dir:
            self._spill()
        return {"culled": submitted, "submitted": submitted}

    def set_peers(self, handles: list) -> None:
        """Peer shard handles for the url-partitioned (skew-aware) mode."""
        self._peers = handles

    def frontier_insert(self, t: pa.Table) -> dict:
        """Insert already-deduplicated, already-seen-checked frontier rows
        (columns url, host, priority, depth) — the frontier half of the
        url-partitioned path. Politeness/drain stays host-affine here."""
        urls = t["url"].to_pylist()
        hosts = t["host"].to_pylist()
        prios = t["priority"].to_pylist()
        depths = t["depth"].to_pylist()
        for u, h, p, d in zip(urls, hosts, prios, depths):
            heapq.heappush(self.pending.setdefault(h, []),
                           (-float(p), u, int(d), 0))
        self.pending_count += len(urls)
        self.inserted_total += len(urls)
        if self.pending_count > self.spill_threshold and self.spill_dir:
            self._spill()
        return {"submitted": len(urls)}

    def reinsert(self, t: pa.Table) -> dict:
        """Requeue transiently-failed wave rows (columns url, host, priority,
        depth, retries — retries ALREADY incremented by the caller) into the
        frontier WITHOUT a seen-set check: the rows were drained from this
        frontier, so they are already members and the anti-join would drop
        them. This is the reference's *intended* Reject outcome
        (`errors.rs:89-183` maps network/server errors to Reject = requeue;
        its requeue flag is bugged to false, `rmqredis.rs:230-251` — the
        engine's ``retry_limit=0`` default reproduces that actual behaviour,
        ``retry_limit>0`` enables the intent with a bound)."""
        urls = t["url"].to_pylist()
        hosts = t["host"].to_pylist()
        prios = t["priority"].to_pylist()
        depths = t["depth"].to_pylist()
        rets = t["retries"].to_pylist()
        for u, h, p, d, k in zip(urls, hosts, prios, depths, rets):
            heapq.heappush(self.pending.setdefault(h, []),
                           (-float(p), u, int(d), int(k)))
        self.pending_count += len(urls)
        self.retried_total += len(urls)
        if self.pending_count > self.spill_threshold and self.spill_dir:
            self._spill()
        # shaped like the anti-join results so the driver's barrier loop can
        # resolve all shard futures uniformly (adds 0 to the funnel)
        return {"culled": 0, "submitted": 0, "retried": len(urls)}

    def check_and_route(self, t: pa.Table) -> dict:
        """Skew-aware two-level path: this shard owns the ``url_hash % P``
        partition of the SEEN SET (uniform even under hot-host skew — a host
        producing 30% of links no longer concentrates its membership checks
        on one actor); new rows are BUFFERED per host-partition peer and
        flushed once per round (``flush_forwards`` at the round barrier) —
        forwarding per routing call costs ~P tiny actor messages per call
        (measured ~2× the whole crawl at sandbox scale); batching sends one
        table per (shard, peer) pair per round. Still atomic per URL: the
        seen-check happens here, synchronously."""
        import numpy as np

        from ..functions.hashing import hash64_batch, part_of

        urls = t["url"].to_pylist()
        hashes = t["url_hash"].to_numpy(zero_copy_only=False)
        # dedup within call (keep-first)
        first: dict[str, int] = {}
        order: list[int] = []
        for i, u in enumerate(urls):
            if u not in first:
                first[u] = i
                order.append(i)
        uniq = [urls[i] for i in order]
        new_mask = self.seen.check_and_insert(
            uniq, np.asarray(hashes, dtype="uint64")[order]
        )
        new_idx = [order[int(j)] for j in np.nonzero(new_mask)[0]]
        if new_idx:
            sub = t.take(new_idx).select(["url", "host", "priority", "depth"])
            hosts = sub["host"].to_pylist()
            parts = part_of(hash64_batch(hosts), self.num_parts)
            for p in np.unique(parts):
                idx = np.nonzero(parts == p)[0]
                self._fwd_buf.setdefault(int(p), []).append(sub.take(idx))
        return {"culled": len(new_idx)}

    def flush_forwards(self) -> dict:
        """Send this round's buffered frontier forwards — ONE
        ``frontier_insert`` per destination peer — and return the futures
        (the driver resolves them before the next drain). Heap insertion is
        order-insensitive (drain order is a pure function of heap content),
        so batching does not change any result."""
        futs = []
        for p, tables in self._fwd_buf.items():
            futs.append(self._peers[p].frontier_insert.remote(
                pa.concat_tables(tables)))
        self._fwd_buf = {}
        return {"futs": futs}

    def check_and_insert_table(self, t: pa.Table) -> dict:
        """Arrow-table call path (columns url, host, url_hash, priority,
        depth) — tables serialize near-zero-copy through the object store,
        unlike python string lists."""
        return self.check_and_insert(
            t["url"].to_pylist(),
            t["host"].to_pylist(),
            t["url_hash"].to_numpy(zero_copy_only=False),
            t["priority"].to_numpy(zero_copy_only=False),
            t["depth"].to_numpy(zero_copy_only=False),
        )

    # -- drain --------------------------------------------------------------
    def drain(self, refill: bool = True, max_rows: int | None = None,
              order_sink: str | None = None,
              round_idx: int = 0) -> pa.Table:
        """One politeness-budgeted wave drain, deterministic order.

        Each host's token bucket is refilled by ``rate`` (capped at ``burst``)
        once per wave; ``floor(tokens)`` URLs per host are released, highest
        priority first (ties by url). Returned table is sorted by
        ``(-priority, host, url)`` — the engine's canonical wave order.

        ``order_sink``: directory to write this shard's order fragment into
        (``part=NNNN.parquet`` with the sort keys). The canonical GLOBAL wave
        order is derived from the fragments at read time
        (``pipelines.crawl.read_order``) — the shards each sort their own
        slice in parallel and the driver never concat+sorts the wave.
        """
        if self._spill_files:
            # selective unspill via per-host priority fences: a host's
            # spilled rows all have priority <= its fence, so if the host's
            # in-memory heap can cover this drain's whole token budget with
            # rows STRICTLY above the fence, the drained set is provably
            # identical to the always-unspill result (strictness matters:
            # at a priority tie the url tiebreak could promote a spilled
            # row). Hosts that fail the check — including hosts with no
            # in-memory rows at all — are folded back in; the rest of the
            # cold tier survives the drain untouched (zero I/O in the
            # common all-cold case). Byte-equality with the always-unspill
            # drain is pinned by test_spill_is_order_transparent and
            # test_shard.py's fence tests.
            need: set[str] = set()
            for host, fence in self._spill_fence.items():
                heap = self.pending.get(host)
                if not heap:
                    need.add(host)
                    continue
                toks = self.tokens.get(host, 0.0)
                k = int(min(self.burst, toks + self.rate) if refill else toks)
                if max_rows is not None:
                    k = min(k, max_rows)
                if k <= 0:
                    continue  # no rows releasable for this host this wave
                if len(heap) < k:
                    need.add(host)
                    continue
                kth_best_prio = -heapq.nsmallest(k, heap)[-1][0]
                if kth_best_prio <= fence:
                    need.add(host)
            if need:
                self._unspill(need)
        rows: list[tuple[float, str, str, int, int]] = []
        budget_left = max_rows if max_rows is not None else 1 << 62
        if refill:
            # refill EVERY pending host's bucket up front — refilling inside
            # the drain loop would skip hosts after a max_rows budget break,
            # starving them of tokens wave after wave
            for host in self.pending:
                self.tokens[host] = min(
                    self.burst, self.tokens.get(host, 0.0) + self.rate
                )
        for host in sorted(self.pending.keys()):
            if budget_left <= 0:
                break
            heap = self.pending[host]
            avail = int(self.tokens.get(host, 0.0))
            take = min(avail, len(heap), budget_left)
            for _ in range(take):
                negp, url, depth, ret = heapq.heappop(heap)
                rows.append((-negp, host, url, depth, ret))
            if take:
                self.tokens[host] = self.tokens.get(host, 0.0) - take
                self.pending_count -= take
                budget_left -= take
            if not heap:
                del self.pending[host]
        rows.sort(key=lambda r: (-r[0], r[1], r[2]))
        self.drained_total += len(rows)
        out = pa.table(
            {
                "url": [r[2] for r in rows],
                "host": [r[1] for r in rows],
                "priority": pa.array([r[0] for r in rows], pa.float32()),
                "depth": pa.array([r[3] for r in rows], pa.int32()),
                "retries": pa.array([r[4] for r in rows], pa.int32()),
            },
            schema=FRONTIER_SCHEMA,
        )
        if order_sink is not None and out.num_rows:
            pq.write_table(
                pa.table({
                    "url": out["url"],
                    "host": out["host"],
                    "priority": out["priority"],
                    "round": pa.array([round_idx] * out.num_rows, pa.int32()),
                }),
                os.path.join(order_sink, f"part={self.part:04d}.parquet"),
            )
        return out

    def drain_wave(self, refill: bool = True, max_rows: int | None = None,
                   order_sink: str | None = None,
                   round_idx: int = 0) -> tuple[pa.Table, int]:
        """:meth:`drain` returning ``(table, num_rows)`` as TWO values.

        The crawl driver calls this with ``num_returns=2`` so the wave table
        stays in the object store (the driver resolves only the row count and
        routes the table's ObjectRef to pool workers). This mirrors the
        reference's broker-mediated dataflow (`rmqredis.rs:213-257`) where the
        coordinator never touches page rows — at 10^6+ hosts a per-round
        ``ray.get`` of every shard's wave through one driver process is the
        multi-node bottleneck.
        """
        t = self.drain(refill, max_rows, order_sink, round_idx)
        return t, t.num_rows

    def frontier_size(self) -> int:
        return self.pending_count + self._spilled_rows

    def stats(self) -> dict:
        return {
            "part": self.part,
            "pending": self.pending_count,
            "spill_files": len(self._spill_files),
            "spill_events": self.spill_events,
            "unspill_events": self.unspill_events,
            "spilled_rows_total": self.spilled_rows_total,
            "seen": len(self.seen),
            "seen_bytes": self.seen.nbytes(),
            "inserted_total": self.inserted_total,
            "drained_total": self.drained_total,
            "retried_total": self.retried_total,
        }

    # -- spill --------------------------------------------------------------
    def _frontier_table(self) -> pa.Table:
        urls, hosts, prios, depths, rets = [], [], [], [], []
        for host, heap in sorted(self.pending.items()):
            for negp, url, depth, ret in sorted(heap):
                urls.append(url)
                hosts.append(host)
                prios.append(-negp)
                depths.append(depth)
                rets.append(ret)
        return pa.table(
            {
                "url": urls,
                "host": hosts,
                "priority": pa.array(prios, pa.float32()),
                "depth": pa.array(depths, pa.int32()),
                "retries": pa.array(rets, pa.int32()),
            },
            schema=FRONTIER_SCHEMA,
        )

    def _spill(self) -> None:
        """Spill the lower-priority half of every host's heap to Parquet."""
        os.makedirs(self.spill_dir, exist_ok=True)
        urls, hosts, prios, depths, rets = [], [], [], [], []
        for host in list(self.pending.keys()):
            heap = self.pending[host]
            if len(heap) < 2:
                continue
            items = sorted(heap)  # ascending -priority = best first
            keep, cold = items[: len(items) // 2], items[len(items) // 2 :]
            self.pending[host] = keep
            heapq.heapify(self.pending[host])
            # fence = max spilled priority for the host (cold[0] is the
            # best of the cold half); drains consult it to decide whether
            # this host's spill can stay cold
            self._spill_fence[host] = max(self._spill_fence.get(host, -np.inf),
                                          -cold[0][0])
            for negp, url, depth, ret in cold:
                urls.append(url)
                hosts.append(host)
                prios.append(-negp)
                depths.append(depth)
                rets.append(ret)
        if not urls:
            return
        t = pa.table(
            {
                "url": urls,
                "host": hosts,
                "priority": pa.array(prios, pa.float32()),
                "depth": pa.array(depths, pa.int32()),
                "retries": pa.array(rets, pa.int32()),
            },
            schema=FRONTIER_SCHEMA,
        )
        path = os.path.join(
            self.spill_dir, f"part{self.part:04d}-spill{len(self._spill_files):04d}.parquet"
        )
        pq.write_table(t, path)
        self._spill_files.append(path)
        self.pending_count -= len(urls)
        self._spilled_rows += len(urls)
        self.spill_events += 1
        self.spilled_rows_total += len(urls)

    def _unspill(self, hosts: set | None = None) -> None:
        """Fold spilled rows back into the in-memory heaps. ``hosts=None``
        folds everything (checkpoint snapshots); a host set folds only
        those hosts' rows and REWRITES the remainder to a fresh spill file
        — bounded I/O proportional to the spill size, paid only on drains
        where some fence actually fails."""
        files, self._spill_files = self._spill_files, []
        keep_t: list[pa.Table] = []
        self.unspill_events += 1
        for path in files:
            t = pq.read_table(path)
            os.remove(path)
            if hosts is not None:
                mask = np.isin(
                    np.asarray(t["host"].to_pylist(), dtype=object),
                    list(hosts))
                keep = t.filter(pa.array(~mask))
                if keep.num_rows:
                    keep_t.append(keep)
                t = t.filter(pa.array(mask))
            for url, host, prio, depth, ret in zip(
                t["url"].to_pylist(),
                t["host"].to_pylist(),
                t["priority"].to_pylist(),
                t["depth"].to_pylist(),
                t["retries"].to_pylist(),
            ):
                heapq.heappush(
                    self.pending.setdefault(host, []), (-prio, url, depth, ret)
                )
                self.pending_count += 1
                self._spilled_rows -= 1
        if hosts is None:
            self._spilled_rows = 0
            self._spill_fence = {}
        else:
            for h in hosts:
                self._spill_fence.pop(h, None)
            if keep_t:
                merged = pa.concat_tables(keep_t)
                path = os.path.join(
                    self.spill_dir,
                    f"part{self.part:04d}-spill{self.spill_events:04d}"
                    f"-r{self.unspill_events:04d}.parquet")
                pq.write_table(merged, path)
                self._spill_files.append(path)

    # -- checkpoint ---------------------------------------------------------
    def checkpoint(self, ckpt_dir: str) -> str:
        """Write this shard's full state under ``ckpt_dir/part=NNNN/``."""
        d = os.path.join(ckpt_dir, f"part={self.part:04d}")
        os.makedirs(d, exist_ok=True)
        # snapshot = in-memory frontier + spill-file contents concatenated,
        # WITHOUT folding the spill back into memory — a per-round
        # checkpoint must not destroy the drain-surviving cold tier (and at
        # 10^10 rows the fold would be the checkpoint's memory cliff).
        # Restore rebuilds everything in-memory; future inserts re-spill.
        frontier = pa.concat_tables(
            [self._frontier_table()]
            + [pq.read_table(p) for p in self._spill_files])
        pq.write_table(frontier, os.path.join(d, "frontier.parquet.tmp"))
        os.replace(
            os.path.join(d, "frontier.parquet.tmp"), os.path.join(d, "frontier.parquet")
        )
        st = self.seen.state_dict()
        if st["mode"] == "exact":
            pq.write_table(
                pa.table({"url": st["urls"]}), os.path.join(d, "seen.parquet.tmp")
            )
            os.replace(os.path.join(d, "seen.parquet.tmp"), os.path.join(d, "seen.parquet"))
        else:
            np.savez_compressed(os.path.join(d, "seen.npz.tmp.npz"), **{
                k: v for k, v in st.items() if k != "mode"
            })
            os.replace(os.path.join(d, "seen.npz.tmp.npz"), os.path.join(d, "seen.npz"))
        meta = {
            "part": self.part,
            "tokens": self.tokens,
            "seen_mode": self.seen.mode,
            "inserted_total": self.inserted_total,
            "drained_total": self.drained_total,
            "retried_total": self.retried_total,
        }
        with open(os.path.join(d, "meta.json.tmp"), "w") as f:
            json.dump(meta, f)
        os.replace(os.path.join(d, "meta.json.tmp"), os.path.join(d, "meta.json"))
        return d

    def restore(self, ckpt_dir: str) -> None:
        d = os.path.join(ckpt_dir, f"part={self.part:04d}")
        with open(os.path.join(d, "meta.json")) as f:
            meta = json.load(f)
        self.tokens = {k: float(v) for k, v in meta["tokens"].items()}
        self.inserted_total = int(meta["inserted_total"])
        self.drained_total = int(meta["drained_total"])
        # .get: pre-retry checkpoints carry no counter
        self.retried_total = int(meta.get("retried_total", 0))
        self.pending = {}
        self.pending_count = 0
        # a shard instance that previously spilled must drop that spill
        # state: the checkpoint snapshot already CONTAINS the spilled rows
        # (checkpoint concatenates memory + spill files), so stale spill
        # registrations would double-count frontier_size and fold duplicate
        # frontier URLs back in on the next fence-failing drain
        for path in self._spill_files:
            try:
                os.remove(path)
            except OSError:
                pass
        self._spill_files = []
        self._spilled_rows = 0
        self._spill_fence = {}
        t = pq.read_table(os.path.join(d, "frontier.parquet"))
        rets = (t["retries"].to_pylist() if "retries" in t.column_names
                else [0] * t.num_rows)  # pre-retry checkpoints
        for url, host, prio, depth, ret in zip(
            t["url"].to_pylist(), t["host"].to_pylist(),
            t["priority"].to_pylist(), t["depth"].to_pylist(), rets,
        ):
            heapq.heappush(self.pending.setdefault(host, []),
                           (-prio, url, depth, ret))
            self.pending_count += 1
        if meta["seen_mode"] == "exact":
            urls = pq.read_table(os.path.join(d, "seen.parquet"))["url"].to_pylist()
            self.seen.load_state_dict({"mode": "exact", "urls": urls})
        else:
            with np.load(os.path.join(d, "seen.npz")) as z:
                st = {k: z[k] for k in z.files}
            st["mode"] = "approx"
            self.seen.load_state_dict(st)

    def dump_seen(self) -> list[str]:
        """Exact-mode seen URLs of this shard (parity tests only)."""
        if self.seen.mode != "exact":
            raise RuntimeError("dump_seen requires seen_mode='exact'")
        return sorted(self.seen._set)

    def ping(self) -> int:
        return self.part
