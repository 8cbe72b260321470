"""Distributed PageRank over the crawled host graph — the iterative-
algorithm pattern composed on top of the crawl engine's output.

Two stages:

1. **Edge extraction** (`host_edges_from_crawl`) is a Ray Data pipeline:
   the archive's (url, host) columns stream through ``map_batches`` where
   each page's out-links are regenerated deterministically from
   :class:`~scraper_ray.sources.synthweb.SynthWeb` (the crawl never stores
   links — they are consumed during routing; a real-web deployment would
   extract edges in the fetch stage instead), per-batch pre-aggregated to
   (src_host, dst_host, weight) and reduced through one coarse hash
   exchange. The edge list is the materialization point — standard for
   iterative graph algorithms, and orders of magnitude smaller than the
   page corpus.

2. **PageRank** (`pagerank`) runs on RAW Ray tasks over hash-partitioned
   numpy state — the documented case where the Dataset API genuinely
   doesn't fit (per-iteration mutable rank vectors with a global
   barrier). Hosts hash into P partitions; each partition's out-edges are
   grouped by destination partition ONCE up front (normalized weights,
   local integer indices) and ``ray.put`` as immutable bundles. Every
   iteration is: P contribution tasks (vectorized ``np.add.at`` per
   destination partition — the only data moved is one float array per
   (src-part, dst-part) pair with edges), a scalar dangling-mass reduce,
   and P combine tasks that apply damping. Contributions are summed in
   fixed partition-index order, so a given P is bit-deterministic across
   runs and worker schedules (different P regroup float sums and agree to
   ~1e-12, asserted in tests against a dense numpy oracle).

Scale notes: rank state and edge bundles live in the object store
partitioned by host hash — nothing host-count-sized ever broadcasts or
lands on the driver (the driver moves only per-iteration scalars); at
10^8 hosts raise ``num_parts`` so each partition's rank vector fits a
task's heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def host_edges_from_crawl(out_dir: str, web_cfg: dict,
                          num_parts: int = 16) -> pd.DataFrame:
    """(src, dst, weight) host-level edge list from a finished crawl's
    archive (ok pages only — error/disallowed pages were never parsed)."""
    import os

    import ray.data as rd

    from ..functions.hashing import hash64_batch
    from ..sources.synthweb import SynthWeb, SynthWebConfig

    cfg = SynthWebConfig(**{**web_cfg, "n_images": 1})

    def edges(t: pa.Table) -> pa.Table:
        web = SynthWeb(cfg)
        urls = t["url"].to_pylist()
        hosts = t["host"].to_pylist()
        _, links, _ = web.page_batch(urls, hosts)
        srcs, dsts = [], []
        for i, ls in enumerate(links):
            if not ls:
                continue
            srcs.extend([hosts[i]] * len(ls))
            # synth links are absolute http://host/path — netloc is field 2
            dsts.extend(u.split("/")[2] for u in ls)
        if not srcs:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             "weight": pa.array([], pa.int64()),
                             "_pkey": pa.array([], pa.int32())})
        g = (pd.DataFrame({"src": srcs, "dst": dsts})
             .groupby(["src", "dst"]).size().reset_index(name="weight"))
        pk = (hash64_batch(g["src"].tolist())
              % np.uint64(num_parts)).astype(np.int32)
        return pa.table({
            "src": pa.array(g["src"], pa.string()),
            "dst": pa.array(g["dst"], pa.string()),
            "weight": pa.array(g["weight"].to_numpy(np.int64)),
            "_pkey": pa.array(pk),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["src", "dst"], as_index=False)["weight"].sum())

    return (rd.read_parquet(os.path.join(out_dir, "archive"),
                            columns=["url", "host"])
            .map_batches(edges, batch_format="pyarrow", batch_size=4096)
            .groupby("_pkey")
            .map_groups(combine, batch_format="pandas")
            .to_pandas())


def pagerank(edges: pd.DataFrame, damping: float = 0.85,
             tol: float = 1e-12, max_iters: int = 100,
             num_parts: int = 8) -> pd.DataFrame:
    """Distributed PageRank on (src, dst, weight) edges; returns
    (host, rank) over every host appearing as a source or destination,
    ranks summing to 1. See module docstring for the execution model."""
    import ray

    from ..functions.hashing import hash64_batch

    hosts = np.unique(np.concatenate([
        edges["src"].to_numpy(dtype=object),
        edges["dst"].to_numpy(dtype=object)]))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype="float64")})
    part_of = (hash64_batch(hosts.tolist())
               % np.uint64(num_parts)).astype(np.int64)
    # per-partition sorted host lists + global->local index
    part_hosts = [hosts[part_of == p] for p in range(num_parts)]
    local_idx = np.empty(n, dtype=np.int64)
    for p in range(num_parts):
        local_idx[part_of == p] = np.arange(len(part_hosts[p]))

    hidx = {h: i for i, h in enumerate(hosts)}
    src_g = edges["src"].map(hidx).to_numpy(dtype=np.int64)
    dst_g = edges["dst"].map(hidx).to_numpy(dtype=np.int64)
    w = edges["weight"].to_numpy(dtype=np.float64)
    out_w = np.zeros(n)
    np.add.at(out_w, src_g, w)
    w_norm = w / out_w[src_g]

    # per (src-part p, dst-part q) edge bundles: (src_local, dst_local, w)
    bundles: dict[int, list] = {}
    sp, dp = part_of[src_g], part_of[dst_g]
    for p in range(num_parts):
        bundles[p] = []
        for q in range(num_parts):
            m = (sp == p) & (dp == q)
            if m.any():
                bundles[p].append((q, ray.put((
                    local_idx[src_g[m]], local_idx[dst_g[m]], w_norm[m]))))
    # local_idx within a partition is assigned in masked-global order, so
    # out_w[part_of == p] is already in local order
    dangling = [ray.put(np.flatnonzero(out_w[part_of == p] == 0))
                for p in range(num_parts)]
    sizes = [len(part_hosts[p]) for p in range(num_parts)]

    @ray.remote
    def contrib_task(rank_p, bundle_list, dangling_idx, size_map):
        out = []
        for q, ref in bundle_list:
            s, d, wn = ray.get(ref)
            c = np.zeros(size_map[q])
            np.add.at(c, d, rank_p[s] * wn)
            out.append((q, c))
        dm = float(rank_p[dangling_idx].sum())
        return out, dm

    @ray.remote
    def combine_task(contrib_arrays, size, n_total, damping, dangling_mass):
        new = np.zeros(size)
        for c in contrib_arrays:  # fixed partition-index order → deterministic
            new += c
        new = ((1.0 - damping) / n_total
               + damping * (new + dangling_mass / n_total))
        return new

    ranks = [ray.put(np.full(sizes[p], 1.0 / n)) for p in range(num_parts)]
    for _ in range(max_iters):
        step = ray.get([contrib_task.remote(ranks[p], bundles[p],
                                            dangling[p], sizes)
                        for p in range(num_parts)])
        dangling_mass = sum(dm for _, dm in step)
        incoming: list[list] = [[] for _ in range(num_parts)]
        for p in range(num_parts):  # p-order append → deterministic sum order
            for q, c in step[p][0]:
                incoming[q].append(c)
        new_refs = [combine_task.remote(incoming[p], sizes[p], n, damping,
                                        dangling_mass)
                    for p in range(num_parts)]
        new = ray.get(new_refs)
        old = ray.get(ranks)
        delta = sum(float(np.abs(new[p] - old[p]).sum())
                    for p in range(num_parts))
        ranks = [ray.put(new[p]) for p in range(num_parts)]
        if delta < tol:
            break

    final = ray.get(ranks)
    return (pd.DataFrame({
        "host": np.concatenate([part_hosts[p] for p in range(num_parts)
                                if sizes[p]]) if n else [],
        "rank": np.concatenate([final[p] for p in range(num_parts)
                                if sizes[p]]),
    }).sort_values("host").reset_index(drop=True))
