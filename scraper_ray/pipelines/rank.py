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
   exchange. The result is RETURNED AS A DATASET — the edge list never
   lands on the driver.

2. **PageRank** (`pagerank`) runs on RAW Ray tasks over hash-partitioned
   numpy state — the documented case where the Dataset API genuinely
   doesn't fit (per-iteration mutable rank vectors with a global barrier).
   Everything host-count-sized stays in the object store end-to-end:

   - *Preprocessing* runs as tasks over the edge Dataset's block refs:
     per-block host extraction → per-partition vocabulary union (sorted
     unique, returned as a ref; only its SIZE is resolved), per-block edge
     split → per-src-partition bundling (out-degree normalization, local
     src indices, dangling set) → per-dst-partition dst localization.
     Each task touches ONE host partition's vocabulary, never the whole.
   - *Iteration*: P contribution tasks (``num_returns=P+1`` — one
     contribution-array ref per destination partition plus the dangling
     scalar) feed P combine tasks (``num_returns=2`` — the new rank ref
     and the partition's L1 delta) DIRECTLY as ObjectRef args; the driver
     resolves ONLY the P dangling scalars and P delta scalars per
     iteration.
   - *Finalize*: one task concatenates (host, rank) remotely; the driver
     resolves exactly the result DataFrame (the deliverable).

   Contributions are summed in fixed partition-index order and bundle
   edges are sorted by (src, dst), so a given P is bit-deterministic
   across runs and worker schedules (different P regroup float sums and
   agree to ~1e-12, asserted in tests against a dense numpy oracle;
   ``tests/test_rank.py`` also monkeypatches driver ``ray.get`` to assert
   no rank/contribution array is ever resolved driver-side).

Scale notes: rank state and edge bundles live in the object store
partitioned by host hash — nothing host-count-sized ever broadcasts or
lands on the driver (the driver moves only per-iteration scalars); at
10^8 hosts raise ``num_parts`` so each partition's rank vector fits a
task's heap. The per-partition fan-in args (one chunk per input block)
would switch to a tree reduce at very high block counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hpart(strings, num_parts: int) -> np.ndarray:
    """Host → partition id; the ONE partition function shared by every
    stage (vocabulary build, edge split, dst localization)."""
    from ..functions.hashing import hash64_batch

    return (hash64_batch(list(strings))
            % np.uint64(num_parts)).astype(np.int64)


def host_edges_from_crawl(out_dir: str, web_cfg: dict,
                          num_parts: int = 16):
    """(src, dst, weight) host-level edge Dataset from a finished crawl's
    archive (ok pages only — error/disallowed pages were never parsed).
    Lazy; nothing edge-list-sized reaches the driver."""
    import os

    import ray.data as rd

    from ..functions.hashing import hash64_batch
    from ..sources.synthweb import SynthWeb, SynthWebConfig

    # built ONCE here and captured by the closure (tiny, picklable) —
    # not re-constructed per batch
    web = SynthWeb(SynthWebConfig(**{**web_cfg, "n_images": 1}))

    def edges(t: pa.Table) -> pa.Table:
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
            .map_groups(combine, batch_format="pandas"))


# --------------------------------------------------------------------------
# preprocessing tasks (driver resolves only partition SIZES from these)

def _block_hosts(block, num_parts: int):
    """Per-block: sorted unique hosts split by partition → P arrays."""
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block)
    hs = np.unique(np.concatenate([
        block["src"].to_numpy(zero_copy_only=False).astype(object),
        block["dst"].to_numpy(zero_copy_only=False).astype(object)]))
    # +1 trailing dummy so num_returns=P+1 ≥ 2 even at P=1 (Ray does not
    # unpack a tuple when num_returns == 1)
    if len(hs) == 0:
        return tuple([None] * (num_parts + 1))
    part = _hpart(hs, num_parts)
    return tuple(hs[part == q] if (part == q).any() else None
                 for q in range(num_parts)) + (None,)


def _union_hosts(*arrs):
    """Per-partition: union of the block host arrays → (vocab ref, size).
    The vocabulary stays remote; the driver resolves the size only."""
    arrs = [a for a in arrs if a is not None and len(a)]
    if not arrs:
        empty = np.empty(0, dtype=object)
        return empty, 0
    hosts = np.unique(np.concatenate(arrs))
    return hosts, len(hosts)


def _block_edges(block, num_parts: int):
    """Per-block: (src, dst, weight) split by SRC partition → P frames."""
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block)
    df = pd.DataFrame({
        "src": block["src"].to_numpy(zero_copy_only=False).astype(object),
        "dst": block["dst"].to_numpy(zero_copy_only=False).astype(object),
        "weight": block["weight"].to_numpy(zero_copy_only=False)
        .astype(np.float64),
    })
    if len(df) == 0:
        return tuple([None] * (num_parts + 1))  # trailing dummy (see above)
    part = _hpart(df["src"], num_parts)
    return tuple(df[part == p] if (part == p).any() else None
                 for p in range(num_parts)) + (None,)


def _bundle_src(hosts_p, num_parts: int, *chunks):
    """Per-src-partition: aggregate duplicate (src, dst) pairs, sort by
    (src, dst) — the fixed order that makes a given P bit-deterministic —
    normalize by out-degree, and split by DST partition. Returns P chunks
    of (src_local, dst_strings, w_norm) (or None) plus the partition's
    dangling local indices."""
    chunks = [c for c in chunks if c is not None and len(c)]
    size = len(hosts_p)
    if not chunks:
        return tuple([None] * num_parts) + (np.empty(0, dtype=np.int64)
                                            if size == 0
                                            else np.arange(size),)
    df = (pd.concat(chunks, ignore_index=True)
          .groupby(["src", "dst"], as_index=False)["weight"].sum()
          .sort_values(["src", "dst"], ignore_index=True))
    src_local = np.searchsorted(hosts_p, df["src"].to_numpy(dtype=object))
    w = df["weight"].to_numpy(dtype=np.float64)
    out_w = np.zeros(size)
    np.add.at(out_w, src_local, w)
    w_norm = w / out_w[src_local]
    dangling = np.flatnonzero(out_w == 0.0)
    dpart = _hpart(df["dst"], num_parts)
    out = []
    for q in range(num_parts):
        m = dpart == q
        out.append((src_local[m], df["dst"].to_numpy(dtype=object)[m],
                    w_norm[m]) if m.any() else None)
    return tuple(out) + (dangling,)


def _localize_dst(hosts_q, num_parts: int, *chunks_by_src_part):
    """Per-dst-partition: convert dst strings to local indices within this
    partition's vocabulary → one finished (src_local, dst_local, w) bundle
    per source partition (or None)."""
    out = []
    for ch in chunks_by_src_part:
        if ch is None or len(ch[0]) == 0:
            out.append(None)
            continue
        s, dst, wn = ch
        out.append((s, np.searchsorted(hosts_q, dst), wn))
    return tuple(out) + (None,)  # trailing dummy (see _block_hosts)


# --------------------------------------------------------------------------
# iteration tasks (driver resolves only dangling-mass and delta SCALARS)

def _init_rank(size: int, n_total: int):
    return np.full(size, 1.0 / n_total)


def _contrib(rank_p, dangling_idx, sizes, *bundles_to_q):
    """One source partition's contributions: per-destination-partition
    arrays (P refs via num_returns) + the dangling-mass scalar."""
    out = []
    for q, b in enumerate(bundles_to_q):
        if b is None:
            out.append(None)
            continue
        s, d, wn = b
        c = np.zeros(sizes[q])
        np.add.at(c, d, rank_p[s] * wn)
        out.append(c)
    dm = float(rank_p[dangling_idx].sum())
    return tuple(out) + (dm,)


def _combine(old_rank, size, n_total, damping, dangling_mass, *contribs):
    """One destination partition's new rank vector (stays remote) + its
    L1 delta (the only value the driver resolves)."""
    new = np.zeros(size)
    for c in contribs:  # fixed partition-index order → deterministic
        if c is not None:
            new += c
    new = ((1.0 - damping) / n_total
           + damping * (new + dangling_mass / n_total))
    return new, float(np.abs(new - old_rank).sum())


def _finalize(num_parts: int, *hosts_and_ranks):
    hosts = hosts_and_ranks[:num_parts]
    ranks = hosts_and_ranks[num_parts:]
    keep = [p for p in range(num_parts) if len(hosts[p])]
    return (pd.DataFrame({
        "host": np.concatenate([hosts[p] for p in keep]),
        "rank": np.concatenate([ranks[p] for p in keep]),
    }).sort_values("host").reset_index(drop=True))


def pagerank(edges, damping: float = 0.85,
             tol: float = 1e-12, max_iters: int = 100,
             num_parts: int = 8) -> pd.DataFrame:
    """Distributed PageRank on (src, dst, weight) edges — a Dataset (the
    scale path) or a small DataFrame (tests). Returns (host, rank) over
    every host appearing as a source or destination, ranks summing to 1.
    See module docstring for the execution model; the driver resolves
    per-iteration scalars and the final result DataFrame, nothing else."""
    import ray
    import ray.data as rd

    P = num_parts
    if isinstance(edges, pd.DataFrame):
        if len(edges) == 0:
            return pd.DataFrame({"host": pd.Series([], dtype=object),
                                 "rank": pd.Series([], dtype="float64")})
        edges = rd.from_pandas(edges)
    block_refs = edges.to_arrow_refs()

    block_hosts = ray.remote(_block_hosts)
    union_hosts = ray.remote(_union_hosts)
    block_edges = ray.remote(_block_edges)
    bundle_src = ray.remote(_bundle_src)
    localize_dst = ray.remote(_localize_dst)
    init_rank = ray.remote(_init_rank)
    contrib = ray.remote(_contrib)
    combine = ray.remote(_combine)
    finalize = ray.remote(_finalize)

    # vocabulary: per-block split → per-partition union; resolve SIZES only
    bh = [block_hosts.options(num_returns=P + 1).remote(b, P)
          for b in block_refs]
    hu = [union_hosts.options(num_returns=2).remote(
        *(bh[i][q] for i in range(len(bh)))) for q in range(P)]
    host_refs = [h for h, _ in hu]
    sizes = ray.get([s for _, s in hu])
    n = int(sum(sizes))
    if n == 0:
        return pd.DataFrame({"host": pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype="float64")})

    # edges: per-block split by src part → per-src-part bundles (+dangling)
    # → per-dst-part localization; everything stays remote
    be = [block_edges.options(num_returns=P + 1).remote(b, P)
          for b in block_refs]
    bs = [bundle_src.options(num_returns=P + 1).remote(
        host_refs[p], P, *(be[i][p] for i in range(len(be))))
        for p in range(P)]
    dangling = [bs[p][P] for p in range(P)]
    ld = [localize_dst.options(num_returns=P + 1).remote(
        host_refs[q], P, *(bs[p][q] for p in range(P))) for q in range(P)]
    # bundles[p][q] = edges from src-part p into dst-part q (or None)
    bundles = [[ld[q][p] for q in range(P)] for p in range(P)]

    rank_refs = [init_rank.remote(sizes[p], n) for p in range(P)]
    for _ in range(max_iters):
        outs = [contrib.options(num_returns=P + 1).remote(
            rank_refs[p], dangling[p], sizes, *bundles[p])
            for p in range(P)]
        dmass = float(sum(ray.get([outs[p][P] for p in range(P)])))
        comb = [combine.options(num_returns=2).remote(
            rank_refs[q], sizes[q], n, damping, dmass,
            *(outs[p][q] for p in range(P))) for q in range(P)]
        rank_refs = [c[0] for c in comb]
        delta = float(sum(ray.get([c[1] for c in comb])))
        if delta < tol:
            break

    return ray.get(finalize.remote(P, *host_refs, *rank_refs))
