"""Lance table IO with a Parquet-directory fallback.

The north rule archives image+caption pairs into Lance tables. ``lance`` /
``pylance`` is not installable in this offline sandbox, so all table IO goes
through this seam: if ``import lance`` works we use it, otherwise a directory
of Parquet fragments with the identical Arrow schema (same columns, same
types) — the layout difference is invisible to every caller.

Fragments are written atomically (temp file + rename) and named by the caller
(e.g. ``round=0003-part`` …) so a resumed run can idempotently overwrite the
fragments of a replayed round instead of duplicating them.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance unavailable in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def append_fragment(table: pa.Table, path: str, name: str | None = None) -> str:
    """Append ``table`` to the dataset at ``path``; returns the fragment uri."""
    if HAVE_LANCE:  # pragma: no cover
        lance.write_dataset(table, path, mode="append" if os.path.exists(path) else "create")
        return path
    os.makedirs(path, exist_ok=True)
    name = name or uuid.uuid4().hex[:12]
    frag = os.path.join(path, f"{name}.parquet")
    tmp = frag + f".tmp-{uuid.uuid4().hex[:6]}"
    pq.write_table(table, tmp)
    os.replace(tmp, frag)
    return frag


def read_table(path: str, columns: list[str] | None = None) -> pa.Table:
    if HAVE_LANCE and not os.path.isdir(path):  # pragma: no cover
        return lance.dataset(path).to_table(columns=columns)
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
        tables = [pq.read_table(p, columns=columns) for p in parts]
        if not tables:
            raise FileNotFoundError(f"no parquet fragments under {path}")
        return pa.concat_tables(tables)
    return pq.read_table(path, columns=columns)


def ray_dataset(path: str, columns: list[str] | None = None):
    """The dataset as a ``ray.data.Dataset`` (streaming read, column-pruned)."""
    import ray.data as rd

    if HAVE_LANCE and not os.path.isdir(path):  # pragma: no cover
        return rd.read_lance(path, columns=columns)
    return rd.read_parquet(path, columns=columns)


def compact_dataset(path: str, out_path: str, num_parts: int = 16,
                    key: str = "host") -> dict:
    """Compact the per-round fragment layout into ``num_parts`` key-hashed
    fragments — the small-file maintenance pass a long crawl needs (a bench
    crawl already leaves ~245 fragments for 175k pages; at 10^10 URLs the
    per-round layout is millions of files). One keyed exchange co-locates
    each host's pages (downstream per-host analytics read one fragment);
    each partition is written atomically by its own ``map_groups`` task, so
    size ``num_parts`` to the payload (bytes column included — partition ≈
    rows·row_bytes must fit a worker's heap; ~1 GB/partition is the
    target at scale).

    Resumable: a ``compact_manifest.json`` sidecar is written atomically
    BEFORE any fragment (config + source row count from parquet METADATA —
    no data read); finished fragments are skipped on rerun and a config
    mismatch refuses (the corpus pipeline's guard pattern). Source
    fragments are left untouched — the caller swaps directories once the
    returned ``rows_written == rows_source``; row-count equality is also
    asserted here.

    Single-writer: an O_EXCL ``compact.lock`` sentinel (holder pid inside)
    is taken before anything is written — a second concurrent invocation
    on the same out_path FAILS LOUDLY instead of interleaving fragment
    writes; a lock left by a crashed run (dead pid) is reclaimed.
    """
    # source row count from fragment metadata only (no payload read)
    frags = sorted(
        os.path.join(path, d, f)
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
        for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")
    ) if os.path.isdir(path) else []
    flat = [os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet")] if os.path.isdir(path) else []
    frags += flat
    if not frags:
        raise FileNotFoundError(f"no parquet fragments under {path}")
    n_source = sum(pq.ParquetFile(f).metadata.num_rows for f in frags)

    os.makedirs(out_path, exist_ok=True)
    lock_path = os.path.join(out_path, "compact.lock")
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                with open(lock_path) as f:
                    holder = int(f.read().strip() or 0)
            except (OSError, ValueError):
                holder = 0
            alive = False
            if holder:
                try:
                    os.kill(holder, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    alive = True
            if alive:
                raise RuntimeError(
                    f"compaction already running on {out_path} (pid "
                    f"{holder} holds {lock_path}); a concurrent second "
                    f"writer would interleave fragment writes — wait for "
                    f"it or use a fresh out_path")
            os.unlink(lock_path)  # stale lock from a crashed run — retry

    try:
        return _compact_locked(out_path, num_parts, key, frags, n_source)
    finally:
        try:
            os.unlink(lock_path)
        except OSError:
            pass


def _compact_locked(out_path: str, num_parts: int, key: str,
                    frags: list, n_source: int) -> dict:
    import json

    import numpy as np

    from ..functions.hashing import hash64_batch

    cfg = {"num_parts": num_parts, "key": key, "source_rows": n_source,
           "source_fragments": len(frags)}
    man_path = os.path.join(out_path, "compact_manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as f:
            prev = json.load(f)
        if prev != cfg:
            raise ValueError(
                f"compaction resume config/source mismatch: manifest has "
                f"{prev}, current run computes {cfg}; use a fresh out_path")
    else:
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cfg, f)
        os.replace(tmp, man_path)

    import ray.data as rd

    def tag(t: pa.Table) -> pa.Table:
        wk = (hash64_batch(t[key].to_pylist())
              % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("_ckey", pa.array(wk))

    def write_part(g: pa.Table) -> pa.Table:
        part = g["_ckey"][0].as_py()
        g = g.drop_columns(["_ckey"])
        final = os.path.join(out_path, f"part={part:04d}.parquet")
        if not os.path.exists(final):
            tmp = final + f".tmp-{uuid.uuid4().hex[:6]}"
            pq.write_table(g, tmp)
            os.replace(tmp, final)
        return pa.table({"part": pa.array([part], pa.int32()),
                         "rows": pa.array([g.num_rows], pa.int64())})

    written = (rd.read_parquet(frags)
               .map_batches(tag, batch_format="pyarrow")
               .groupby("_ckey")
               .map_groups(write_part, batch_format="pyarrow")
               .to_pandas())
    n_written = int(written["rows"].sum())
    if n_written != n_source:
        raise RuntimeError(
            f"compaction row mismatch: wrote {n_written}, source has "
            f"{n_source} — output at {out_path} must not replace the source")
    return {"rows": n_written, "fragments_in": len(frags),
            "fragments_out": int(written["part"].nunique()),
            "num_parts": num_parts, "key": key}


def main(argv=None) -> None:
    """CLI: ``python -m scraper_ray.sources.tableio --src <archive> --out
    <dir>`` (owns its Ray session, guarded)."""
    import argparse
    import json as _json

    p = argparse.ArgumentParser(description="archive fragment compaction")
    p.add_argument("--src", required=True, help="fragment dir (round=NNNN/ "
                   "subdirs and/or flat .parquet fragments)")
    p.add_argument("--out", required=True)
    p.add_argument("--parts", type=int, default=16)
    p.add_argument("--key", default="host")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    print(_json.dumps(compact_dataset(args.src, args.out, args.parts,
                                      args.key)))
    ray.shutdown()


if __name__ == "__main__":
    main()
