"""End-to-end corpus-cleaning pipeline over the ``documents`` table — the
composed training-data use case the individual query operators exist for:

    read → per-doc features (quality, lang-id, token counts, content hash)
         → exact dedup (keep-first by 128-bit content hash)
         → near-dup removal (MinHash+LSH pairs, drop the later doc)
         → quality threshold filter
         → partitioned parquet + funnel stats

Scale discipline:
- features are ONE fused ``map_batches`` pass (batch sketch kernels);
- exact dedup is one hash-partitioned exchange with a vectorized
  ``transform('min')`` keep decision per partition — no per-key groups;
- near-dup pairs come from the LSH candidate/verify machinery in
  ``pipelines.queries`` (distributed verify, capped buckets); the drop set
  (id_b of each verified pair) is aggregate-sized and broadcast;
- output is hash-partitioned parquet (``part=NNNN``), one directory per
  partition so an interrupted run can resume by skipping finished parts.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def clean_corpus(sf_dir: str, out_dir: str | None = None,
                 min_quality: float = 0.3, num_parts: int = 16) -> dict:
    """Run the cleaning pipeline; returns the funnel stats dict (and writes
    partitioned parquet + ``stats.json`` when ``out_dir`` is given)."""
    import ray

    from ..functions.hashing import hash64_batch
    from ..functions.textstats import (
        count_tokens_bpe, detect_lang, fingerprint_batch, quality_features,
        quality_score,
    )
    from .queries import _read, q_minhash_near_dup

    if out_dir and os.path.exists(os.path.join(out_dir, "stats.json")):
        # resume guard (mirrors crawl.py's manifest config check): finished
        # partitions are skipped on rerun, so the config that produced them
        # must match — otherwise stale rows would silently masquerade as
        # this run's output
        with open(os.path.join(out_dir, "stats.json")) as f:
            prev = json.load(f)
        for k, v in (("min_quality", min_quality), ("num_parts", num_parts)):
            if prev.get(k) != v:
                raise ValueError(
                    f"resume config mismatch on {k!r}: out_dir was written "
                    f"with {prev.get(k)!r}, current run has {v!r}; use a "
                    "fresh out_dir")

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def features(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        q, langs, bpe = [], [], []
        for x in texts:
            f = quality_features(x)
            q.append(round(quality_score(f), 6))
            langs.append(detect_lang(x))
            bpe.append(count_tokens_bpe(x))
        h1 = hash64_batch(texts)
        h2 = hash64_batch(["dedup2::" + x for x in texts])
        fps = fingerprint_batch(texts)
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "text": t["text"],
            "source": t["source"],
            "quality": pa.array(q, pa.float64()),
            "lang_pred": pa.array(langs, pa.string()),
            "n_tokens_bpe": pa.array(bpe, pa.int64()),
            "fingerprint": pa.array(fps.view(np.int64)),
            "h1": pa.array(h1.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
        })

    feat = docs.map_batches(features, batch_format="pyarrow", batch_size=1024)

    # exact dedup: hash-partition on content hash, vectorized keep-first
    # (doc_id == per-hash min) inside each partition — ONE exchange
    def tag_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pkey"] = (df["h1"].to_numpy().astype(np.uint64)
                       % np.uint64(num_parts)).astype("int32")
        return df

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        keep = g["doc_id"] == g.groupby(["h1", "h2"])["doc_id"].transform("min")
        return g.loc[keep].drop(columns=["_pkey"])

    exact = (feat.map_batches(tag_hash, batch_format="pandas")
             .groupby("_pkey")
             .map_groups(keep_first, batch_format="pandas"))

    # near-dup removal: verified MinHash pairs (id_a < id_b) → drop id_b —
    # the same operator exposed as queries.q_minhash_near_dup (ONE
    # implementation; a drifted copy here would silently diverge from the
    # tested pair semantics). The drop set is pair-sized → broadcast.
    pairs = q_minhash_near_dup(sf_dir)
    drop_ids = (sorted(set(pairs["id_b"].astype(int)))
                if len(pairs) else [])
    drop_ref = ray.put(pa.array(drop_ids, pa.int64()))

    import pyarrow.compute as pc

    def near_filter(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t["doc_id"], value_set=ray.get(drop_ref)))
        return t.filter(mask)

    # materialize the dedup output ONCE — the per-doc feature pass is the
    # dominant cost and both the count and the downstream write consume it
    exact = exact.materialize()
    n_after_exact = exact.count()
    near = exact.map_batches(near_filter, batch_format="pyarrow")

    # near-dup drops actually applied = drop ids still present AFTER exact
    # dedup (an id_b that was an exact-dup loser is already gone and must
    # not be double-counted in the funnel)
    def count_drops(t: pa.Table) -> pa.Table:
        hit = pc.sum(pc.cast(pc.is_in(t["doc_id"],
                                      value_set=ray.get(drop_ref)),
                             pa.int64())).as_py() or 0
        return pa.table({"n": pa.array([hit], pa.int64())})

    n_near_dropped = sum(
        r["n"] for r in
        exact.map_batches(count_drops, batch_format="pyarrow")
        .to_pandas().to_dict("records"))

    def quality_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["quality"], min_quality))

    cleaned = near.map_batches(quality_filter, batch_format="pyarrow")

    n_input = docs.count()

    # materialize the cleaned corpus once for count + optional write
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

        def write_part(g: pd.DataFrame) -> pd.DataFrame:
            part = int(g["_wkey"].iloc[0])
            path = os.path.join(out_dir, f"part={part:04d}")
            os.makedirs(path, exist_ok=True)
            final = os.path.join(path, "data.parquet")
            if os.path.exists(final):
                # resume: partition already written by a previous run — the
                # pipeline is deterministic, so skip it (atomic rename below
                # guarantees an existing file is complete)
                return pd.DataFrame({"part": [part],
                                     "rows": [pq.read_metadata(final).num_rows]})
            out = g.drop(columns=["_wkey"])
            tmp = final + ".tmp"
            pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
            os.replace(tmp, final)
            return pd.DataFrame({"part": [part], "rows": [len(out)]})

        def tag_out(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_wkey"] = (df["doc_id"] % num_parts).astype("int32")
            return df

        written = (cleaned.map_batches(tag_out, batch_format="pandas")
                   .groupby("_wkey")
                   .map_groups(write_part, batch_format="pandas")
                   .to_pandas())
        n_kept = int(written["rows"].sum())
    else:
        n_kept = cleaned.count()

    stats = {
        "n_input": int(n_input),
        "n_after_exact_dedup": int(n_after_exact),
        "n_near_dup_dropped": int(n_near_dropped),
        "n_kept": int(n_kept),
        "min_quality": min_quality,
        "num_parts": num_parts,
    }
    if out_dir:
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
    return stats


def q_corpus_clean_stats(sf_dir: str) -> pd.DataFrame:
    """queries() wrapper: the cleaning funnel as a one-row DataFrame
    (rows-only driver check; the near-dup step is not SQL-expressible)."""
    s = clean_corpus(sf_dir, out_dir=None)
    return pd.DataFrame({k: [v] for k, v in s.items()
                         if k not in ("min_quality", "num_parts")})


def main(argv=None) -> None:
    """CLI: ``python -m scraper_ray.pipelines.corpus --sf-dir ... --out ...``
    (owns its Ray session, guarded)."""
    import argparse

    p = argparse.ArgumentParser(description="corpus cleaning pipeline")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--parts", type=int, default=16)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    stats = clean_corpus(args.sf_dir, args.out, args.min_quality, args.parts)
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
