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
- NOTHING materializes: the funnel counts (after-exact, near-dropped) ride
  the dedup exchange as one stats row per partition (null data columns),
  so dropped rows never move and no pass re-reads the corpus — the
  post-dedup corpus is never pinned in the object store;
- output is hash-partitioned parquet (``part=NNNN``), one directory per
  partition so an interrupted run can resume by skipping finished parts; a
  ``config.json`` sidecar is written atomically BEFORE any partition write
  and resumes are validated against it (an interrupted run has no
  stats.json yet, but its finished partitions must never be mixed with a
  rerun under a different sf_dir/min_quality/num_parts).
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

    cfg = {"sf_dir": sf_dir, "min_quality": min_quality,
           "num_parts": num_parts}
    if out_dir:
        # resume guard (mirrors crawl.py's manifest config check): finished
        # partitions are skipped on rerun, so the config that produced them
        # must match — otherwise stale rows would silently masquerade as
        # this run's output. The sidecar is written atomically BEFORE any
        # partition write (stats.json only lands at the END of a successful
        # run, so it cannot guard an interrupted one).
        os.makedirs(out_dir, exist_ok=True)
        cfg_path = os.path.join(out_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                prev = json.load(f)
            for k, v in cfg.items():
                if prev.get(k) != v:
                    raise ValueError(
                        f"resume config mismatch on {k!r}: out_dir was "
                        f"written with {prev.get(k)!r}, current run has "
                        f"{v!r}; use a fresh out_dir")
        else:
            # no sidecar: refuse to adopt an out_dir that already holds
            # output (a legacy/foreign run whose config is unknown) — its
            # partitions would be skip-resumed under THIS config's name
            existing = [d for d in os.listdir(out_dir)
                        if d.startswith("part=") or d == "stats.json"]
            if existing:
                raise ValueError(
                    f"out_dir {out_dir!r} contains prior output "
                    f"({existing[:3]}...) but no config.json sidecar; "
                    "cannot verify it matches this run's config — use a "
                    "fresh out_dir")
            tmp = cfg_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(cfg, f)
            os.replace(tmp, cfg_path)

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

    # near-dup removal input: verified MinHash pairs (id_a < id_b) → drop
    # id_b — the same operator exposed as queries.q_minhash_near_dup (ONE
    # implementation; a drifted copy here would silently diverge from the
    # tested pair semantics). The drop set is pair-sized → broadcast.
    pairs = q_minhash_near_dup(sf_dir)
    drop_ids = (sorted(set(pairs["id_b"].astype(int)))
                if len(pairs) else [])
    drop_ref = ray.put(drop_ids)

    # exact dedup + near-dup drop + quality filter: hash-partition on
    # content hash, then ONE vectorized pass per partition. The funnel
    # counts (rows surviving exact dedup, near-dup drops actually applied —
    # an id_b that was an exact-dup loser is already gone and must not be
    # double-counted) ride the SAME exchange as one stats row per partition
    # (marker ``_stat_exact >= 0``), so dropped rows never move downstream
    # and nothing materializes.
    def tag_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pkey"] = (df["h1"].to_numpy().astype(np.uint64)
                       % np.uint64(num_parts)).astype("int32")
        return df

    def dedup_filter_count(g: pd.DataFrame) -> pd.DataFrame:
        keep = g["doc_id"] == g.groupby(["h1", "h2"])["doc_id"].transform("min")
        g = g.loc[keep].drop(columns=["_pkey"])
        n_exact = len(g)
        near_hit = g["doc_id"].isin(ray.get(drop_ref))
        n_near = int(near_hit.sum())
        g = g.loc[~near_hit]
        out = g.loc[g["quality"] >= min_quality].copy()
        out["_stat_exact"] = np.int64(-1)  # -1 marks a data row
        out["_stat_near"] = np.int64(-1)
        stats_row = pd.DataFrame({
            "doc_id": pd.Series([-1], dtype="int64"),
            "text": [""], "source": [""],
            "quality": pd.Series([0.0], dtype="float64"),
            "lang_pred": [""],
            "n_tokens_bpe": pd.Series([0], dtype="int64"),
            "fingerprint": pd.Series([0], dtype="int64"),
            "h1": pd.Series([0], dtype="int64"),
            "h2": pd.Series([0], dtype="int64"),
            "_stat_exact": pd.Series([n_exact], dtype="int64"),
            "_stat_near": pd.Series([n_near], dtype="int64"),
        })
        return pd.concat([out, stats_row], ignore_index=True)

    cleaned = (feat.map_batches(tag_hash, batch_format="pandas")
               .groupby("_pkey")
               .map_groups(dedup_filter_count, batch_format="pandas"))

    n_input = docs.count()

    if out_dir:
        # second exchange: data rows to their write partition, stats rows to
        # a reserved sink key; the writer returns per-partition row counts,
        # so n_kept needs no extra pass over the corpus either
        def tag_out(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            stat = (df["_stat_exact"] >= 0).to_numpy()
            wk = (df["doc_id"] % num_parts).astype("int32")
            wk[stat] = np.int32(num_parts)
            df["_wkey"] = wk
            return df

        def write_part(g: pd.DataFrame) -> pd.DataFrame:
            part = int(g["_wkey"].iloc[0])
            if part == num_parts:  # the stats sink group
                return pd.DataFrame({
                    "part": pd.Series([-1], dtype="int64"),
                    "rows": pd.Series([0], dtype="int64"),
                    "n_exact": pd.Series([int(g["_stat_exact"].sum())],
                                         dtype="int64"),
                    "n_near": pd.Series([int(g["_stat_near"].sum())],
                                        dtype="int64"),
                })
            out = g.drop(columns=["_wkey", "_stat_exact", "_stat_near"])
            path = os.path.join(out_dir, f"part={part:04d}")
            os.makedirs(path, exist_ok=True)
            final = os.path.join(path, "data.parquet")
            if not os.path.exists(final):
                # resume: an existing file is complete (atomic rename) and
                # the pipeline is deterministic — skip rewriting it; the
                # recomputed row count equals the file's
                tmp = final + ".tmp"
                pq.write_table(
                    pa.Table.from_pandas(out, preserve_index=False), tmp)
                os.replace(tmp, final)
            return pd.DataFrame({
                "part": pd.Series([part], dtype="int64"),
                "rows": pd.Series([len(out)], dtype="int64"),
                "n_exact": pd.Series([0], dtype="int64"),
                "n_near": pd.Series([0], dtype="int64"),
            })

        written = (cleaned.map_batches(tag_out, batch_format="pandas")
                   .groupby("_wkey")
                   .map_groups(write_part, batch_format="pandas")
                   .to_pandas())
        n_kept = int(written["rows"].sum())
        n_after_exact = int(written["n_exact"].sum())
        n_near_dropped = int(written["n_near"].sum())
    else:
        # stats-only consumption: per-batch partial counts → tiny merge
        def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
            stat = df["_stat_exact"] >= 0
            return pd.DataFrame({
                "n_exact": pd.Series([int(df.loc[stat, "_stat_exact"].sum())],
                                     dtype="int64"),
                "n_near": pd.Series([int(df.loc[stat, "_stat_near"].sum())],
                                    dtype="int64"),
                "n_kept": pd.Series([int((~stat).sum())], dtype="int64"),
            })

        sums = (cleaned.map_batches(partial_counts, batch_format="pandas")
                .to_pandas().sum())
        n_kept = int(sums["n_kept"])
        n_after_exact = int(sums["n_exact"])
        n_near_dropped = int(sums["n_near"])

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
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    stats = clean_corpus(args.sf_dir, args.out, args.min_quality, args.parts)
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
