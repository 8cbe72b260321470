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
import pyarrow.compute as pc
import pyarrow.parquet as pq

# worker-local broadcast cache: ray.get of a plasma object is cheap but not
# free, and the per-call array handling would otherwise repeat once per
# partition kernel invocation (num_parts times per run) — resolve each
# broadcast ref ONCE per worker process instead
_BCAST_CACHE: dict = {}


def _bcast(ref):
    import ray

    key = ref.hex()
    arr = _BCAST_CACHE.get(key)
    if arr is None:
        # bounded: a long-lived worker serving many corpus runs would
        # otherwise pin every past run's broadcast buffer forever
        if len(_BCAST_CACHE) >= 8:
            _BCAST_CACHE.clear()
        arr = _BCAST_CACHE[key] = ray.get(ref)
    return arr


# sketch geometry for the profile riding the dedup exchange (see
# functions/sketches.py for the merge-invariance rationale)
_HLL_P = 12
_HIST_NBINS = 256


def _token_hist(ntok: np.ndarray) -> np.ndarray:
    """Log-spaced (2^(1/8)-width) token-count histogram partial — same bin
    geometry as queries.q_token_quantiles (≤9% relative error at the
    reported bin upper edge)."""
    ntok = np.maximum(ntok.astype(np.float64), 1.0)
    bins = np.minimum((np.log2(ntok) * 8).astype(np.int64), _HIST_NBINS - 1)
    return np.bincount(bins, minlength=_HIST_NBINS).astype(np.int64)


def _hist_quantile(hist: np.ndarray, q: float) -> int:
    """Bin upper edge holding the q-quantile (0 when the corpus is empty)."""
    total = int(hist.sum())
    if total == 0:
        return 0
    cum = np.cumsum(hist)
    bin_idx = int(np.searchsorted(cum, int(np.ceil(q * total))))
    return int(np.ceil(2 ** ((bin_idx + 1) / 8)))


def _merge_stat_blobs(hll_blobs, hist_blobs) -> tuple[bytes, bytes]:
    """Merge per-partition sketch blobs: HLL register max, histogram bin
    sum — both order/parallelism independent."""
    regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
    hist = np.zeros(_HIST_NBINS, dtype=np.int64)
    for b in hll_blobs:
        if b:
            np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
    for b in hist_blobs:
        if b:
            hist += np.frombuffer(b, dtype=np.int64)
    return regs.tobytes(), hist.tobytes()


#: decontamination-stage defaults (recorded in the config sidecar via the
#: ``decontaminate`` flag; the shingle length / eval slice match the
#: standalone ``queries.q_decontaminate`` defaults — ONE implementation)
_DECON_N = 8
_DECON_EVAL_MOD = 10


def clean_corpus(sf_dir: str, out_dir: str | None = None,
                 min_quality: float = 0.3, num_parts: int = 16,
                 images_table: pa.Table | None = None,
                 image_dedup: str = "phash",
                 pii_scrub: bool = False, _pii_plant: bool = False,
                 decontaminate: bool = False) -> dict:
    """Run the cleaning pipeline; returns the funnel stats dict (and writes
    partitioned parquet + ``stats.json`` when ``out_dir`` is given).

    ``images_table`` (optional): a multimodal image corpus (IMAGES_SCHEMA)
    cleaned alongside the text — decoded-pixel near-dups are dropped
    keep-first through the SAME banded-LSH operators as the standalone
    queries: ``image_dedup="phash"`` (default) uses
    ``queries.image_phash_pairs`` (``image_phash_dups``);
    ``image_dedup="embed"`` uses ``queries.image_embed_dup_pairs``
    (``image_embed_dups``) — the tile-embedding path that also catches
    re-encodes whose phash hamming exceeds the banding budget. Kept
    images are written hash-partitioned under ``out_dir/images/``. Funnel
    stats gain ``n_images / n_image_dup_dropped / n_images_kept``.

    The text exchange also carries mergeable sketches as extra stats-row
    columns (HLL of ``source`` + log-histogram of ``n_tokens_bpe``, both
    batching-invariant merges), so the output-corpus profile
    (``n_distinct_sources_est``, ``token_bpe_p50/p90``) costs zero extra
    passes.

    ``pii_scrub=True`` redacts emails/IPv4s (``queries.scrub_pii`` — the
    SAME RE2 kernel as the oracle-checked standalone query) inside the
    features pass, BEFORE hashing: near-identical docs differing only in
    their PII dedup together, and no PII reaches the output corpus.
    Redaction counts ride the exchange as a per-row int64 and surface as
    ``n_pii_redactions`` (over kept rows). ``_pii_plant`` is test
    scaffolding: plant the deterministic positives first (testdata holds
    no real PII).

    ``decontaminate=True`` adds the benchmark-decontamination stage (the
    SAME operator as ``queries.q_decontaminate``): the held-out eval
    slice (``doc_id % 10 == 0``) is excluded from the training output,
    and any remaining train doc sharing an 8-word shingle with it is
    dropped. Both counts ride the dedup exchange
    (``n_eval_heldout`` / ``n_decontaminated`` — drops actually applied
    at that stage, after exact/near dedup already removed their share)."""
    import ray

    from ..functions.hashing import hash64_batch
    from ..functions.sketches import HyperLogLog
    from ..functions.textstats import (
        count_tokens_bpe, detect_lang, fingerprint_batch, quality_features,
        quality_score,
    )
    from .queries import (_plant_pii, _read, q_decontaminate,
                          q_minhash_near_dup, scrub_pii)

    cfg = {"sf_dir": sf_dir, "min_quality": min_quality,
           "num_parts": num_parts,
           "with_images": images_table is not None,
           "image_dedup": image_dedup,
           "pii_scrub": pii_scrub, "pii_plant": _pii_plant,
           "decontaminate": decontaminate}
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
            # keys added AFTER an out_dir was written default to their
            # off-value: a pre-upgrade sidecar without 'decontaminate'
            # means the flag was off, and resuming with it off is the
            # identical pipeline — don't force a from-scratch rerun
            added_defaults = {"decontaminate": False}
            for k, v in cfg.items():
                if prev.get(k, added_defaults.get(k)) != v:
                    raise ValueError(
                        f"resume config mismatch on {k!r}: out_dir was "
                        f"written with {prev.get(k, added_defaults.get(k))!r}, "
                        f"current run has {v!r}; use a fresh out_dir")
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
        if pii_scrub:
            scrubbed = scrub_pii(_plant_pii(t) if _pii_plant else t)
            n_pii = pc.add(scrubbed["n_email"],
                           scrubbed["n_ip"]).combine_chunks()
            t = scrubbed.drop_columns(["n_email", "n_ip"])
        else:
            n_pii = pa.array(np.zeros(t.num_rows, dtype=np.int64))
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
            "n_pii": n_pii.cast(pa.int64()),
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
    drop_ids = (np.unique(pairs["id_b"].to_numpy(dtype=np.int64))
                if len(pairs) else np.empty(0, dtype=np.int64))
    drop_ref = ray.put(drop_ids)

    # decontamination drop set: contaminated-train doc_ids from the SAME
    # operator as the standalone query (aggregate-sized → broadcast); the
    # eval-slice holdout itself needs no set — it's an exact modular
    # predicate applied in-partition
    if decontaminate:
        # shingles are computed in the same text space the corpus writes:
        # with pii_scrub on, contamination that only matches post-scrub
        # (docs differing solely inside a redacted span) must still hit
        cont = q_decontaminate(sf_dir, n=_DECON_N, eval_mod=_DECON_EVAL_MOD,
                               pii_scrub=pii_scrub, _pii_plant=_pii_plant)
        decon_ref = ray.put(cont["doc_id"].to_numpy(dtype=np.int64))
    else:
        decon_ref = None  # the isin branch is unreachable when off

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
        near_hit = np.isin(g["doc_id"].to_numpy(dtype=np.int64),
                           _bcast(drop_ref), assume_unique=False)
        n_near = int(near_hit.sum())
        g = g.loc[~near_hit]
        if decontaminate:
            ev = (g["doc_id"].to_numpy(dtype=np.int64)
                  % _DECON_EVAL_MOD) == 0
            n_eval = int(ev.sum())
            g = g.loc[~ev]
            dec = np.isin(g["doc_id"].to_numpy(dtype=np.int64),
                          _bcast(decon_ref))
            n_dec = int(dec.sum())
            g = g.loc[~dec]
        else:
            n_eval = n_dec = 0
        out = g.loc[g["quality"] >= min_quality].copy()
        # output-corpus profile sketches ride the stats row: an HLL of the
        # kept rows' sources and a log-histogram of their BPE token counts.
        # Both merges (register max / bin sum) are batching-invariant, so
        # the profile is identical at any parallelism — and costs zero
        # extra passes over the corpus.
        hll = HyperLogLog(p=_HLL_P).add_hashes(
            hash64_batch(out["source"].tolist()))
        hist = _token_hist(out["n_tokens_bpe"].to_numpy(dtype=np.int64))
        n_pii_kept = int(out["n_pii"].sum())
        out["_stat_exact"] = np.int64(-1)  # -1 marks a data row
        out["_stat_near"] = np.int64(-1)
        out["_stat_pii"] = np.int64(-1)
        out["_stat_eval"] = np.int64(-1)
        out["_stat_dec"] = np.int64(-1)
        out["_stat_hll"] = b""
        out["_stat_hist"] = b""
        stats_row = pd.DataFrame({
            "doc_id": pd.Series([-1], dtype="int64"),
            "text": [""], "source": [""],
            "quality": pd.Series([0.0], dtype="float64"),
            "lang_pred": [""],
            "n_tokens_bpe": pd.Series([0], dtype="int64"),
            "n_pii": pd.Series([0], dtype="int64"),
            "fingerprint": pd.Series([0], dtype="int64"),
            "h1": pd.Series([0], dtype="int64"),
            "h2": pd.Series([0], dtype="int64"),
            "_stat_exact": pd.Series([n_exact], dtype="int64"),
            "_stat_near": pd.Series([n_near], dtype="int64"),
            "_stat_pii": pd.Series([n_pii_kept], dtype="int64"),
            "_stat_eval": pd.Series([n_eval], dtype="int64"),
            "_stat_dec": pd.Series([n_dec], dtype="int64"),
            "_stat_hll": [hll.to_bytes()],
            "_stat_hist": [hist.tobytes()],
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
                hll_b, hist_b = _merge_stat_blobs(g["_stat_hll"].tolist(),
                                                  g["_stat_hist"].tolist())
                return pd.DataFrame({
                    "part": pd.Series([-1], dtype="int64"),
                    "rows": pd.Series([0], dtype="int64"),
                    "n_exact": pd.Series([int(g["_stat_exact"].sum())],
                                         dtype="int64"),
                    "n_near": pd.Series([int(g["_stat_near"].sum())],
                                        dtype="int64"),
                    "n_pii": pd.Series([int(g["_stat_pii"].sum())],
                                       dtype="int64"),
                    "n_eval": pd.Series([int(g["_stat_eval"].sum())],
                                        dtype="int64"),
                    "n_dec": pd.Series([int(g["_stat_dec"].sum())],
                                       dtype="int64"),
                    "hll": [hll_b], "hist": [hist_b],
                })
            out = g.drop(columns=["_wkey", "_stat_exact", "_stat_near",
                                  "_stat_pii", "_stat_eval", "_stat_dec",
                                  "_stat_hll", "_stat_hist"])
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
                "n_pii": pd.Series([0], dtype="int64"),
                "n_eval": pd.Series([0], dtype="int64"),
                "n_dec": pd.Series([0], dtype="int64"),
                "hll": [b""], "hist": [b""],
            })

        written = (cleaned.map_batches(tag_out, batch_format="pandas")
                   .groupby("_wkey")
                   .map_groups(write_part, batch_format="pandas")
                   .to_pandas())
        n_kept = int(written["rows"].sum())
        n_after_exact = int(written["n_exact"].sum())
        n_near_dropped = int(written["n_near"].sum())
        n_pii_red = int(written["n_pii"].sum())
        n_eval_held = int(written["n_eval"].sum())
        n_decon = int(written["n_dec"].sum())
        hll_blob, hist_blob = _merge_stat_blobs(written["hll"].tolist(),
                                                written["hist"].tolist())
    else:
        # stats-only consumption: per-batch partial counts → tiny merge
        def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
            stat = df["_stat_exact"] >= 0
            hll_b, hist_b = _merge_stat_blobs(
                df.loc[stat, "_stat_hll"].tolist(),
                df.loc[stat, "_stat_hist"].tolist())
            return pd.DataFrame({
                "n_exact": pd.Series([int(df.loc[stat, "_stat_exact"].sum())],
                                     dtype="int64"),
                "n_near": pd.Series([int(df.loc[stat, "_stat_near"].sum())],
                                    dtype="int64"),
                "n_pii": pd.Series([int(df.loc[stat, "_stat_pii"].sum())],
                                   dtype="int64"),
                "n_eval": pd.Series([int(df.loc[stat, "_stat_eval"].sum())],
                                    dtype="int64"),
                "n_dec": pd.Series([int(df.loc[stat, "_stat_dec"].sum())],
                                   dtype="int64"),
                "n_kept": pd.Series([int((~stat).sum())], dtype="int64"),
                "hll": [hll_b], "hist": [hist_b],
            })

        partials = (cleaned.map_batches(partial_counts, batch_format="pandas")
                    .to_pandas())
        n_kept = int(partials["n_kept"].sum())
        n_after_exact = int(partials["n_exact"].sum())
        n_near_dropped = int(partials["n_near"].sum())
        n_pii_red = int(partials["n_pii"].sum())
        n_eval_held = int(partials["n_eval"].sum())
        n_decon = int(partials["n_dec"].sum())
        hll_blob, hist_blob = _merge_stat_blobs(partials["hll"].tolist(),
                                                partials["hist"].tolist())

    stats = {
        "n_input": int(n_input),
        "n_after_exact_dedup": int(n_after_exact),
        "n_near_dup_dropped": int(n_near_dropped),
        "n_kept": int(n_kept),
        "n_pii_redactions": int(n_pii_red),
        "n_eval_heldout": int(n_eval_held),
        "n_decontaminated": int(n_decon),
        "min_quality": min_quality,
        "num_parts": num_parts,
        # output-corpus profile from the sketches that rode the exchange
        "n_distinct_sources_est": int(round(
            HyperLogLog.from_bytes(hll_blob, _HLL_P).estimate())),
        "token_bpe_p50": _hist_quantile(
            np.frombuffer(hist_blob, dtype=np.int64), 0.5),
        "token_bpe_p90": _hist_quantile(
            np.frombuffer(hist_blob, dtype=np.int64), 0.9),
    }
    if images_table is not None:
        stats.update(_clean_images(images_table, out_dir, num_parts,
                                   dedup=image_dedup))
    if out_dir:
        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
    return stats


def _clean_images(images: pa.Table, out_dir: str | None,
                  num_parts: int, dedup: str = "phash") -> dict:
    """Optional multimodal stage: decoded-pixel near-dup removal over an
    image corpus, keep-first, through the SAME operator as the standalone
    query (so its brute-force-oracle guarantees carry over):
    ``dedup="phash"`` → ``queries.image_phash_pairs``; ``dedup="embed"`` →
    ``queries.image_embed_dup_pairs`` (tile-embedding cosine — catches
    re-encodes whose phash hamming exceeds the banding budget). The pair
    list is aggregate-sized → the drop set broadcasts; kept images stream
    to hash-partitioned parquet under ``out_dir/images/part=NNNN`` with
    the text path's atomic-skip resume semantics. Returns the image
    funnel counts."""
    import ray
    import ray.data as rd

    from ..functions.hashing import hash64_batch
    from .queries import image_embed_dup_pairs, image_phash_pairs

    if dedup == "phash":
        pairs = image_phash_pairs(images)
    elif dedup == "embed":
        pairs = image_embed_dup_pairs(images)
    else:
        raise ValueError(f"image_dedup must be 'phash' or 'embed', "
                         f"got {dedup!r}")
    drop = (np.unique(pairs["image_id_b"].to_numpy(dtype=object))
            if len(pairs) else np.empty(0, dtype=object))
    n_images = images.num_rows
    drop_ref = ray.put(set(drop.tolist()))

    if out_dir is None:
        # image_ids are unique within the table, so the kept count is exact
        # without another pass
        return {"n_images": int(n_images),
                "n_image_dup_dropped": int(len(drop)),
                "n_images_kept": int(n_images - len(drop))}

    img_base = os.path.join(out_dir, "images")
    os.makedirs(img_base, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        dropset = _bcast(drop_ref)
        keep = np.fromiter((i not in dropset for i in ids), dtype=bool,
                           count=len(ids))
        t = t.filter(pa.array(keep))
        wk = (hash64_batch(t["image_id"].to_pylist())
              % np.uint64(num_parts)).astype(np.int32)
        return t.append_column("_wkey", pa.array(wk))

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_wkey"].iloc[0])
        out = g.drop(columns=["_wkey"])
        path = os.path.join(img_base, f"part={part:04d}")
        os.makedirs(path, exist_ok=True)
        final = os.path.join(path, "data.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                           tmp)
            os.replace(tmp, final)
        return pd.DataFrame({"rows": pd.Series([len(out)], dtype="int64")})

    written = (rd.from_arrow(images)
               .map_batches(tag, batch_format="pyarrow", batch_size=64)
               .groupby("_wkey")
               .map_groups(write_part, batch_format="pandas")
               .to_pandas())
    n_img_kept = int(written["rows"].sum())
    return {"n_images": int(n_images),
            "n_image_dup_dropped": int(len(drop)),
            "n_images_kept": n_img_kept}


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
    p.add_argument("--images-reencodes", type=int, default=0,
                   help="also clean a deterministic N-base-image corpus "
                        "with planted re-encoded near-dups (0 = text only)")
    p.add_argument("--pii-scrub", action="store_true",
                   help="redact emails/IPv4s before hashing/dedup "
                        "(queries.scrub_pii; counts in n_pii_redactions)")
    p.add_argument("--image-dedup", choices=("phash", "embed"),
                   default="phash",
                   help="image near-dup operator: decoded-pixel phash "
                        "banding or tile-embedding cosine LSH")
    p.add_argument("--decontaminate", action="store_true",
                   help="hold out the eval slice (doc_id %% 10 == 0) and "
                        "drop train docs sharing an 8-word shingle with it "
                        "(queries.q_decontaminate; counts in "
                        "n_eval_heldout / n_decontaminated)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    images = None
    if args.images_reencodes:
        from ..sources.fixtures import build_images_with_reencodes

        images = build_images_with_reencodes(args.images_reencodes)
    stats = clean_corpus(args.sf_dir, args.out, args.min_quality, args.parts,
                         images_table=images, image_dedup=args.image_dedup,
                         pii_scrub=args.pii_scrub,
                         decontaminate=args.decontaminate)
    print(json.dumps(stats))
    ray.shutdown()


if __name__ == "__main__":
    main()
