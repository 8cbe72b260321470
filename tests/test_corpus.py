"""Composed corpus-cleaning pipeline (pipelines/corpus.py): funnel
consistency, partitioned resumable output, determinism."""

import json
import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_corpus_clean_end_to_end(tmp_path):
    from scraper_ray.pipelines.corpus import clean_corpus

    out = str(tmp_path / "corpus")
    stats = clean_corpus(SF_DIR, out)

    # funnel is monotone and consistent
    assert stats["n_input"] >= stats["n_after_exact_dedup"] >= stats["n_kept"]
    assert stats["n_kept"] >= 0 and stats["n_near_dup_dropped"] >= 0

    # exact-dedup stage matches SQL DISTINCT text
    con = duckdb.connect()
    n_distinct = con.execute(
        f"SELECT count(DISTINCT text) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert stats["n_after_exact_dedup"] == n_distinct

    # partitioned output sums to n_kept; stats sidecar written
    total = 0
    for d in sorted(os.listdir(out)):
        if d.startswith("part="):
            total += pq.read_metadata(os.path.join(out, d, "data.parquet")).num_rows
    assert total == stats["n_kept"]
    with open(os.path.join(out, "stats.json")) as f:
        assert json.load(f)["n_kept"] == stats["n_kept"]

    # every kept row passes the quality threshold; near-dup drop set removed
    kept = pd.concat([
        pq.read_table(os.path.join(out, d, "data.parquet")).to_pandas()
        for d in sorted(os.listdir(out)) if d.startswith("part=")
    ])
    assert (kept["quality"] >= stats["min_quality"]).all()
    from scraper_ray.pipelines.queries import q_minhash_near_dup

    pairs = q_minhash_near_dup(SF_DIR)
    assert not set(pairs["id_b"]) & set(kept["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_corpus_decontaminate_stage(tmp_path):
    """decontaminate=True: no eval-slice doc and no contaminated train doc
    reaches the output; funnel decomposes exactly; stats deterministic."""
    from scraper_ray.pipelines.corpus import (_DECON_EVAL_MOD, _DECON_N,
                                              clean_corpus)
    from scraper_ray.pipelines.queries import q_decontaminate

    out = str(tmp_path / "corpus")
    s = clean_corpus(SF_DIR, out, decontaminate=True)

    kept = pd.concat([
        pq.read_table(os.path.join(out, d, "data.parquet")).to_pandas()
        for d in sorted(os.listdir(out)) if d.startswith("part=")
    ])
    kept_ids = set(kept["doc_id"])
    # the held-out slice is gone...
    assert not any(d % _DECON_EVAL_MOD == 0 for d in kept_ids)
    assert s["n_eval_heldout"] > 0
    # ...and so is every contaminated train doc (whether it fell to
    # dedup stages earlier or to the decontamination drop itself)
    cont = set(q_decontaminate(SF_DIR, n=_DECON_N,
                               eval_mod=_DECON_EVAL_MOD)["doc_id"])
    assert cont, "fixture must plant contamination or the test is vacuous"
    assert not cont & kept_ids
    # the isin-drop path itself must fire (sf0.001 yields 2 contaminated
    # docs that survive exact+near dedup), not just the earlier stages
    assert s["n_decontaminated"] > 0

    # funnel decomposes: rows after exact dedup fall to exactly four sinks
    n_quality = (s["n_after_exact_dedup"] - s["n_near_dup_dropped"]
                 - s["n_eval_heldout"] - s["n_decontaminated"] - s["n_kept"])
    assert n_quality >= 0

    # deterministic (stats-only rerun matches the written run)
    s2 = clean_corpus(SF_DIR, decontaminate=True)
    for k in ("n_kept", "n_eval_heldout", "n_decontaminated",
              "n_after_exact_dedup", "n_near_dup_dropped"):
        assert s2[k] == s[k], k

    # default run is unchanged by the feature (counts read zero)
    s0 = clean_corpus(SF_DIR)
    assert s0["n_eval_heldout"] == 0 and s0["n_decontaminated"] == 0
    assert s0["n_kept"] >= s["n_kept"]


@pytest.mark.usefixtures("ray_session")
def test_corpus_resume_accepts_pre_upgrade_sidecar(tmp_path):
    """A sidecar written before the 'decontaminate' key existed means the
    flag was off — resuming with it off is the identical pipeline and
    must be accepted; resuming with it ON must still refuse."""
    from scraper_ray.pipelines.corpus import clean_corpus

    out = str(tmp_path / "corpus")
    s1 = clean_corpus(SF_DIR, out)
    cfgp = os.path.join(out, "config.json")
    with open(cfgp) as f:
        cfg = json.load(f)
    cfg.pop("decontaminate")
    with open(cfgp, "w") as f:
        json.dump(cfg, f)
    s2 = clean_corpus(SF_DIR, out)
    assert s2["n_kept"] == s1["n_kept"]
    with pytest.raises(ValueError, match="decontaminate"):
        clean_corpus(SF_DIR, out, decontaminate=True)


@pytest.mark.usefixtures("ray_session")
def test_corpus_resume_config_mismatch_refused(tmp_path):
    """Rerunning over an existing out_dir with a different config must
    refuse (finished partitions are skipped on resume, so stale rows would
    otherwise masquerade as this run's output)."""
    from scraper_ray.pipelines.corpus import clean_corpus

    out = str(tmp_path / "corpus")
    clean_corpus(SF_DIR, out, min_quality=0.3)
    with pytest.raises(ValueError, match="resume config mismatch"):
        clean_corpus(SF_DIR, out, min_quality=0.9)
    with pytest.raises(ValueError, match="resume config mismatch"):
        clean_corpus(SF_DIR, out, num_parts=8)
    with pytest.raises(ValueError, match="resume config mismatch"):
        clean_corpus("/root/testdata/sf0.01", out)  # sf_dir is checked too


@pytest.mark.usefixtures("ray_session")
def test_corpus_interrupted_run_still_guarded(tmp_path):
    """The config sidecar lands BEFORE any partition write, so a run
    interrupted before stats.json (which is only written at the END) still
    refuses a mismatched rerun — finished part files from the old config
    can never silently mix into a rerun's output."""
    from scraper_ray.pipelines.corpus import clean_corpus

    out = str(tmp_path / "corpus")
    clean_corpus(SF_DIR, out, min_quality=0.3)
    # simulate the interruption: partitions exist, stats.json does not
    os.remove(os.path.join(out, "stats.json"))
    assert os.path.exists(os.path.join(out, "config.json"))
    with pytest.raises(ValueError, match="resume config mismatch"):
        clean_corpus(SF_DIR, out, min_quality=0.9)
    # matching config resumes fine
    s = clean_corpus(SF_DIR, out, min_quality=0.3)
    assert s["n_kept"] >= 0 and os.path.exists(os.path.join(out, "stats.json"))


@pytest.mark.usefixtures("ray_session")
def test_corpus_funnel_decomposes(tmp_path):
    """n_after_exact - n_kept == near-dup drops + quality drops: the
    near-dup stat counts only documents actually removed by that stage
    (not exact-dup losers that also appear in the pair list)."""
    from scraper_ray.pipelines.corpus import clean_corpus

    s = clean_corpus(SF_DIR, None)
    assert s["n_near_dup_dropped"] <= s["n_after_exact_dedup"]
    # drops at the near stage plus drops at the quality stage account for
    # the whole post-exact reduction
    n_quality_dropped = (s["n_after_exact_dedup"] - s["n_near_dup_dropped"]
                         - s["n_kept"])
    assert n_quality_dropped >= 0


@pytest.mark.usefixtures("ray_session")
def test_corpus_clean_resume_skips_finished_parts(tmp_path):
    from scraper_ray.pipelines.corpus import clean_corpus

    out = str(tmp_path / "corpus")
    s1 = clean_corpus(SF_DIR, out)
    mtimes = {d: os.path.getmtime(os.path.join(out, d, "data.parquet"))
              for d in os.listdir(out) if d.startswith("part=")}
    s2 = clean_corpus(SF_DIR, out)  # rerun over finished output
    assert s2["n_kept"] == s1["n_kept"]
    for d, m in mtimes.items():
        # untouched: finished partitions were skipped, not rewritten
        assert os.path.getmtime(os.path.join(out, d, "data.parquet")) == m


@pytest.mark.usefixtures("ray_session")
def test_corpus_refuses_unguarded_legacy_outdir(tmp_path):
    """An out_dir holding prior output but no config.json sidecar (a
    legacy/foreign run) must be refused — its partitions would otherwise
    be skip-resumed under the current config's name."""
    from scraper_ray.pipelines.corpus import clean_corpus

    out = tmp_path / "corpus"
    (out / "part=0000").mkdir(parents=True)
    (out / "part=0000" / "data.parquet").write_bytes(b"")
    with pytest.raises(ValueError, match="no config.json sidecar"):
        clean_corpus(SF_DIR, str(out))

@pytest.mark.usefixtures("ray_session")
def test_corpus_image_stage_drops_planted_reencodes(tmp_path):
    """Optional multimodal stage: every planted re-encoded near-dup
    ('<id>-re', identical-or-PSNR≥40 pixels) is removed keep-first, all
    base images survive, and the kept set is written hash-partitioned
    under images/ with counts that reconcile with the funnel stats."""
    from scraper_ray.pipelines.corpus import clean_corpus
    from scraper_ray.sources.fixtures import build_images_with_reencodes

    out = str(tmp_path / "corpus")
    images = build_images_with_reencodes(16)
    s = clean_corpus(SF_DIR, out, images_table=images)
    assert s["n_images"] == 32
    assert s["n_image_dup_dropped"] == 16
    assert s["n_images_kept"] == 16

    ids = []
    base = os.path.join(out, "images")
    for d in sorted(os.listdir(base)):
        t = pq.read_table(os.path.join(base, d, "data.parquet"))
        ids += t["image_id"].to_pylist()
    assert len(ids) == s["n_images_kept"]
    assert not any(i.endswith("-re") for i in ids)  # all variants dropped
    assert set(ids) == {i for i in images["image_id"].to_pylist()
                        if not i.endswith("-re")}  # every base kept

    # stats-only path agrees without writing anything
    s2 = clean_corpus(SF_DIR, None, images_table=images)
    for k in ("n_images", "n_image_dup_dropped", "n_images_kept"):
        assert s2[k] == s[k]


@pytest.mark.usefixtures("ray_session")
def test_corpus_image_stage_embed_path_drops_planted_reencodes(tmp_path):
    """The tile-embedding image-dedup alternative (r4 verdict item 6,
    image_dedup='embed' → queries.image_embed_dup_pairs): same funnel
    contract as the phash path on the planted corpus — every '-re'
    re-encode removed keep-first, every base kept — plus the config
    sidecar records which operator produced the partitions (a phash-run
    out_dir refuses an embed resume)."""
    import json as json_

    from scraper_ray.pipelines.corpus import clean_corpus
    from scraper_ray.sources.fixtures import build_images_with_reencodes

    out = str(tmp_path / "corpus")
    images = build_images_with_reencodes(16)
    s = clean_corpus(SF_DIR, out, images_table=images, image_dedup="embed")
    assert s["n_images"] == 32
    assert s["n_image_dup_dropped"] == 16
    assert s["n_images_kept"] == 16

    ids = []
    base = os.path.join(out, "images")
    for d in sorted(os.listdir(base)):
        t = pq.read_table(os.path.join(base, d, "data.parquet"))
        ids += t["image_id"].to_pylist()
    assert not any(i.endswith("-re") for i in ids)
    assert set(ids) == {i for i in images["image_id"].to_pylist()
                        if not i.endswith("-re")}

    with open(os.path.join(out, "config.json")) as f:
        assert json_.load(f)["image_dedup"] == "embed"
    with pytest.raises(ValueError, match="config mismatch"):
        clean_corpus(SF_DIR, out, images_table=images, image_dedup="phash")


@pytest.mark.usefixtures("ray_session")
def test_corpus_sketch_profile_rides_exchange(tmp_path):
    """The HLL source-count and token-histogram quantiles riding the dedup
    exchange match ground truth computed over the actual kept rows — and
    are identical between the write path and the stats-only path (the
    merges are batching-invariant)."""
    import numpy as np

    from scraper_ray.pipelines.corpus import clean_corpus

    out = str(tmp_path / "corpus")
    s = clean_corpus(SF_DIR, out)
    kept = pd.concat([
        pq.read_table(os.path.join(out, d, "data.parquet")).to_pandas()
        for d in sorted(os.listdir(out)) if d.startswith("part=")
    ])
    n_src = kept["source"].nunique()
    # HLL p=12 → ~1.6% rse; at this cardinality the estimate is exact-ish
    assert abs(s["n_distinct_sources_est"] - n_src) <= max(2, 0.05 * n_src)
    # histogram quantiles: within one 2^(1/8)-width bin (≤9% relative)
    for key, q in (("token_bpe_p50", 0.5), ("token_bpe_p90", 0.9)):
        exact = float(np.quantile(kept["n_tokens_bpe"], q, method="lower"))
        assert exact <= s[key] <= np.ceil(exact * 2 ** (1 / 8)) + 1, (key, exact)

    s2 = clean_corpus(SF_DIR, None)
    for k in ("n_distinct_sources_est", "token_bpe_p50", "token_bpe_p90"):
        assert s2[k] == s[k]


@pytest.mark.usefixtures("ray_session")
def test_corpus_pii_scrub_stage(tmp_path):
    """pii_scrub=True with planted positives: no email/IPv4 pattern
    survives in the output corpus, n_pii_redactions equals the sum of the
    per-row n_pii column over kept rows, and the written+stats paths
    agree."""
    import re

    from scraper_ray.pipelines.corpus import clean_corpus
    from scraper_ray.pipelines.queries import PII_EMAIL_RE, PII_IP_RE

    out = str(tmp_path / "corpus_pii")
    s = clean_corpus(SF_DIR, out, pii_scrub=True, _pii_plant=True)
    assert s["n_pii_redactions"] > 0

    email = re.compile(PII_EMAIL_RE)
    ip = re.compile(PII_IP_RE)
    n_pii_sum, n_rows = 0, 0
    for part in sorted(os.listdir(out)):
        if not part.startswith("part="):
            continue
        t = pq.read_table(os.path.join(out, part, "data.parquet"))
        for txt in t["text"].to_pylist():
            assert not email.search(txt), txt[-80:]
            assert not ip.search(txt), txt[-80:]
        n_pii_sum += int(pd.Series(t["n_pii"].to_pylist()).sum())
        n_rows += t.num_rows
    assert n_rows == s["n_kept"]
    assert n_pii_sum == s["n_pii_redactions"]

    # stats-only path agrees with the written path
    s2 = clean_corpus(SF_DIR, None, pii_scrub=True, _pii_plant=True)
    assert s2["n_pii_redactions"] == s["n_pii_redactions"]
    assert s2["n_kept"] == s["n_kept"]

    # disabled by default: zero redactions, n_pii column still present
    s3 = clean_corpus(SF_DIR, None)
    assert s3["n_pii_redactions"] == 0
