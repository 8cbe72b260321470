"""Mini-driver: run every queries() entry at sf=0.001 and compare against its
oracle_sql() via DuckDB exactly as the external driver does (sorted columns,
order-insensitive row compare). Rows-only entries are smoke-checked."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df) -> pd.DataFrame:
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


@pytest.mark.usefixtures("ray_session")
def test_value_quantiles_cont_skew_cap_fails_loudly():
    """The two-pass exact-quantile operator must refuse (not silently
    mis-page) when the needed rank bins exceed the re-scan cap."""
    from scraper_ray.pipelines.queries import q_value_quantiles_cont

    with pytest.raises(ValueError, match="cap"):
        q_value_quantiles_cont(SF_DIR, select_cap=1)


@pytest.mark.usefixtures("ray_session")
def test_empty_result_edges_return_schema_not_crash():
    """Zero-output-block pipelines lose their pandas schema on to_pandas();
    the drivers must rebuild the oracle's empty frame (same columns AND
    dtypes) instead of KeyError-ing on the missing group column."""
    from scraper_ray.pipelines.queries import (q_exists_orders,
                                               q_exists_orders_bloom,
                                               q_small_qty_revenue)

    for fn, kw in ((q_small_qty_revenue, {"max_size": 0}),
                   (q_exists_orders, {"min_qty": 1e9}),
                   (q_exists_orders_bloom, {"min_qty": 1e9})):
        out = fn(SF_DIR, **kw)
        assert len(out) == 0, fn.__name__
        assert all(out.dtypes[c].kind in "iO" for c in out.columns), (
            fn.__name__, dict(out.dtypes))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("sf", [SF_DIR, "/root/testdata/sf0.01"])
def test_decontaminate_matches_brute_force_string_sets(sf):
    """The hashed distributed decontamination must equal the exact
    string-set ground truth doc-for-doc AND hit-count-for-hit-count
    (64-bit shingle hashes: zero collisions at fixture scale)."""
    import pyarrow.parquet as pq_

    from scraper_ray.pipelines.queries import q_decontaminate

    n, mod = 8, 10
    got = q_decontaminate(sf, n=n, eval_mod=mod)

    t = pq_.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    ids, texts = t["doc_id"].to_pylist(), t["text"].to_pylist()

    def grams(text):
        toks = text.lower().split()
        if len(toks) >= n:
            return {" ".join(toks[j:j + n])
                    for j in range(len(toks) - n + 1)}
        return {" ".join(toks)} if toks else set()

    eg = set()
    for i, d in enumerate(ids):
        if d % mod == 0:
            eg |= grams(texts[i])
    exp = sorted((d, len(grams(texts[i]) & eg))
                 for i, d in enumerate(ids)
                 if d % mod != 0 and grams(texts[i]) & eg)
    assert list(zip(got["doc_id"], got["n_hits"])) == exp
    assert len(exp) > 0  # the planted dup clusters must make this non-vacuous


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_detects_overlap_in_scrubbed_space(tmp_path):
    """With pii_scrub=True the shingles are computed on SCRUBBED text:
    an eval doc and a train doc differing only inside a redacted email
    span are identical in the output corpus and must be flagged — on raw
    text they share no 8-word window (every window spans the email)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from scraper_ray.pipelines.queries import q_decontaminate

    base = ("alpha beta gamma delta epsilon {} zeta eta theta iota "
            "kappa lambda")
    t = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),  # 10 = eval slice
        "text": [base.format("u1@ex1.com"), base.format("u2@ex2.com")],
    })
    pq_.write_table(t, str(tmp_path / "documents.parquet"))

    raw = q_decontaminate(str(tmp_path))
    assert len(raw) == 0  # raw texts share no full 8-word window
    scr = q_decontaminate(str(tmp_path), pii_scrub=True)
    assert list(scr["doc_id"]) == [11]
    assert int(scr["n_hits"].iloc[0]) >= 1


@pytest.mark.usefixtures("ray_session")
def test_collect_bloom_null_keys_keep_no_false_negatives(tmp_path):
    """A null in the key column must not float64-ify the batch's keys (that
    would hash wrong bit patterns -> silent dropped matches)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data as rd

    from scraper_ray.pipelines.queries import _collect_bloom

    keys = [7, 11, None, 1 << 40]
    pq_.write_table(pa.table({"k": pa.array(keys, pa.int64())}),
                    str(tmp_path / "k.parquet"))
    bf = _collect_bloom(rd.read_parquet(str(tmp_path / "k.parquet")), "k")
    present = np.array([7, 11, 1 << 40], np.int64)
    assert bf.contains_many(present.view(np.uint64)).all()


@pytest.mark.usefixtures("ray_session")
def test_small_qty_revenue_dim_overflow_fails_loudly():
    """The Q17-shape correlated join broadcasts the filtered dim map; past
    the broadcast limit it must refuse (pointing at the bucketed/bloom
    plan), never silently truncate the map."""
    from scraper_ray.pipelines.queries import q_small_qty_revenue

    with pytest.raises(ValueError, match="broadcast limit"):
        q_small_qty_revenue(SF_DIR, broadcast_limit=1)


@pytest.mark.usefixtures("ray_session")
def test_pivot_unknown_status_fails_loudly(tmp_path):
    """The pivot's status domain is closed — an unseen o_orderstatus must
    raise instead of silently dropping its counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from scraper_ray.pipelines.queries import q_pivot_status_priority

    pq_.write_table(
        pa.table({"o_orderpriority": ["1-URGENT"], "o_orderstatus": ["X"]}),
        str(tmp_path / "orders.parquet"))
    with pytest.raises(Exception, match="unknown o_orderstatus"):
        q_pivot_status_priority(str(tmp_path))


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_prefilter_prunes_without_false_negatives():
    """The bloom-prefiltered semi-join's guarantee: the merged mergeable
    bloom admits EVERY qualifying key (no false negatives — misses would
    silently drop matches) while pruning most non-matching fact rows
    before the exchange (fp_rate-bounded)."""
    import numpy as np
    import pyarrow.compute as pc_

    from scraper_ray.pipelines.queries import _collect_bloom, _read

    li = _read(SF_DIR, "lineitem", ["l_orderkey", "l_quantity"])

    def qual(t):
        import pyarrow as pa_
        keep = t.filter(pc_.greater_equal(t["l_quantity"], 49.0))
        return pa_.table({"l_orderkey": pc_.unique(keep["l_orderkey"])})

    keys_ds = li.map_batches(qual, batch_format="pyarrow")
    bf = _collect_bloom(keys_ds, "l_orderkey")
    truth = np.unique(keys_ds.to_pandas()["l_orderkey"].to_numpy())
    assert bf.contains_many(truth.astype(np.int64).view(np.uint64)).all()

    orders = _read(SF_DIR, "orders", ["o_orderkey"]).to_pandas()
    ok = orders["o_orderkey"].to_numpy().astype(np.int64)
    passed = int(bf.contains_many(ok.view(np.uint64)).sum())
    n_match = int(np.isin(ok, truth).sum())
    # every match passes; non-matches pass at ~fp_rate (generous 10% bound)
    assert n_match <= passed <= n_match + max(10, int(0.1 * len(ok)))


def test_sql_twins_precede_rows_only():
    """ORDERING CONTRACT: the external driver records only the FIRST 50
    queries() keys in its correctness sweep — every ORACLE_SQL-twinned
    entry must therefore precede every rows-only entry (r4 verdict: 10
    SQL twins past position 50 got no external-oracle row at all)."""
    keys = list(entrymod.queries())
    twins = set(entrymod.oracle_sql())
    assert twins <= set(keys)
    assert set(keys[: len(twins)]) == twins, [
        k for k in keys[: len(twins)] if k not in twins
    ]
    assert len(twins) <= 50


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(name):
    q = entrymod.queries()[name]
    got = _norm(q(SF_DIR))
    exp = _norm(_duck(entrymod.oracle_sql()[name]))
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in got.columns:
        g, e = got[c], exp[c]
        # the external driver hashes the raw value representation, so a
        # float64 2.8e9 vs int64 2816... mismatch fails there even when the
        # values are equal — require EXACT dtype agreement locally (int32
        # vs int64 slipped through a kind-only check once; every query
        # already passes strict .equals at sf0.01, so exact is free)
        assert g.dtype == e.dtype, (c, g.dtype, e.dtype)
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            assert (g.astype(float) - e.astype(float)).abs().max() <= 1e-9, c
        else:
            assert g.astype(str).tolist() == e.astype(str).tolist(), c


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "name", sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))
)
def test_rows_only_queries_run(name):
    out = entrymod.queries()[name](SF_DIR)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert out is not None
    assert len(out.columns) > 0
    # deterministic across runs
    out2 = entrymod.queries()[name](SF_DIR)
    if not isinstance(out2, pd.DataFrame):
        out2 = out2.to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(out2))


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup_finds_the_qualifying_pair_at_sf001():
    """sf0.01 is the one scale with a qualifying pair near the threshold
    (cos 0.5128): pin that the seeded LSH + sketch prefilter finds it and
    matches the exact SQL oracle — the mini-driver above only runs
    sf0.001, where the answer is empty."""
    SF = "/root/testdata/sf0.01"
    got = _norm(entrymod.queries()["embedding_near_dup"](SF))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    exp = _norm(con.execute(entrymod.oracle_sql()["embedding_near_dup"]).df())
    assert len(got) == len(exp) == 1
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_broadcast_build_side_fallback_matches():
    """Forcing the build side over the broadcast threshold must route both
    semi/anti-join queries through the bucketed-exchange path and produce
    identical results — the guard against the driver-OOM broadcast pattern
    at 100× the 'seen set' size is behaviour-preserving."""
    from scraper_ray.pipelines.queries import (
        q_cull_known, q_regional_revenue, q_top_building_orders,
    )

    for q in (q_top_building_orders, q_cull_known):
        bc = _norm(q(SF_DIR))
        bucketed = _norm(q(SF_DIR, broadcast_limit=1))
        pd.testing.assert_frame_equal(bc, bucketed)
    # regional_revenue: supplier map over the limit → third bucketed
    # exchange replaces the broadcast, same hash-exact answer
    bc = _norm(q_regional_revenue(SF_DIR))
    bucketed = _norm(q_regional_revenue(SF_DIR, broadcast_limit=1))
    pd.testing.assert_frame_equal(bc, bucketed)


@pytest.mark.usefixtures("ray_session")
def test_lsh_bucket_cap_bounds_pair_explosion():
    """A degenerate bucket (many identical docs) is truncated to the cap —
    pair output is O(cap²), not O(members²) — capping is deterministic
    (sorted ids kept first), and every capped bucket emits an overflow ROW
    (band, hash, size) so truncation is data, never silent."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from scraper_ray.pipelines.queries import (
        _lsh_candidates, _lsh_overflows, _lsh_pairs,
    )

    n = 40
    banded = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "band": pa.array([0] * n, pa.int32()),
        "band_hash": pa.array([12345] * n, pa.uint64()),
    }))
    cand = _lsh_candidates(banded, bucket_cap=10)
    pairs = _lsh_pairs(cand).to_pandas()
    assert len(pairs) == 45  # C(10,2), not C(40,2)=780
    kept_ids = set(pairs["id_a"]) | set(pairs["id_b"])
    assert kept_ids == set(range(10))  # sorted-prefix, deterministic
    # the capped bucket is surfaced as an overflow row with its identity
    ov = _lsh_overflows(
        _lsh_candidates(banded, bucket_cap=10)).to_pandas()
    assert len(ov) == 1
    assert ov["ov_band"].tolist() == [0]
    assert ov["ov_size"].tolist() == [n]
    assert np.uint64(np.int64(ov["ov_hash"].iloc[0])) == np.uint64(12345)
    # an uncapped run emits no overflow rows
    ov_none = _lsh_overflows(
        _lsh_candidates(banded, bucket_cap=1024)).to_pandas()
    assert len(ov_none) == 0


@pytest.mark.usefixtures("ray_session")
def test_lsh_candidates_empty_and_singletons():
    import pyarrow as pa
    import ray.data as rd

    from scraper_ray.pipelines.queries import _lsh_candidates, _lsh_pairs

    banded = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "band": pa.array([0, 0, 0], pa.int32()),
        "band_hash": pa.array([1, 2, 3], pa.uint64()),  # all singleton buckets
    }))
    pairs = _lsh_pairs(_lsh_candidates(banded)).to_pandas()
    assert len(pairs) == 0


@pytest.mark.usefixtures("ray_session")
def test_window_scans_partitioning_invariant():
    """The ordered-window scans and the grouped count-distinct must return
    identical frames at any partition count — the per-partition kernels are
    exact, so only the key-routing changes with num_parts."""
    from scraper_ray.pipelines.queries import (
        q_daily_active_users, q_rolling_event_value, q_running_revenue,
    )

    for q in (q_running_revenue, q_rolling_event_value,
              q_daily_active_users):
        pd.testing.assert_frame_equal(q(SF_DIR, num_parts=3),
                                      q(SF_DIR, num_parts=64))


@pytest.mark.usefixtures("ray_session")
def test_global_sort_page_invariants():
    """Pagination must be independent of the histogram resolution (any
    deterministic binning locates the same rank window — pass 2 does the
    exact sort), empty-with-stable-schema beyond the table, and loud when
    key duplication fattens the selected range past the cap."""
    from scraper_ray.pipelines.queries import q_global_sort_page

    a = q_global_sort_page(SF_DIR, bin_shift=8)
    b = q_global_sort_page(SF_DIR, bin_shift=16)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 20

    empty = q_global_sort_page(SF_DIR, offset=10_000_000)
    assert len(empty) == 0
    assert list(empty.columns) == ["l_orderkey", "l_linenumber",
                                   "price_cents"]

    # a cap below the window's survivor count must fail loudly, not truncate
    with pytest.raises(ValueError, match="too duplicated"):
        q_global_sort_page(SF_DIR, select_cap=3)


@pytest.mark.usefixtures("ray_session")
def test_sequence_pack_invariants():
    """Greedy packing: all tokens conserved, no bin exceeds capacity except
    single-oversized-doc bins, bin ids stable across runs (determinism is
    covered by the rows-only harness; this pins the packing semantics)."""
    import duckdb as dd

    from scraper_ray.pipelines.queries import q_sequence_pack

    df = q_sequence_pack(SF_DIR, capacity=2048)
    con = dd.connect()
    total = con.execute(
        f"SELECT sum(len(string_split(text,' '))) FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')").fetchone()[0]
    assert int(df["n_tokens"].sum()) == int(total)
    assert (((df["n_tokens"] <= 2048) | (df["n_docs"] == 1)).all())
    assert df["bin_id"].is_unique
    assert (df["fill_ratio"] <= 1.0).all() and (df["fill_ratio"] > 0).all()


def test_lang_id_detector_on_real_text():
    """The testdata ``lang`` labels are random (all rows share the same
    English-ish vocabulary), so accuracy-vs-label is not meaningful there;
    the detector itself is pinned on genuinely multilingual sample text."""
    from scraper_ray.functions.textstats import detect_lang

    assert detect_lang("the cat sat on the mat and it is a fine day for a walk") == "en"
    assert detect_lang("el perro y el gato están en la casa de los abuelos") == "es"
    assert detect_lang("le chien et le chat sont dans la maison des grands-parents") == "fr"
    assert detect_lang("der Hund und die Katze sind in dem Haus von den Kindern") == "de"
    assert detect_lang("今天天气很好我们一起去公园散步吧这是一个美丽的城市" * 3) == "zh"
    assert detect_lang("") == "und"
    assert detect_lang("xyzzy qwerty 12345") == "und"


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    out = entrymod.entry()
    import ray.data

    if isinstance(out, ray.data.Dataset):
        assert out.schema() is not None
        out = out.to_pandas()
    n = len(out)
    assert n >= 0
    # K5 funnel columns ride every archive row; per-round identity
    # archive_rows == pages - errors (retry_limit=0 in entry's config)
    per_round = out.groupby("round").agg(
        rows=("url", "size"), pages=("round_pages", "first"),
        errors=("round_errors", "first"))
    assert (per_round["rows"]
            == per_round["pages"] - per_round["errors"]).all(), per_round


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_estimate_within_bound():
    """HLL estimate vs exact COUNT(DISTINCT l_orderkey): within 3 standard
    errors (1.04/sqrt(2^12) ≈ 1.6%)."""
    from scraper_ray.pipelines.queries import q_distinct_orders_hll

    est = int(q_distinct_orders_hll(SF_DIR)["n_distinct_est"].iloc[0])
    exact = int(_duck(
        "SELECT count(DISTINCT l_orderkey) AS n FROM lineitem")["n"].iloc[0])
    assert abs(est - exact) <= 3 * (1.04 / 2 ** 6) * exact + 2, (est, exact)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_guarantees_vs_exact():
    """Space-Saving top users vs exact counts: every returned estimate
    overestimates by at most its reported err (err ≤ n/capacity), and
    every user whose true count exceeds n/capacity is present in the
    summary's top-capacity (checked via the top-k slice when it fits)."""
    from scraper_ray.pipelines.queries import q_heavy_hitter_users

    got = q_heavy_hitter_users(SF_DIR, k=32, capacity=32)
    exact = _duck("SELECT user_id, count(*) AS n FROM events "
                  "GROUP BY user_id")
    true = dict(zip(exact["user_id"].astype(int), exact["n"].astype(int)))
    n = int(exact["n"].sum())
    bound = n / 32
    for _, r in got.iterrows():
        t = true.get(int(r["user_id"]), 0)
        assert 0 <= r["est_count"] - t <= r["err"] + 1e-9, dict(r)
        assert r["err"] <= bound + 1e-9
    present = set(got["user_id"].astype(int))
    for u, c in true.items():
        if c > bound:
            assert u in present, (u, c, bound)


@pytest.mark.usefixtures("ray_session")
def test_token_quantiles_within_bin_error():
    """Histogram quantiles vs exact: the reported value is the containing
    log-bin's upper edge — exact value must lie in (upper/2^(1/8), upper]."""
    from scraper_ray.pipelines.queries import q_token_quantiles

    got = q_token_quantiles(SF_DIR)
    exact = _duck(
        "SELECT quantile_disc(len(string_split(text, ' ')), [0.5, 0.9, 0.99])"
        " AS qs FROM documents")["qs"].iloc[0]
    for (_, row), ex in zip(got.iterrows(), list(exact)):
        upper = row["n_tokens_le"]
        assert ex <= upper + 1e-9, (row["quantile"], ex, upper)
        assert ex > upper / (2 ** (1 / 8)) - 1.5, (row["quantile"], ex, upper)


@pytest.mark.usefixtures("ray_session")
def test_embedding_centroids_exact_and_deterministic():
    """Per-label centroids (long format) match same-order (vec_id-sorted,
    float64) numpy EXACTLY — the operator's determinism contract — and a
    rerun is bit-identical."""
    import numpy as np
    import pyarrow.parquet as pq

    from scraper_ray.pipelines.queries import q_embedding_centroids

    got = q_embedding_centroids(SF_DIR)
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"]).to_pandas()
    t = t.sort_values(["label", "vec_id"])
    for label, sub in t.groupby("label"):
        m = np.array(sub["embedding"].to_list(), dtype=np.float64)
        truth = m.sum(axis=0) / len(sub)
        rows = got[got["label"] == label].sort_values("dim")
        assert (rows["n"] == len(sub)).all()
        assert np.array_equal(rows["value"].to_numpy(), truth), label
    again = q_embedding_centroids(SF_DIR)
    pd.testing.assert_frame_equal(got, again)


@pytest.mark.usefixtures("ray_session")
def test_data_mixture_batch_invariant_and_within_budget():
    """The batch-local pre-truncation (drop rows whose batch-local cumsum
    already exceeds the source budget — the bound that keeps the exchange
    ~budget-sized at scale) must be LOSSLESS: tiny batches give the
    bit-identical selection. And every source stays within its integer
    budget."""
    from scraper_ray.pipelines.queries import MIXTURE_BUDGET, q_data_mixture

    big = q_data_mixture(SF_DIR)
    small = q_data_mixture(SF_DIR, batch_size=32)
    pd.testing.assert_frame_equal(big, small)

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    all_srcs = pc.unique(pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["source"])["source"]
        .combine_chunks()).to_pylist()
    sw = sum(len(s) % 3 + 1 for s in all_srcs)
    per_src = big.groupby("source")["cum_tokens"].max()
    for s, cum in per_src.items():
        assert cum <= (MIXTURE_BUDGET * (len(s) % 3 + 1)) // sw, (s, cum)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitter_exact_refuses_insufficient_capacity():
    """The 'exact' variant must raise loudly when distinct keys exceed
    capacity (eviction would silently turn it approximate) rather than
    hash-mismatch downstream."""
    from scraper_ray.pipelines.queries import q_heavy_hitter_users_exact

    with pytest.raises(ValueError, match="exact-mode precondition"):
        q_heavy_hitter_users_exact(SF_DIR, capacity=4)


def test_scrub_pii_properties():
    """Property: on digit/@-free word text with planted emails+IPs, the
    scrub is idempotent, counts agree with Python re (a THIRD regex
    engine beside pyarrow-RE2 and DuckDB-RE2), and no IPv4 pattern
    survives scrubbing."""
    import re

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from scraper_ray.pipelines.queries import (
        PII_EMAIL_RE, PII_IP_RE, scrub_pii,
    )

    words = st.text(alphabet="abc xyz", min_size=0, max_size=40)
    email = st.integers(0, 999).map(lambda i: f"u{i}@ex{i % 7}.com")
    ip = st.tuples(*[st.integers(0, 255)] * 4).map(
        lambda t: ".".join(map(str, t)))
    piece = st.one_of(words, email, ip)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(piece, min_size=0, max_size=8))
    def check(pieces):
        text = " ".join(pieces)
        t = pa.table({"text": [text]})
        s1 = scrub_pii(t)
        # the FULL sequential transform (email pass, then IP pass on the
        # email-redacted text) agrees with Python re, and the counts are
        # the replacements actually performed
        t1, ne = re.subn(PII_EMAIL_RE, "<EMAIL>", text)
        t2, ni = re.subn(PII_IP_RE, "<IP>", t1)
        assert s1["n_email"][0].as_py() == ne
        assert s1["n_ip"][0].as_py() == ni
        out1 = s1["text"][0].as_py()
        assert out1 == t2
        assert not re.search(PII_IP_RE, out1)
        # idempotent on this input class (no @/digits outside the planted
        # patterns, pieces space-separated)
        s2 = scrub_pii(pa.table({"text": [out1]}))
        assert s2["text"][0].as_py() == out1
        assert s2["n_email"][0].as_py() == 0
        assert s2["n_ip"][0].as_py() == 0

    check()


@pytest.mark.usefixtures("ray_session")
def test_data_mixture_refuses_unbounded_source_cardinality(monkeypatch):
    """No bucketed fallback exists for the weight map (the semantics need
    every source's weight), so a pathological source cardinality must fail
    loudly, not accumulate unbounded driver state."""
    from scraper_ray.pipelines import queries as qq

    monkeypatch.setattr(qq, "_collect_keys", lambda *a, **k: None)
    with pytest.raises(ValueError, match="broadcast limit"):
        qq.q_data_mixture(SF_DIR)
