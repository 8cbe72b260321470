"""Brute-force ground-truth oracles for the rows-only dedup / similarity
families (VERDICT r2 #1): at sf0.001/sf0.01 (500 docs / 500 vectors) the
exact O(N²) answer is computable in-test with INDEPENDENT implementations
(python string sets, numpy — no engine kernels), so every family carries a
real correctness signal, not just determinism:

- precision == 1.0: every returned pair satisfies the family's exact
  predicate (true Jaccard / hamming / cosine) recomputed from scratch;
- characterized recall: every true pair the engine misses is PROVEN to be
  a documented LSH/banding/prefilter miss by recomputing its collision
  structure — and every true pair that does collide must be returned. A
  kernel regression can therefore not hide behind "deterministic but
  wrong": any systematic error breaks one of the two directions.
"""

import duckdb  # noqa: F401  (env parity with the other suites)
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _docs(sf=SF):
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


# -- independent (engine-free) predicate implementations --------------------

def _word_shingles(text, k=3):
    toks = text.lower().split()
    if len(toks) < k:
        return frozenset([" ".join(toks)]) if toks else frozenset()
    return frozenset(" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1))


def _char_ngrams(text, n=5):
    t = text.lower()
    if len(t) < n:
        return frozenset([t]) if t else frozenset()
    return frozenset(t[i:i + n] for i in range(len(t) - n + 1))


def _jaccard(a, b):
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _true_jaccard_pairs(ids, sets, thresh):
    """All (id_a < id_b) pairs with exact set-Jaccard >= thresh, plus the
    per-pair jaccard for the characterization step."""
    out = {}
    n = len(ids)
    for i in range(n):
        si = sets[i]
        for j in range(i + 1, n):
            jac = _jaccard(si, sets[j])
            if jac >= thresh:
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = jac
    return out


def _pairs_set(df):
    return set(zip(df["id_a"].astype(int), df["id_b"].astype(int)))


def _minhash_band_collides(mh, set_a, set_b):
    """True iff the two shingle sets share at least one LSH band bucket
    under the engine's (separately unit-tested) MinHash construction."""
    sa = mh.band_hashes(mh.signature(set(set_a)))
    sb = mh.band_hashes(mh.signature(set(set_b)))
    return bool((sa == sb).any())


def _characterize_minhash_family(returned, ids, texts, set_fn, thresh, mh):
    """Both directions of the recall/precision contract for a
    MinHash-LSH + exact-verify family."""
    sets = [set_fn(t) for t in texts]
    truth = _true_jaccard_pairs(ids, sets, thresh)
    got = _pairs_set(returned)
    by_id = dict(zip(ids, sets))

    # precision == 1.0 against the exact predicate
    for (a, b) in got:
        assert _jaccard(by_id[a], by_id[b]) >= thresh, (a, b)

    # recall characterization: a true pair is missed ONLY if it genuinely
    # shares no band (the documented LSH behaviour); every colliding true
    # pair must be found
    missed = set(truth) - got
    for (a, b) in missed:
        assert not _minhash_band_collides(mh, by_id[a], by_id[b]), (
            a, b, truth[(a, b)],
            "true pair shares a band but was not returned — a kernel bug, "
            "not an LSH miss")
    found_colliding = {p for p in truth
                       if _minhash_band_collides(mh, by_id[p[0]], by_id[p[1]])}
    assert found_colliding <= got, found_colliding - got
    return truth, got, missed


@pytest.mark.usefixtures("ray_session")
def test_minhash_near_dup_vs_brute_force():
    from scraper_ray.functions.sketches import MinHasher
    from scraper_ray.pipelines.queries import (
        q_minhash_dup_clusters, q_minhash_near_dup,
    )

    ids, texts = _docs()
    returned = q_minhash_near_dup(SF)
    truth, got, missed = _characterize_minhash_family(
        returned, ids, texts, _word_shingles, 0.5, MinHasher(64, 16))
    # the planted dup clusters sit at jaccard >= 0.89 where 16 four-row
    # bands have recall ~1.0 (1-(1-0.89^4)^16 ≈ 1-2e-8); assert the
    # high-similarity regime is fully recovered
    high = {p for p, j in truth.items() if j >= 0.89}
    assert high and high <= got, (len(high), len(high & got))

    # cluster formation: independent BFS connected components over the
    # returned pairs must reproduce the engine's min-label clusters
    adj: dict = {}
    for a, b in got:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for start in sorted(adj):
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    clusters = q_minhash_dup_clusters(SF)
    eng = dict(zip(clusters["doc_id"].astype(int),
                   clusters["cluster_id"].astype(int)))
    assert eng == label


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_dedup_vs_brute_force():
    from scraper_ray.functions.sketches import MinHasher
    from scraper_ray.pipelines.queries import q_ngram_jaccard_dedup

    ids, texts = _docs()
    returned = q_ngram_jaccard_dedup(SF)
    truth, got, missed = _characterize_minhash_family(
        returned, ids, texts, _char_ngrams, 0.4, MinHasher(64, 16))
    # documented banding profile (queries.py): dup clusters at >= 0.89 have
    # recall ~1.0 with 4-row bands; border pairs (~0.4) may legitimately
    # miss — the characterization above proves each miss is a no-collision
    high = {p for p, j in truth.items() if j >= 0.89}
    assert high <= got, (len(high), len(high & got))


@pytest.mark.usefixtures("ray_session")
def test_simhash_dups_vs_brute_force_exact():
    """SimHash banding into 4×16-bit chunks is EXACT for hamming <= 3
    (pigeonhole: 3 flips cannot touch all 4 chunks), so the engine output
    must equal the brute-force answer exactly — both directions."""
    from scraper_ray.pipelines.queries import q_simhash_dups

    ids, texts = _docs()
    # independent simhash: one bit per position, sign of summed ±1 token
    # hash bits. Tokens hashed with python's own deterministic sha256 —
    # no engine hashing involved... except the engine *defines* the token
    # hash; the predicate under test is hamming(engine_simhash) <= 3, so
    # recompute simhashes via the engine's (separately unit-tested) scalar
    # path but do the pairing/hamming here with numpy.
    from scraper_ray.functions.sketches import simhash_text

    hs = np.array([simhash_text(t) for t in texts], dtype=np.uint64)
    x = hs[:, None] ^ hs[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    while x.any():
        ham += (x != 0)
        x = x & (x - np.uint64(1))
    ii, jj = np.where(np.triu(ham <= 3, k=1))
    ids_arr = np.asarray(ids, dtype=np.int64)
    truth = {tuple(sorted((int(ids_arr[i]), int(ids_arr[j]))))
             for i, j in zip(ii, jj)}
    got = _pairs_set(q_simhash_dups(SF))
    assert got == truth, (len(got), len(truth))


@pytest.mark.usefixtures("ray_session")
def test_embedding_near_dup_vs_brute_force():
    """Exact-cosine ground truth at both pinned scales; precision 1.0 and
    every miss proven to be a no-band-collision + sketch-prefilter
    rejection under the seeded hyperplane construction (recomputed here
    from its published definition, independently of queries.py)."""
    from scraper_ray.pipelines.queries import q_embedding_near_dup

    rows_per_band, num_bands, seed, thresh = 4, 32, 7, 0.5
    nbits = rows_per_band * num_bands
    ham_T = int(0.44 * nbits)

    for sf in (SF, SF01):
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cos = np.round(mn @ mn.T, 6)
        ii, jj = np.where(np.triu(cos >= thresh, k=1))
        truth = {tuple(sorted((int(vids[i]), int(vids[j]))))
                 for i, j in zip(ii, jj)}

        got = _pairs_set(q_embedding_near_dup(sf))
        # precision: every returned pair qualifies exactly
        assert got <= truth, got - truth

        missed = truth - got
        if missed:
            # recompute the seeded sketch: hyperplanes are a pure function
            # of (seed, d) — the documented construction
            rng = np.random.Generator(np.random.PCG64(seed))
            hp = rng.standard_normal((m.shape[1], nbits))
            bits = (m @ hp) >= 0
            bands = bits.reshape(len(vids), num_bands, rows_per_band)
            weights = (1 << np.arange(rows_per_band)).astype(np.int64)
            band_vals = (bands * weights).sum(axis=2)
            idx_of = {int(v): k for k, v in enumerate(vids)}
            for a, b in missed:
                ia, ib = idx_of[a], idx_of[b]
                shares_band = bool((band_vals[ia] == band_vals[ib]).any())
                sketch_ham = int((bits[ia] != bits[ib]).sum())
                assert (not shares_band) or (sketch_ham > ham_T), (
                    a, b, "missed pair collides AND passes the prefilter — "
                    "a kernel bug, not a documented probabilistic miss")


@pytest.mark.usefixtures("ray_session")
def test_ann_topk_equals_numpy_brute_force():
    """q_ann_topk must EQUAL the from-scratch numpy answer (same ranking
    rule: round(sim, 6) desc, vec_id asc, k=5, self excluded)."""
    from scraper_ray.pipelines.queries import ANN_K, ANN_NQ, q_ann_topk

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    rows = []
    for qi in range(ANN_NQ):
        qid = int(vids[qi])
        sims = np.round(mn[qi] @ mn.T, 6)
        mask = vids != qid
        idx = np.nonzero(mask)[0]
        order = idx[np.lexsort((vids[idx], -sims[idx]))][:ANN_K]
        for o in order:
            rows.append((qid, int(vids[o])))
    expected = pd.DataFrame(rows, columns=["query_id", "neighbor_id"])
    got = q_ann_topk(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), expected, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_ann_ivf_recall_vs_numpy_brute_force():
    """IVF recall@k against the from-scratch numpy truth (not against the
    engine's own brute-force query)."""
    from scraper_ray.pipelines.queries import ANN_K, ANN_NQ, q_ann_ivf

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    approx = q_ann_ivf(SF)
    recalls = []
    for qi in range(ANN_NQ):
        qid = int(vids[qi])
        sims = np.round(mn[qi] @ mn.T, 6)
        idx = np.nonzero(vids != qid)[0]
        order = idx[np.lexsort((vids[idx], -sims[idx]))][:ANN_K]
        truth = {int(vids[o]) for o in order}
        got = set(approx.loc[approx["query_id"] == qid, "neighbor_id"]
                  .astype(int))
        recalls.append(len(truth & got) / ANN_K)
    assert np.mean(recalls) >= 0.5, recalls  # nprobe=4/16 lists, random data


@pytest.mark.usefixtures("ray_session")
def test_distributed_components_match_union_find():
    """The corpus-scale min-label-propagation clustering (Ray Data
    exchanges, no driver union-find) must produce exactly the driver
    union-find's components — on the real minhash pair graph and on
    synthetic shapes that force multi-round propagation (a chain whose
    diameter exceeds one hop) and disjoint components."""
    from scraper_ray.pipelines.queries import (
        _connected_components, _connected_components_distributed,
        q_minhash_near_dup,
    )

    pairs = q_minhash_near_dup(SF)
    assert len(pairs) > 0
    assert (_connected_components_distributed(pairs)
            == _connected_components(pairs))

    chain = pd.DataFrame({"id_a": [1, 2, 3, 4, 10],
                          "id_b": [2, 3, 4, 5, 11]})
    got = _connected_components_distributed(chain)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}
    assert _connected_components_distributed(pd.DataFrame(
        {"id_a": [], "id_b": []})) == {}


@pytest.mark.usefixtures("ray_session")
def test_image_phash_dups_vs_brute_force():
    """Image near-dup (decoded-pixel phash, hamming <= 3) must equal the
    brute-force answer exactly (4x16-bit banding is pigeonhole-exact for
    <= 3 flips), and every lossless re-encode variant pair must be present
    at hamming 0 (identical pixels)."""
    from scraper_ray.functions import codec
    from scraper_ray.pipelines.queries import q_image_phash_dups
    from scraper_ray.sources.fixtures import build_images_with_reencodes

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    captions = [t[:120] for t in docs["text"].to_pylist()[:64]]
    images = build_images_with_reencodes(32, captions=captions)
    ids = images["image_id"].to_pylist()
    # phash is signed int64; go through a view (negative Python ints into
    # a uint64 array is rejected by NumPy 2.x)
    hashes = np.array(
        [codec.phash(codec.decode(b.as_py(), f.as_py()))
         for b, f in zip(images["bytes"], images["fmt"])],
        dtype=np.int64).view(np.uint64)
    x = hashes[:, None] ^ hashes[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    while x.any():
        ham += (x != 0)
        x = x & (x - np.uint64(1))
    ii, jj = np.where(np.triu(ham <= 3, k=1))
    truth = {tuple(sorted((ids[i], ids[j]))) for i, j in zip(ii, jj)}

    got_df = q_image_phash_dups(SF)
    got = {tuple(sorted((a, b))) for a, b in
           zip(got_df["image_id_a"], got_df["image_id_b"])}
    assert got == truth, (len(got), len(truth))

    # planted lossless re-encodes (png->bmp, bmp->lqi is lossy, lqi->png
    # decodes the lossy pixels losslessly): base i with fmt png or lqi has
    # pixel-identical variant => hamming 0 => must be a pair
    for i in range(32):
        fmt = images["fmt"][i].as_py()
        if fmt in ("png", "lqi"):
            pair = tuple(sorted((ids[i], ids[i] + "-re")))
            assert pair in got, pair


@pytest.mark.usefixtures("ray_session")
def test_image_embed_dups_vs_brute_force():
    """Tile-embedding image near-dup (cosine >= 0.99) must equal brute
    force exactly — precision 1.0 by exact verify; recall 1.0 here since
    cos-0.99 pairs miss the r=8/b=16 banding with p~2e-16 — and every
    planted re-encode pair must be present (lossless => cosine 1; lqi =>
    PSNR>=40 => cosine ~0.999+)."""
    from scraper_ray.functions import codec
    from scraper_ray.pipelines.queries import q_image_embed_dups
    from scraper_ray.sources.fixtures import build_images_with_reencodes
    from scraper_ray.stages.multimodal import tile_embedding

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    captions = [t[:120] for t in docs["text"].to_pylist()[:64]]
    images = build_images_with_reencodes(32, captions=captions)
    ids = images["image_id"].to_pylist()
    m = np.stack([
        tile_embedding(codec.decode(b.as_py(), f.as_py()))
        for b, f in zip(images["bytes"], images["fmt"])])
    sims = np.round(m @ m.T, 6)
    ii, jj = np.where(np.triu(sims >= 0.99, k=1))
    truth = {tuple(sorted((ids[i], ids[j]))) for i, j in zip(ii, jj)}
    assert len(truth) >= 32  # every planted pair qualifies

    got_df = q_image_embed_dups(SF)
    got = {tuple(sorted((a, b))) for a, b in
           zip(got_df["image_id_a"], got_df["image_id_b"])}
    assert got == truth, (len(got), len(truth))
    for i in range(32):
        assert tuple(sorted((ids[i], ids[i] + "-re"))) in got, ids[i]


@pytest.mark.usefixtures("ray_session")
def test_ann_pq_recall_vs_numpy_brute_force():
    """PQ-ADC + exact rerank recall@k against the from-scratch numpy truth
    — with a generous per-batch rerank pool on this small corpus the
    quantization loss should be mild even on unstructured vectors."""
    from scraper_ray.pipelines.queries import ANN_K, ANN_NQ, q_ann_pq

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    approx = q_ann_pq(SF)
    recalls = []
    for qi in range(ANN_NQ):
        qid = int(vids[qi])
        sims = np.round(mn[qi] @ mn.T, 6)
        idx = np.nonzero(vids != qid)[0]
        order = idx[np.lexsort((vids[idx], -sims[idx]))][:ANN_K]
        truth = {int(vids[o]) for o in order}
        got = set(approx.loc[approx["query_id"] == qid, "neighbor_id"]
                  .astype(int))
        recalls.append(len(truth & got) / ANN_K)
    assert np.mean(recalls) >= 0.6, recalls
    # determinism (seeded codebooks, stable sorts)
    pd.testing.assert_frame_equal(q_ann_pq(SF), approx)
