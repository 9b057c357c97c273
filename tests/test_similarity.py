"""Similarity-search operator tests with a known geometry."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sdlt_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
        (4, [0.7, 0.7, 0.0, 0.0]),   # 45 degrees
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_order(vecs):
    out = sim.cosine_topk(vecs.filter(F.col("vec_id") != 0), "embedding", "vec_id", [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 4, 2]
    assert out[0]["cos_sim"] == pytest.approx(0.9 / math.hypot(0.9, 0.1), abs=1e-4)


def test_neardup_pairs_threshold(vecs):
    out = sim.neardup_cosine_pairs(vecs, "embedding", "vec_id", threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 1)}


def test_ann_lsh_contains_true_neighbor(vecs):
    """The query's own bucket must contain the (identical-direction) top hit."""
    out = sim.ann_lsh_topk(
        vecs.filter(F.col("vec_id") != 0), "embedding", "vec_id", [1.0, 0.0, 0.0, 0.0], k=3, num_planes=4
    ).collect()
    assert out, "query bucket unexpectedly empty"
    assert out[0]["vec_id"] == 1  # nearest neighbor shares the sign sketch


def test_ann_bucket_is_subset_of_exact(vecs, spark):
    exact = sim.cosine_topk(vecs, "embedding", "vec_id", [1.0, 0.0, 0.0, 0.0], k=5).collect()
    approx = sim.ann_lsh_topk(vecs, "embedding", "vec_id", [1.0, 0.0, 0.0, 0.0], k=5, num_planes=4).collect()
    exact_ids = [r["vec_id"] for r in exact]
    for r in approx:
        assert r["vec_id"] in exact_ids


def test_neardup_lsh_subset_of_exact_with_recall(spark):
    """On the fixture embeddings: every LSH pair must appear in the exact
    answer with the same similarity (precision 1.0 by construction), and
    single-probe recall should be nontrivial."""
    from sdlt_spark import tables

    emb = tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in sim.neardup_cosine_pairs(emb, "embedding", "vec_id", threshold=0.40).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in sim.neardup_cosine_lsh(
            emb, "embedding", "vec_id", threshold=0.40, num_tables=6, num_planes=4
        ).collect()
    }
    assert set(approx) <= set(exact)
    for k, v in approx.items():
        assert v == pytest.approx(exact[k], abs=1e-4)
    # 0.40-cosine pairs sit at ~66 deg; 4 planes x 6 tables ≈ 0.55 recall —
    # just require we found a meaningful fraction, deterministic via seed
    assert len(approx) >= len(exact) * 0.3


def test_ivf_topk_recall_on_fixture(spark):
    """IVF-probed top-k vs brute force on the fixture embeddings: probing
    4/16 cells must keep most of the true top-10 (clustered corpus routes
    neighbors to the same cell), and every returned similarity must equal
    the exact value (precision is exact by construction)."""
    from sdlt_spark import tables

    emb = tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"]: r["cos_sim"] for r in sim.cosine_topk(corpus, "embedding", "vec_id", query, k=10).collect()}
    approx = {r["vec_id"]: r["cos_sim"] for r in sim.ann_ivf_topk(corpus, "embedding", "vec_id", query, k=10, n_cells=16, nprobe=6).collect()}
    hits = set(approx) & set(exact)
    assert len(hits) >= 6, f"recall too low: {len(hits)}/10"
    for vid in hits:
        assert approx[vid] == pytest.approx(exact[vid], abs=1e-4)
    # probing more cells can only widen the scanned set -> recall is monotone
    few = {r["vec_id"] for r in sim.ann_ivf_topk(corpus, "embedding", "vec_id", query, k=10, n_cells=16, nprobe=2).collect()}
    assert len(few & set(exact)) <= len(hits)
    # probing every cell degenerates to the exact scan
    all_cells = {r["vec_id"] for r in sim.ann_ivf_topk(corpus, "embedding", "vec_id", query, k=10, n_cells=16, nprobe=16).collect()}
    assert all_cells == set(exact)


def test_ann_recall_at_10_pinned_sf001(spark):
    """Quantified recall oracle for the rows-only ANN registry entries:
    recall@10 vs the exact cosine_topk at sf0.01 with pinned seeds. The
    values are EXACT pins, not lower bounds — any change to the hash
    family, plane generation, centroid training, or pruning that shifts
    retrieval quality fails here (regression tripwire for entries the
    driver can only rows-check).

    Fixture geometry, measured: the sf0.01 embedding corpus is near-random
    (max pairwise cosine 0.513, between vec 169 and 466), so single-probe
    sign-LSH recall is legitimately near zero (P[same 4-plane sketch at
    cos 0.51] ~ 0.2) — its pin is a determinism tripwire, not a quality
    bar; IVF with 6/16 probes holds 7 of the true top-10 even on
    unclustered data, which IS a quality pin."""
    from sdlt_spark import tables

    emb = tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    query = list(emb.filter(F.col("vec_id") == 169).select("embedding").head()[0])
    corpus = emb.filter(F.col("vec_id") != 169)
    exact = [
        r["vec_id"]
        for r in sim.cosine_topk(corpus, "embedding", "vec_id", query, k=10).collect()
    ]
    assert exact[0] == 466  # the planted-by-geometry nearest neighbor
    lsh = {
        r["vec_id"]
        for r in sim.ann_lsh_topk(
            corpus, "embedding", "vec_id", query, k=10, num_planes=4
        ).collect()
    }
    assert len(lsh & set(exact)) == 1  # exact pin (deterministic seeds)
    ivf = {
        r["vec_id"]
        for r in sim.ann_ivf_topk(
            corpus, "embedding", "vec_id", query, k=10, n_cells=16, nprobe=6
        ).collect()
    }
    assert len(ivf & set(exact)) == 7  # exact pin at 6/16 probes


def test_ivf_assignment_is_deterministic_and_total(spark):
    """Every vector gets exactly one cell id in [0, n_cells); same seed,
    same assignment."""
    from sdlt_spark import tables

    emb = tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    cents = sim.train_ivf_centroids(emb, "embedding", n_cells=8, sample_rows=512, seed=7)
    a1 = sim.ivf_assign(emb, "embedding", cents).select("vec_id", "__cell")
    counts = a1.groupBy("__cell").count().collect()
    assert sum(r["count"] for r in counts) == emb.count()
    assert all(0 <= r["__cell"] < 8 for r in counts)
    cents2 = sim.train_ivf_centroids(emb, "embedding", n_cells=8, sample_rows=512, seed=7)
    a2 = sim.ivf_assign(emb, "embedding", cents2).select("vec_id", "__cell")
    assert a1.exceptAll(a2).isEmpty()


def test_ivf_persisted_index_prunes_and_matches(spark, tmp_path):
    """ivf_build + ivf_search: (1) same results as the train-per-query
    ann_ivf_topk with the same seed, (2) probes read a strict subset of the
    index files (zone-map pruning on __cell)."""
    from sdlt_spark import tables
    from sdlt_spark.operators import similarity as sim
    from sdlt_spark.store import VintageTable

    sf = "/root/testdata/sf0.001"
    emb = tables.load(spark, sf, "embeddings")
    query = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    corpus = emb.filter(F.col("vec_id") != 0)

    path = str(tmp_path / "index")
    t, cents = sim.ivf_build(corpus, "embedding", "vec_id", path, n_cells=16)
    got = sim.ivf_search(spark, path, "embedding", "vec_id", query, k=10, nprobe=6)
    direct = sim.ann_ivf_topk(
        corpus, "embedding", "vec_id", query, k=10, n_cells=16, nprobe=6
    )
    key = lambda r: (r["vec_id"], round(r["cos_sim"], 6))
    assert sorted(map(key, got.collect())) == sorted(map(key, direct.collect()))

    # pruning: the probed file set is strictly smaller than the index
    live = t._live_files()
    assert len(live) >= 2
    probe_files = {
        f for c in range(16) for f in t._prune_by_range(live, "__cell", c, c)
    }
    one_cell = t._prune_by_range(live, "__cell", 0, 0)
    assert len(one_cell) < len(live)


def test_ann_recall_on_planted_neighbor_fixture(spark):
    """Round-5 verdict item 7: the sf0.01 corpus is near-random (max
    pairwise cos 0.513), so its recall pins are determinism tripwires, not
    quality bars. This fixture PLANTS structure — 20 tight clusters
    (intra-cluster cos ~0.999) — and demands recall@10 >= 0.9 from both
    ANN paths, a meaningful quality regression gate: a broken hash family,
    plane generator, or centroid trainer cannot stay above it."""
    import numpy as np

    rng = np.random.default_rng(123)
    dim, n_clusters, per = 16, 20, 50
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for c in range(n_clusters):
        p = centers[c] + 0.02 * rng.normal(size=(per, dim))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        pts.append(p)
    pts = np.vstack(pts)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<float>",
    )
    q = centers[0] + 0.02 * rng.normal(size=dim)
    q = (q / np.linalg.norm(q)).tolist()
    exact = [
        r["vec_id"]
        for r in sim.cosine_topk(df, "embedding", "vec_id", q, k=10).collect()
    ]
    # sanity: the true top-10 are all from the query's planted cluster
    assert all(v < per for v in exact)
    lsh = {
        r["vec_id"]
        for r in sim.ann_lsh_topk(
            df, "embedding", "vec_id", q, k=10, num_planes=6
        ).collect()
    }
    assert len(lsh & set(exact)) >= 9, sorted(lsh)
    ivf = {
        r["vec_id"]
        for r in sim.ann_ivf_topk(
            df, "embedding", "vec_id", q, k=10, n_cells=16, nprobe=2
        ).collect()
    }
    assert len(ivf & set(exact)) >= 9, sorted(ivf)


def test_ann_pq_recall_on_planted_neighbor_fixture(spark):
    """PQ/ADC quality gate on the same planted-cluster fixture as the
    LSH/IVF paths: asymmetric-distance top-10 must recover >= 9 of the
    exact top-10 — a broken codebook trainer, encoder, or ADC table
    cannot stay above it. Also pins the memory contract: every code is
    in [0, 2^nbits)."""
    import numpy as np

    rng = np.random.default_rng(123)
    dim, n_clusters, per = 16, 20, 50
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = []
    for c in range(n_clusters):
        p = centers[c] + 0.02 * rng.normal(size=(per, dim))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        pts.append(p)
    pts = np.vstack(pts)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<float>",
    )
    q_arr = centers[0] + 0.02 * rng.normal(size=dim)
    q = (q_arr / np.linalg.norm(q_arr)).tolist()
    exact = [
        r["vec_id"]
        for r in sim.cosine_topk(df, "embedding", "vec_id", q, k=10).collect()
    ]
    pq = {
        r["vec_id"]
        for r in sim.ann_pq_topk(
            df, "embedding", "vec_id", q, k=10, m=4, nbits=4
        ).collect()
    }
    assert len(pq & set(exact)) >= 9, sorted(pq)
    # code-range contract (the m-bytes-per-row memory story)
    books = sim.train_pq_codebooks(df, "embedding", m=4, nbits=4)
    codes = sim.pq_encode(df, "embedding", books).select("__pq").collect()
    flat = [c for r in codes for c in r["__pq"]]
    assert all(0 <= c < 16 for c in flat)
    # null vectors encode as null, not a crash
    df2 = spark.createDataFrame(
        [(0, [0.0] * 16), (1, None)], "vec_id long, embedding array<float>"
    )
    enc = {
        r["vec_id"]: r["__pq"]
        for r in sim.pq_encode(df2, "embedding", books).collect()
    }
    assert enc[1] is None and len(enc[0]) == 4


def test_ann_pq_null_vectors_never_enter_shortlist(spark):
    """Null embeddings must neither crash codebook training nor crowd the
    ADC shortlist (NULL distances would sort NULLS FIRST): the top-k is
    entirely real ids."""
    import numpy as np

    rng = np.random.default_rng(5)
    pts = rng.normal(size=(40, 8))
    rows = [(i, [float(x) for x in pts[i]]) for i in range(40)]
    rows += [(100 + i, None) for i in range(25)]  # more nulls than k*rerank/2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in pts[0]]
    got = sim.ann_pq_topk(df, "embedding", "vec_id", q, k=5, m=4, nbits=4).collect()
    assert len(got) == 5
    assert all(r["vec_id"] < 100 and r["cos_sim"] is not None for r in got)


def test_ivf_refresh_follows_corpus_mutations(spark, tmp_path):
    """Round-10 (round-9 verdict next item 3): after the corpus table
    merges + deletes, ivf_refresh folds the CDC deltas into the persisted
    index and the refreshed index state equals ivf_assign(corpus_now,
    old_centroids) EXACTLY — so a probe never serves stale cells. Replay
    of the same refresh is a no-op (txn watermark)."""
    from sdlt_spark import tables
    from sdlt_spark.operators import similarity as sim
    from sdlt_spark.store import VintageTable

    sf = "/root/testdata/sf0.001"
    emb = tables.load(spark, sf, "embeddings").filter(F.col("vec_id") != 0)

    # corpus lives in a vintage table with a materialized change feed
    corpus = VintageTable(spark, str(tmp_path / "corpus"), change_feed=True)
    v0 = corpus.write(emb.select("vec_id", "embedding"))
    path = str(tmp_path / "index")
    t, cents = sim.ivf_build(
        corpus.read(), "embedding", "vec_id", path, n_cells=16,
        txn_id=f"ivf_refresh:{v0}",
    )

    # mutate: delete a slice, update some vectors (scale by -1 moves them
    # across cells), insert brand-new ids
    corpus.delete("vec_id % 7 = 0")
    upd = (
        emb.filter((F.col("vec_id") % 7 != 0) & (F.col("vec_id") % 5 == 1))
        .select(
            "vec_id",
            F.transform("embedding", lambda x: -x).alias("embedding"),
        )
    )
    corpus.merge(upd, ["vec_id"])
    fresh = emb.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    corpus.merge(fresh, ["vec_id"])

    rep = sim.ivf_refresh(corpus, path, "embedding", "vec_id")
    assert rep["upserts"] > 0 and rep["deletes"] > 0

    # refreshed index contents == from-scratch re-assign with the SAME
    # centroids over the mutated corpus (unless a rebuild retrained)
    if not rep["rebuilt"]:
        want = {
            (r["vec_id"], r["__cell"])
            for r in sim.ivf_assign(corpus.read(), "embedding", cents)
            .select("vec_id", "__cell")
            .collect()
        }
        got = {
            (r["vec_id"], r["__cell"])
            for r in t.read().select("vec_id", "__cell").collect()
        }
        assert got == want
    # probe over the refreshed index == probe over a from-scratch
    # re-assign restricted the same way (exact cosine re-rank both sides)
    query = list(
        tables.load(spark, sf, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .head()[0]
    )
    got = sim.ivf_search(spark, path, "embedding", "vec_id", query, k=10, nprobe=16)
    brute = sim.cosine_topk(corpus.read(), "embedding", "vec_id", query, k=10)
    key = lambda r: (r["vec_id"], round(r["cos_sim"], 6))
    # nprobe=16 == all cells: the probe must equal exact brute force
    assert sorted(map(key, got.collect())) == sorted(map(key, brute.collect()))

    # replay: same watermark -> pure no-op, index version unchanged
    v_after = t.latest_version()
    rep2 = sim.ivf_refresh(corpus, path, "embedding", "vec_id")
    assert rep2["upserts"] == 0 and rep2["deletes"] == 0
    assert t.latest_version() == v_after

    # an unwatermarked index refuses to guess its corpus version
    t2, _ = sim.ivf_build(
        corpus.read(), "embedding", "vec_id", str(tmp_path / "bare"), n_cells=4
    )
    with pytest.raises(ValueError, match="watermark"):
        sim.ivf_refresh(corpus, str(tmp_path / "bare"), "embedding", "vec_id")


def test_ivf_refresh_rebalances_on_drift(spark, tmp_path):
    """When mutations pile one cell past rebalance_factor x the mean, the
    refresh triggers a full rebuild: fresh centroids, re-clustered files,
    same watermark."""
    import numpy as np

    from sdlt_spark.operators import similarity as sim
    from sdlt_spark.store import VintageTable

    rng = np.random.RandomState(7)
    base = [(i, rng.randn(8).tolist()) for i in range(200)]
    corpus = VintageTable(spark, str(tmp_path / "c"), change_feed=True)
    v0 = corpus.write(
        spark.createDataFrame(base, "vec_id long, embedding array<double>")
    )
    path = str(tmp_path / "i")
    t, cents = sim.ivf_build(
        corpus.read(), "embedding", "vec_id", path, n_cells=8,
        txn_id=f"ivf_refresh:{v0}",
    )
    # pile 2000 near-identical vectors into one spot -> one hot cell
    hot = rng.randn(8)
    hot /= np.linalg.norm(hot)
    pile = [
        (10_000 + i, (hot + 0.001 * rng.randn(8)).tolist()) for i in range(2000)
    ]
    corpus.merge(
        spark.createDataFrame(pile, "vec_id long, embedding array<double>"),
        ["vec_id"],
    )
    rep = sim.ivf_refresh(corpus, path, "embedding", "vec_id", rebalance_factor=4.0)
    assert rep["rebuilt"] is True
    # rebuilt index covers the whole mutated corpus and serves exact
    # results at full probe width
    assert t.read().count() == 2200
    q = pile[0][1]
    got = sim.ivf_search(spark, path, "embedding", "vec_id", q, k=5, nprobe=8)
    brute = sim.cosine_topk(corpus.read(), "embedding", "vec_id", q, k=5)
    key = lambda r: round(r["cos_sim"], 6)
    assert sorted(map(key, got.collect())) == sorted(map(key, brute.collect()))


def test_ivf_refresh_drift_probe_is_incremental(spark, tmp_path, monkeypatch):
    """Round-11 (verdict item 4): a non-rebuild refresh must perform ZERO
    VintageTable.read calls — the drift probe folds the index's own
    materialized change feed into the sidecar's population vector instead
    of re-scanning the index — and the maintained populations must equal
    a full recompute exactly."""
    from sdlt_spark import tables
    from sdlt_spark.operators import similarity as sim
    from sdlt_spark.store import VintageTable

    sf = "/root/testdata/sf0.001"
    emb = tables.load(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    corpus = VintageTable(spark, str(tmp_path / "corpus"), change_feed=True)
    v0 = corpus.write(emb.select("vec_id", "embedding"))
    path = str(tmp_path / "index")
    t, cents = sim.ivf_build(
        corpus.read(), "embedding", "vec_id", path, n_cells=16,
        txn_id=f"ivf_refresh:{v0}",
    )
    corpus.delete("vec_id % 5 = 0")
    corpus.merge(
        emb.filter(F.col("vec_id") % 9 == 1)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"),
        ["vec_id"],
    )

    reads: list[str] = []
    orig_read = VintageTable.read

    def spy(self, *a, **k):
        reads.append(self.path)
        return orig_read(self, *a, **k)

    monkeypatch.setattr(VintageTable, "read", spy)
    rep = sim.ivf_refresh(
        corpus, path, "embedding", "vec_id", rebalance_factor=1e9
    )
    monkeypatch.undo()
    assert rep["upserts"] > 0 and rep["deletes"] > 0 and not rep["rebuilt"]
    assert rep["pops_source"] == "incremental"
    assert not reads, f"refresh performed full-table reads: {reads}"

    # maintained populations == full recompute over the refreshed index
    _v, _c, pops = sim._latest_ivf_build(t)
    want = {
        int(r["__cell"]): r["n"]
        for r in t.read().groupBy("__cell").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["__cell"] is not None
    }
    assert {c: int(p) for c, p in enumerate(pops) if p} == want


def test_ivf_refresh_migrates_legacy_sidecar(spark, tmp_path):
    """A pre-round-11 sidecar (bare centroid list, no populations) forces
    one rescan, after which the vector rides the sidecar and the next
    refresh folds incrementally."""
    import json
    import os
    import re

    from sdlt_spark import tables
    from sdlt_spark.operators import similarity as sim
    from sdlt_spark.store import VintageTable

    sf = "/root/testdata/sf0.001"
    emb = tables.load(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    corpus = VintageTable(spark, str(tmp_path / "corpus"), change_feed=True)
    v0 = corpus.write(emb.select("vec_id", "embedding"))
    path = str(tmp_path / "index")
    t, cents = sim.ivf_build(
        corpus.read(), "embedding", "vec_id", path, n_cells=8,
        txn_id=f"ivf_refresh:{v0}",
    )
    # rewrite the sidecar in the legacy bare-list form
    sidecars = [f for f in os.listdir(path) if re.match(r"ivf_centroids", f)]
    for f in sidecars:
        full = os.path.join(path, f)
        doc = json.load(open(full))
        json.dump(doc["centroids"], open(full, "w"))

    corpus.delete("vec_id % 4 = 1")
    rep = sim.ivf_refresh(corpus, path, "embedding", "vec_id")
    assert rep["pops_source"] == "rescan" and rep["deletes"] > 0

    corpus.merge(
        emb.filter(F.col("vec_id") % 13 == 2)
        .select((F.col("vec_id") + 2_000_000).alias("vec_id"), "embedding"),
        ["vec_id"],
    )
    rep2 = sim.ivf_refresh(corpus, path, "embedding", "vec_id")
    assert rep2["pops_source"] == "incremental" and rep2["upserts"] > 0
    _v, _c, pops = sim._latest_ivf_build(t)
    want = {
        int(r["__cell"]): r["n"]
        for r in t.read().groupBy("__cell").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["__cell"] is not None
    }
    assert {c: int(p) for c, p in enumerate(pops) if p} == want


def test_ivf_refresh_survives_missing_index_cdc(spark, tmp_path):
    """Round-12 (round-11 ADVICE): an index commit written by a
    VintageTable instance opened WITHOUT change_feed=True carries no
    materialized change data, so the incremental pops fold cannot replay
    the range — the refresh must fall back to the one-shot full rescan
    (pops_source='rescan', vector healed) instead of raising and failing
    the whole refresh."""
    from sdlt_spark import tables
    from sdlt_spark.operators import similarity as sim
    from sdlt_spark.store import VintageTable

    sf = "/root/testdata/sf0.001"
    emb = tables.load(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    corpus = VintageTable(spark, str(tmp_path / "corpus"), change_feed=True)
    v0 = corpus.write(emb.select("vec_id", "embedding"))
    path = str(tmp_path / "index")
    t, cents = sim.ivf_build(
        corpus.read(), "embedding", "vec_id", path, n_cells=8,
        txn_id=f"ivf_refresh:{v0}",
    )

    # healthy first cycle: sidecar republished WITH a population vector,
    # maintained incrementally
    corpus.delete("vec_id % 7 = 0")
    rep1 = sim.ivf_refresh(
        corpus, path, "embedding", "vec_id", rebalance_factor=None
    )
    assert rep1["deletes"] > 0 and rep1["pops_source"] == "incremental"

    # out-of-band maintenance: a writer opened without change_feed deletes
    # index rows — that commit has no _change_data to replay
    rogue = VintageTable(spark, path)
    rogue.delete("vec_id % 11 = 3")

    corpus.merge(
        emb.filter(F.col("vec_id") % 13 == 5)
        .select((F.col("vec_id") + 3_000_000).alias("vec_id"), "embedding"),
        ["vec_id"],
    )
    rep2 = sim.ivf_refresh(
        corpus, path, "embedding", "vec_id", rebalance_factor=None
    )
    assert rep2["upserts"] > 0 and rep2["pops_source"] == "rescan"
    # the healed vector matches the true cell populations, so the NEXT
    # refresh is incremental again
    _v, _c, pops = sim._latest_ivf_build(t)
    want = {
        int(r["__cell"]): r["n"]
        for r in t.read().groupBy("__cell").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["__cell"] is not None
    }
    assert {c: int(p) for c, p in enumerate(pops) if p} == want


def test_ivf_refresh_foreign_valueerror_propagates(spark, tmp_path, monkeypatch):
    """Round-13 (round-12 verdict finding 1): the missing-CDC heal catches
    EXACTLY MissingChangeDataError. Any other ValueError raised inside the
    population-fold chain is a real bug and must PROPAGATE — the previous
    broad `except ValueError` silently degraded every such failure to a
    permanent O(table) rescan."""
    from sdlt_spark import tables
    from sdlt_spark.operators import similarity as sim
    from sdlt_spark.store import VintageTable

    sf = "/root/testdata/sf0.001"
    emb = tables.load(spark, sf, "embeddings").filter(F.col("vec_id") != 0)
    corpus = VintageTable(spark, str(tmp_path / "corpus"), change_feed=True)
    v0 = corpus.write(emb.select("vec_id", "embedding"))
    path = str(tmp_path / "index")
    sim.ivf_build(
        corpus.read(), "embedding", "vec_id", path, n_cells=8,
        txn_id=f"ivf_refresh:{v0}",
    )
    corpus.delete("vec_id % 7 = 0")

    orig = VintageTable.table_changes

    def boom(self, *a, **k):
        if self.path == path:  # only the INDEX fold chain misbehaves
            raise ValueError("synthetic foreign failure")
        return orig(self, *a, **k)

    monkeypatch.setattr(VintageTable, "table_changes", boom)
    with pytest.raises(ValueError, match="synthetic foreign failure"):
        sim.ivf_refresh(corpus, path, "embedding", "vec_id", rebalance_factor=None)
