"""Regression tests for the round-1 code-review findings: each test pins a
bug that was reachable on legitimate inputs (short docs, null values,
duplicate rows, schema evolution edge states)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdlt_spark.operators import dedup, multimodal as mm
from sdlt_spark.operators.asof import asof_join
from sdlt_spark.store import VintageTable


def test_ngrams_short_docs_no_crash(spark):
    """Docs shorter than n must yield zero shingles, not a slice() error."""
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a"), (2, ""), (3, "a b c d")], "doc_id long, text string"
    )
    grams = dedup.doc_ngrams(docs, "doc_id", n=3).collect()
    by_doc = {}
    for r in grams:
        by_doc.setdefault(r["doc_id"], []).append(r["ngram"])
    assert 0 not in by_doc and 1 not in by_doc and 2 not in by_doc
    assert sorted(by_doc[3]) == ["a b c", "b c d"]
    # and the full pair op survives short docs
    dedup.ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.1).collect()


def test_frame_sample_short_and_empty_payloads(spark):
    media = spark.createDataFrame(
        [
            (1, b"x" * 10, ("bin", None, None, 10)),
            (2, b"", ("bin", None, None, 0)),
            (3, b"y" * 130, ("bin", None, None, 130)),
        ],
        mm.MEDIA_SCHEMA,
    )
    frames = mm.frame_sample(media, every_n_bytes=64).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(bytes(r["frame"]))
    assert by_media[1] == [b"x" * 10]  # one short frame, no phantom second
    assert 2 not in by_media  # empty payload -> zero frames
    assert [len(f) for f in by_media[3]] == [64, 64, 2]  # ceil(130/64) = 3


def test_merge_after_evolution_preserves_evolved_values(spark, tmp_path):
    """Non-evolving merge on a table with old-schema files must write the
    source's evolved-column values, not silently drop them."""
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"))
    # evolve: add column w via merge
    t.merge(
        spark.createDataFrame([(3, 30.0, "w3")], "k long, v double, w string"),
        ["k"],
        schema_evolution=True,
    )
    # non-evolving merge touching an OLD file (k=1) with full-schema source
    t.merge(
        spark.createDataFrame([(1, 11.0, "w1")], "k long, v double, w string"),
        ["k"],
    )
    rows = {r["k"]: (r["v"], r["w"]) for r in t.read().collect()}
    assert rows[1] == (11.0, "w1")  # evolved value kept, not dropped
    assert rows[2] == (20.0, None)
    assert rows[3] == (30.0, "w3")


def test_evolution_merge_no_touch_keeps_prior_schema(spark, tmp_path):
    """A schema-evolution merge that matches nothing must record
    prior-schema ∪ new columns, not just the source's columns."""
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10.0, 99)], "k long, v double, z int"))
    t.merge(
        spark.createDataFrame([(100, 1.0, "new")], "k long, v double, w string"),
        ["k"],
        schema_evolution=True,
    )
    names = [f.name for f in t._schema_at().fields]
    assert names == ["k", "v", "z", "w"]  # z survived, w appended
    # append with the full recorded schema is accepted
    t.write(
        spark.createDataFrame([(200, 2.0, 5, "x")], "k long, v double, z int, w string"),
        mode="append",
    )
    assert t.read().count() == 3  # initial 1 + merge-insert 1 + append 1


def test_asof_join_null_value_wins(spark):
    """A right row whose value is NULL is still the as-of match — it must
    not be skipped for an older non-null row (matches SQL ASOF JOIN)."""
    left = spark.createDataFrame([(100, 1, 25)], "lid long, k long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, None)], "k long, ts long, v double"
    )
    out = asof_join(left, right, on="k", ts="ts", value_cols=["v"]).collect()
    assert len(out) == 1
    assert out[0]["v_asof"] is None  # the ts=20 null row, not ts=10's 5.0


def test_diff_tracks_duplicate_multiplicity(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "t"))
    dup = spark.createDataFrame([(1, 1.0), (1, 1.0), (2, 2.0)], "k long, v double")
    t.write(dup)  # v0: two copies of (1, 1.0)
    t.write(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double"),
        mode="overwrite",
    )  # v1: one copy
    d = t.diff(0, 1).collect()
    assert [(r["k"], r["v"], r["_change_type"]) for r in d] == [(1, 1.0, "delete")]


def test_append_rejects_type_mismatch(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10.0)], "k long, v double"))
    bad = spark.createDataFrame([(2, "oops")], "k long, v string")
    with pytest.raises(ValueError, match="append schema mismatch"):
        t.write(bad, mode="append")


def test_simhash_auto_chunks_cover_requested_distance(spark):
    """num_chunks auto-sizes above max_hamming so pigeonhole recall holds."""
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    base = " ".join(words * 24)
    # flip several tokens to push hamming into the 8-15 range
    variant = base.replace("alpha", "omega", 6)
    docs = spark.createDataFrame([(0, base), (1, variant)], "doc_id long, text string")
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs, "doc_id").collect()}
    dist = bin((sh[0] ^ sh[1]) & (2**64 - 1)).count("1")
    found = dedup.simhash_neardup(docs, "doc_id", max_hamming=dist).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in found] == [(0, 1, dist)]


# --- NULL-input tolerance of the Arrow-batched kernels (review round 2) ----


def test_simhash_null_text_skipped_not_crashed(spark):
    from sdlt_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, None), (3, "hello world hello")],
        "doc_id long, text string",
    )
    out = dedup.simhash(df, "doc_id").collect()
    assert {r["doc_id"] for r in out} == {1, 3}  # null doc yields no row
    pairs = dedup.simhash_neardup(df, "doc_id", max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 3)}


def test_winnow_null_text_skipped(spark):
    from sdlt_spark.operators import text as t

    words = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, words), (2, None)], "doc_id long, text string"
    )
    out = t.winnow_fingerprints(df, "doc_id").collect()
    assert out and all(r["doc_id"] == 1 for r in out)


def test_lsh_and_ivf_null_vector_tolerated(spark):
    from sdlt_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0, 2.1])],
        "vec_id long, embedding array<double>",
    )
    top = sim.ann_lsh_topk(df, "embedding", "vec_id", [1.0, 2.0], k=5, num_planes=2).collect()
    assert {r["vec_id"] for r in top} <= {1, 3}
    cents = sim.train_ivf_centroids(
        df.filter("embedding is not null"), "embedding", n_cells=2, sample_rows=10, seed=1
    )
    cells = sim.ivf_assign(df, "embedding", cents).collect()
    by_id = {r["vec_id"]: r["__cell"] for r in cells}
    assert by_id[2] is None and by_id[1] is not None
    pairs = sim.neardup_cosine_lsh(df, "embedding", "vec_id", threshold=0.9, num_tables=2, num_planes=2)
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(1, 3)}


def test_bpe_pattern_vertical_tab_parity(spark):
    """Java \\s includes \\x0B, RE2's does not — the explicit class must
    make Spark and DuckDB count identically on vertical-tab text."""
    import duckdb

    from sdlt_spark.operators import text as t

    samples = ["a\x0b.", "\x0b\x0b.", "plain text", "tab\there"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "doc_id long, text string")
    spark_counts = {
        r["doc_id"]: r["n_bpe_tokens"] for r in t.bpe_token_count(df).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        duck = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [s, t.BPE_PATTERN]
        ).fetchone()[0]
        assert spark_counts[i] == duck, (s, spark_counts[i], duck)


def test_diff_detects_schema_evolution_only_updates(spark, tmp_path):
    """A merge that only sets a newly-evolved column on existing rows must
    show up in the file-pruned diff as delete+insert pairs."""
    from sdlt_spark.store import VintageTable

    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"))
    src = spark.createDataFrame([(1, 10.0, "note")], "k long, v double, c string")
    t.merge(src, ["k"], schema_evolution=True)
    d = t.diff(0, 1).collect()
    ins = {(r["k"], r["v"], r["c"]) for r in d if r["_change_type"] == "insert"}
    # v unchanged, only c gained a value: the diff must still surface it
    assert (1, 10.0, "note") in ins


def test_global_rank_nulls_first_matches_window(spark):
    """global_rank on a nullable first column must match Window.orderBy
    ascending (nulls first, every column) exactly."""
    from pyspark.sql import Window

    from sdlt_spark.operators.ranking import global_rank

    df = spark.range(500).select(
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id") % 50).alias("g"),
        F.col("id").alias("uid"),
    )
    ranked, total = global_rank(df, ["g", "uid"], n_buckets=8)
    assert total == 500
    expected = df.withColumn(
        "wrank", F.row_number().over(Window.orderBy(F.asc_nulls_first("g"), "uid"))
    )
    mism = (
        ranked.join(expected, "uid")
        .filter(F.col("grank") != F.col("wrank"))
        .count()
    )
    assert mism == 0


def test_global_rank_null_heavy_recursion_matches_window(spark):
    """When nulls dominate the first order column, global_rank recurses on
    the remaining columns instead of funneling every null row through one
    task — and still matches Window.orderBy exactly."""
    from pyspark.sql import Window

    from sdlt_spark.operators.ranking import global_rank

    df = spark.range(2000).select(
        F.when(F.col("id") % 10 < 6, None).otherwise(F.col("id") % 40).alias("g"),
        (F.col("id") % 7).alias("g2"),
        F.col("id").alias("uid"),
    )
    ranked, total = global_rank(df, ["g", "g2", "uid"], n_buckets=8)
    assert total == 2000
    expected = df.withColumn(
        "wrank",
        F.row_number().over(
            Window.orderBy(F.asc_nulls_first("g"), F.asc_nulls_first("g2"), "uid")
        ),
    )
    mism = ranked.join(expected, "uid").filter(F.col("grank") != F.col("wrank")).count()
    assert mism == 0


def test_update_dv_nondeterministic_condition_consistent(spark, tmp_path):
    """Round-6 advice: _update_dv must pin the matched row set before the
    two write jobs (DV sidecar, appended copies) — a non-deterministic
    condition re-evaluated per job would hide one row set and append a
    different one (silent loss/duplication)."""
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(
        spark.range(200).select(F.col("id").alias("k"), F.lit(0.0).alias("v"))
    )
    t.update("rand() < 0.5", {"v": "1.0"}, mode="dv")
    out = t.read()
    # the literal 1.0 parses as DECIMAL(2,1); the appended copies must be
    # cast back to the column's double type (as copy-on-write coerces)
    assert out.schema["v"].dataType.simpleString() == "double"
    rows = out.collect()
    assert len(rows) == 200  # every key exactly once, none lost or doubled
    assert sorted(r["k"] for r in rows) == list(range(200))


def test_batch_source_append_retries_commit_conflict(spark, tmp_path):
    """Round-6 advice: the DataSource write path must retry a blind append
    that loses the version race (appends commute), instead of aborting and
    deleting the staged files. (commit() is invoked directly: the real
    writer runs it in the data source worker process, out of monkeypatch
    reach.)"""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdlt_spark.store.batch_source import VintageWriter, _StagedFile
    from sdlt_spark.store.vintage import CommitConflictError

    path = str(tmp_path / "t")
    t = VintageTable(spark, path)
    t.write(spark.range(5).select(F.col("id").alias("k")))
    schema = t.read().schema

    w = VintageWriter(schema, {"path": path}, overwrite=False)
    abs_dir = os.path.join(path, w._commit_dir)
    os.makedirs(abs_dir)
    pq.write_table(
        pa.table({"k": pa.array(range(5, 10), pa.int64())}),
        os.path.join(abs_dir, "part-0.parquet"),
    )
    msgs = [_StagedFile(f"{w._commit_dir}/part-0.parquet")]

    # inject one conflict: first _commit attempt loses the race
    orig = VintageTable._commit
    state = {"raised": False}

    def flaky_commit(self, *args, **kwargs):
        if not state["raised"]:
            state["raised"] = True
            raise CommitConflictError("injected concurrent writer")
        return orig(self, *args, **kwargs)

    VintageTable._commit = flaky_commit
    try:
        w.commit(msgs)
    finally:
        VintageTable._commit = orig
    assert state["raised"]
    assert sorted(r["k"] for r in t.read().collect()) == list(range(10))

    # OVERWRITE must NOT retry: its remove-set came from a snapshot a
    # concurrent writer just changed — surface the conflict
    w2 = VintageWriter(schema, {"path": path}, overwrite=True)
    abs_dir2 = os.path.join(path, w2._commit_dir)
    os.makedirs(abs_dir2)
    pq.write_table(
        pa.table({"k": pa.array([99], pa.int64())}),
        os.path.join(abs_dir2, "part-0.parquet"),
    )
    state["raised"] = False
    VintageTable._commit = flaky_commit
    try:
        with pytest.raises(CommitConflictError):
            w2.commit([_StagedFile(f"{w2._commit_dir}/part-0.parquet")])
    finally:
        VintageTable._commit = orig


def test_batch_source_commit_prunes_speculative_orphans(spark, tmp_path):
    """Round-6 advice: staged parquet from failed/speculative task attempts
    (present in the commit dir but absent from the task commit messages)
    must be deleted at commit, not leaked as unreferenced data."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdlt_spark.store.batch_source import VintageSnapshotDataSource

    spark.dataSource.register(VintageSnapshotDataSource)
    path = str(tmp_path / "t")
    (
        spark.range(3)
        .select(F.col("id").alias("k"))
        .coalesce(1)
        .write.format("vintage")
        .option("path", path)
        .mode("overwrite")
        .save()
    )
    t = VintageTable(spark, path)
    commit_dirs = {os.path.dirname(f) for f in t._live_files()}
    assert len(commit_dirs) == 1
    cdir = commit_dirs.pop()
    # plant a speculative-attempt orphan, then run another committed write
    orphan_dirs_before = set()
    abs_dir = os.path.join(path, cdir)
    pq.write_table(pa.table({"k": pa.array([99], pa.int64())}),
                   os.path.join(abs_dir, "orphan-attempt.parquet"))
    # a NEW write gets its own commit dir; its commit must prune only its
    # own orphans — the planted one is swept by vacuum, not this commit
    (
        spark.range(3, 6)
        .select(F.col("id").alias("k"))
        .coalesce(1)
        .write.format("vintage")
        .option("path", path)
        .mode("append")
        .save()
    )
    live = t._live_files()
    # every staged parquet on disk under data/ commit dirs is either live
    # in the log or the planted foreign orphan
    on_disk = []
    for root, _, files in os.walk(os.path.join(path, "data")):
        for f in files:
            if f.endswith(".parquet"):
                on_disk.append(os.path.relpath(os.path.join(root, f), path))
    extras = set(on_disk) - set(live)
    assert extras == {f"{cdir}/orphan-attempt.parquet"}
    assert sorted(r["k"] for r in t.read().collect()) == list(range(6))


def test_stream_reader_restart_caps_backlog(spark, tmp_path):
    """Round-6 advice: a rate-limited reader restarting behind a backlog
    must cap from the TRUE (checkpointed) position, not its
    construction-time seed. Spark's restart sequence (verified against
    this build) replays the last offset-log batch — partitions(ckptStart,
    ckptEnd) — before the first latestOffset, so the down-sync there is
    what bounds the catch-up batches."""
    from pyspark.sql.types import StructType

    from sdlt_spark.streaming.vintage_source import VintageStreamReader

    path = str(tmp_path / "t")
    t = VintageTable(spark, path)
    for i in range(12):
        t.write(
            spark.range(i, i + 1).select(F.col("id").alias("k")),
            mode="append" if i else "overwrite",
        )
    # no startingVersion: the construction seed is the CURRENT head (11).
    # Simulate a restart whose checkpoint is far behind (position 3): Spark
    # replays the last planned batch first...
    r = VintageStreamReader(
        StructType([]), {"path": path, "maxcommitspertrigger": "2"}
    )
    list(r.partitions({"version": 3}, {"version": 3}))
    # ...and the next latestOffset must cap from 3, not from the seed 11
    # (the advice's bug: seed-relative capping returns the whole backlog)
    assert r.latestOffset() == {"version": 5}
    assert r.latestOffset() == {"version": 7}
    # fresh-query path still caps from initialOffset's floor
    r2 = VintageStreamReader(
        StructType([]),
        {"path": path, "startingversion": "0", "maxcommitspertrigger": "2"},
    )
    assert r2.initialOffset() == {"version": -1}
    assert r2.latestOffset() == {"version": 1}


def test_vintage_cdc_restart_behind_backlog_e2e(spark, tmp_path):
    """End-to-end restart: stop a checkpointed rate-limited stream, land a
    commit backlog, restart — the backlog must arrive complete, duplicate-
    free, and in multiple capped micro-batches."""
    from sdlt_spark.streaming.vintage_source import VintageChangeDataSource

    spark.dataSource.register(VintageChangeDataSource)
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = VintageTable(spark, path)
    t.write(spark.range(10).select(F.col("id").alias("k")))

    def run():
        q = (
            spark.readStream.format("vintage_cdc")
            .option("path", path)
            .option("startingVersion", 0)
            .option("maxCommitsPerTrigger", "1")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        progress = [p["numInputRows"] for p in q.recentProgress]
        q.stop()
        return progress

    run()
    for i in range(4):  # 4-commit backlog while the stream is down
        t.write(
            spark.range(10 + i * 10, 20 + i * 10).select(F.col("id").alias("k")),
            mode="append",
        )
    progress = run()
    rows = spark.read.parquet(out)
    assert rows.count() == 50  # complete, no duplicates
    assert sorted(r["k"] for r in rows.collect()) == list(range(50))
    # capped: the backlog arrived as >= 4 one-commit batches
    assert len([n for n in progress if n > 0]) >= 4, progress


def test_global_rank_nan_sorts_last_like_window(spark):
    """Review regression: Spark orders NaN LAST (largest) while pandas
    conflates NaN with NULL — the shadow key must keep them apart."""
    from pyspark.sql import Window

    from sdlt_spark.operators.ranking import global_rank

    rows = [
        (1, 1.0), (2, float("nan")), (3, 5.0), (4, None), (5, 2.0),
    ]
    df = spark.createDataFrame(rows, "uid long, v double")
    ranked, total = global_rank(df, ["v", "uid"], n_buckets=4)
    got = {r["uid"]: r["grank"] for r in ranked.collect()}
    w = Window.orderBy(F.col("v").asc(), F.col("uid").asc())
    want = {
        r["uid"]: r["grank"]
        for r in df.withColumn("grank", F.row_number().over(w)).collect()
    }
    assert got == want and total == 5
    # explicit: NULL first, NaN last
    assert got[4] == 1 and got[2] == 5


def test_global_rank_refuses_non_numeric_first_column(spark):
    from sdlt_spark.operators.ranking import global_rank

    df = spark.createDataFrame([(1, "a")], "uid long, s string")
    with pytest.raises(ValueError, match="NUMERIC"):
        global_rank(df, ["s", "uid"])


def test_salted_join_refuses_right_outer(spark):
    """Review regression: right/full outer joins would emit unmatched
    small-side rows once per salt replica."""
    from sdlt_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "x")], "k long, a string")
    small = spark.createDataFrame([(2, "y")], "k long, b string")
    with pytest.raises(ValueError, match="replica"):
        salted_join(big, small, on="k", salt_source="a", how="right")
    # left path still works and does not duplicate
    out = salted_join(big, small, on="k", salt_source="a", how="left")
    assert out.count() == 1


def test_pagerank_string_node_ids(spark):
    """Review regression: URL-string node ids must not NULL-collapse the
    graph through a silent cast."""
    from sdlt_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("http://a", "http://b"), ("http://b", "http://a"),
         ("http://c", "http://a")],
        "src string, dst string",
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=2).collect()}
    assert set(got) == {"http://a", "http://b", "http://c"}
    assert got["http://a"] > got["http://c"]  # a has more in-links


def test_asof_join_null_keys_never_match(spark):
    """Review regression: NULL join keys / timestamps must behave like an
    equi join (no match), not share a window partition."""
    from sdlt_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 10, 1), ("k", None, 2), ("k", 10, 3)],
        "on_c string, ts long, lid long",
    )
    right = spark.createDataFrame(
        [(None, 5, 7.0), ("k", None, 8.0), ("k", 4, 9.0)],
        "on_c string, ts long, value double",
    )
    out = {
        r["lid"]: r["value_asof"]
        for r in asof_join(left, right, "on_c", "ts", ["value"]).collect()
    }
    assert out == {1: None, 2: None, 3: 9.0}


def test_incremental_agg_folds_update_images(spark, tmp_path):
    """Review regression: update_postimage must weigh +1 and
    update_preimage -1 (Delta mutation CDC emits true image pairs) — a
    purely-updated key previously vanished from the fold."""
    from sdlt_spark.operators.incremental import fold_cdc_batch
    from sdlt_spark.store import VintageTable

    state = VintageTable(spark, str(tmp_path / "st"))
    seed = spark.createDataFrame(
        [("a", "insert", 10.0), ("b", "insert", 5.0)],
        "k string, _change_type string, v double",
    )
    fold_cdc_batch(state, seed, 0, ["k"], "v")
    upd = spark.createDataFrame(
        [("a", "update_preimage", 10.0), ("a", "update_postimage", 12.5)],
        "k string, _change_type string, v double",
    )
    fold_cdc_batch(state, upd, 1, ["k"], "v")
    got = {r["k"]: (r["n"], float(r["total"])) for r in state.read().collect()}
    assert got == {"a": (1, 12.5), "b": (1, 5.0)}
    # an unrelated txn writer cannot shadow or crash the fold's watermark
    state.write(
        spark.createDataFrame([("z", 9, 1.0)], "k string, n long, total double")
        .select("k", "n", F.col("total").cast("decimal(38,2)")),
        mode="append",
        txn_id="maintenance:999999",
    )
    more = spark.createDataFrame(
        [("c", "insert", 1.0)], "k string, _change_type string, v double"
    )
    fold_cdc_batch(state, more, 2, ["k"], "v")
    assert "c" in {r["k"] for r in state.read().collect()}


def test_resample_ffill_refuses_mismatched_freq(spark):
    """Review regression: a grid freq that does not step one bucket
    silently drops or orphans observations — refused loudly."""
    from sdlt_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0)], "k long, ts_s string, v double"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    with pytest.raises(ValueError, match="does not step"):
        resample_ffill(df, "k", "ts", "v", freq="2 days", bucket="day")
    with pytest.raises(ValueError, match="does not step"):
        resample_ffill(df, "k", "ts", "v", freq="12 hours", bucket="day")
    assert resample_ffill(df, "k", "ts", "v").count() == 1


def test_similarity_tolerates_zero_and_null_vectors(spark):
    """Review regression: a corrupt row (zero-norm or NULL embedding) in
    a 100 TB corpus must not kill the job under ANSI mode — every search
    entry point drops it instead."""
    from sdlt_spark.operators.clustering import kmeans_fit
    from sdlt_spark.operators.similarity import (
        cosine_topk,
        neardup_cosine_lsh,
        neardup_cosine_pairs,
        train_ivf_centroids,
    )

    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0]), (4, None),
        (5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"] for r in cosine_topk(df, "embedding", "vec_id", [1.0, 0.0], k=5).collect()}
    assert got == {1, 2, 5}  # zero/null rows dropped, job alive
    pairs = neardup_cosine_pairs(df, "embedding", "vec_id", threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    lsh = neardup_cosine_lsh(df, "embedding", "vec_id", threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in lsh} <= {(1, 2)}
    cents = train_ivf_centroids(df, "embedding", n_cells=2)
    assert cents.shape[1] == 2
    assigned, _ = kmeans_fit(df, "embedding", "vec_id", k=2, iters=2)
    assert {r["vec_id"] for r in assigned.collect()} == {1, 2, 3, 5}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="zero norm"):
        cosine_topk(df, "embedding", "vec_id", [0.0, 0.0])
    with _pytest.raises(ValueError, match="iteration"):
        kmeans_fit(df, "embedding", "vec_id", k=2, iters=0)


def test_text_quality_survives_empty_documents(spark):
    """Review regression: an empty document (a legal output of
    exact-substring dedup / boilerplate removal) must read a null
    punct_ratio, not ANSI-DIVIDE_BY_ZERO the job."""
    from sdlt_spark.operators.text import quality_score, token_stats

    df = spark.createDataFrame(
        [(1, ""), (2, "real words here")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in token_stats(df).collect()}
    assert rows[1]["punct_ratio"] is None
    assert rows[2]["punct_ratio"] is not None
    assert quality_score(df).count() == 2


def test_extract_urls_stops_at_newline(spark):
    """Review regression: the URL pattern must not swallow the rest of
    the line past a newline/tab (blocklist host joins would miss)."""
    from sdlt_spark.operators.text import extract_urls

    df = spark.createDataFrame(
        [(1, "see http://example.com\nHello world\tmore")],
        "doc_id long, text string",
    )
    got = [(r["url"], r["host"]) for r in extract_urls(df, "doc_id").collect()]
    # urls are normalized (scheme stripped); the point is nothing past
    # the newline leaked into the url or host
    assert got == [("example.com", "example.com")]


def test_exact_dedup_null_text_not_grouped(spark):
    """Review regression: NULL-text rows (failed extractions) must not
    collapse into one giant 'duplicate' group."""
    from sdlt_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_dups"] for r in exact_dedup(df, "doc_id").collect()}
    assert got == {3: 2}  # nulls never reported as duplicates


def test_remove_boilerplate_keeps_null_text_rows(spark):
    """Review regression: 'for every document' includes NULL-text rows —
    they come back with empty cleaned text instead of vanishing."""
    from sdlt_spark.operators.text import remove_boilerplate

    df = spark.createDataFrame(
        [(1, None), (2, "unique words in this one document only")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["cleaned"] for r in remove_boilerplate(df, "doc_id").collect()}
    assert set(got) == {1, 2} and got[1] == ""


def test_warc_truncated_header_dropped_in_both_modes(spark):
    """Review regression: a truncated tail (record magic, no header
    terminator) is not a record in EITHER mode; rec_no stays aligned."""
    from sdlt_spark.operators.text import warc_records

    blob = (
        "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/1"
        "\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
        "WARC/1.0\r\nContent-Length: 5"  # truncated tail
    )
    df = spark.createDataFrame([(0, blob)], "archive_id long, content string")
    for strict in (False, True):
        got = [
            (r["rec_no"], r["payload"])
            for r in warc_records(df, strict=strict).collect()
        ]
        assert got == [(0, "ok")], f"strict={strict}"


def test_sdmx_key_null_dimension_yields_null_key(spark):
    """Review regression: a NULL dimension must yield a NULL key (the
    reference's concat semantics) — concat_ws skipped the null and let
    differently-malformed rows collide on one key."""
    from sdlt_spark.store.sdmx import with_key

    rows = [
        ("M", "NOK", "EUR", "SP00", "A", "2020-01"),
        ("M", "NOK", "EUR", "SP00", None, "2020-01"),
    ]
    df = spark.createDataFrame(
        rows,
        "FREQ string, CURRENCY string, CURRENCY_DENOM string, "
        "EXR_TYPE string, EXR_SUFFIX string, TIME_PERIOD string",
    )
    got = [r["KEY"] for r in with_key(df).collect()]
    assert got[0] is not None and got[1] is None


def test_serialize_rbm_array_dedupes(spark):
    """Review regression: duplicate row indexes must not inflate the
    array container / descriptor cardinality."""
    from sdlt_spark.store.delta_dv import (
        deserialize_rbm_array,
        serialize_rbm_array,
    )

    blob = serialize_rbm_array([0, 0, 3, 3, 3])
    assert sorted(deserialize_rbm_array(blob)) == [0, 3]


def test_row_count_ignores_hidden_paths(spark, tmp_path):
    """Review regression: row_count must skip _temporary/ and dot-files,
    like Spark's reader — block-count sizing uses it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdlt_spark import tables

    d = tmp_path / "events.parquet"
    (d / "_temporary" / "0").mkdir(parents=True)
    pq.write_table(pa.table({"x": [1, 2]}), str(d / "part-0.parquet"))
    pq.write_table(
        pa.table({"x": [9, 9, 9]}), str(d / "_temporary" / "0" / "part-x.parquet")
    )
    assert tables.row_count(str(tmp_path), "events") == 2


# ------------------------------------------------- round-9 advice regressions


def test_merge_update_unknown_column_raises(spark, tmp_path):
    """ADVICE r9: an UPDATE SET assignment to a column outside the target
    schema must raise (Delta parity), not silently no-op."""
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10.0)], "k long, v double"))
    src = spark.createDataFrame([(1, 99.0)], "k long, v double")
    with pytest.raises(ValueError, match="not in the target schema"):
        t.merge(src, ["k"], matched_update={"vv": "src_v"})
    # schema_evolution legitimizes assignments to NEW source columns
    src2 = spark.createDataFrame([(1, 99.0, "x")], "k long, v double, w string")
    t.merge(src2, ["k"], matched_update={"w": "src_w"}, schema_evolution=True)
    assert t.read().filter("k = 1").head()["w"] == "x"


def test_merge_star_semantics_rejects_extra_source_columns(spark, tmp_path):
    """Review r9: the INSERT half of the same defect class — a default
    (updateAll+insertAll) merge whose source carries columns outside the
    target schema must raise without autoMerge, not silently drop them.
    Clause-mode sources may carry extra columns as expression inputs."""
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10.0)], "k long, v double"))
    src = spark.createDataFrame(
        [(2, 20.0, "lost")], "k long, v double, w string"
    )
    with pytest.raises(ValueError, match="not in the target"):
        t.merge(src, ["k"])
    # clause mode: the extra column is an expression input, not dropped data
    t.merge(
        spark.createDataFrame([(1, 2.0)], "k long, ratio double"),
        ["k"],
        matched_update={"v": "v * src_ratio"},
        insert_condition="false",
    )
    assert t.read().filter("k = 1").head()["v"] == 20.0


def test_sql_merge_update_unknown_column_raises(spark, tmp_path):
    """The SqlDispatcher MERGE surface routes into the same validation."""
    from sdlt_spark.sql_dml import SqlDispatcher

    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 10.0)], "k long, v double"))
    spark.createDataFrame([(1, 99.0)], "k long, v double").createOrReplaceTempView(
        "r9src"
    )
    d = SqlDispatcher(spark)
    d.register("t", t)
    with pytest.raises(ValueError, match="not in the target schema"):
        d.sql(
            "MERGE INTO t USING r9src AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET t.vv = s.v"
        )


def test_export_split_survives_max_records_per_file(spark, tmp_path):
    """ADVICE r9: a session-level maxRecordsPerFile must not silently drop
    rows from the partitioned-export split (every part beyond parts[0])."""
    import json

    from sdlt_spark.store.delta_read import (
        DeltaTableReader,
        import_delta_to_vintage,
    )
    from sdlt_spark.store.delta_write import (
        DeltaLogWriter,
        export_vintage_to_delta,
    )

    # a real partitioned Delta table: partition values live only in the log
    root = str(tmp_path / "dt")
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    adds = []
    for part in ("a", "b"):
        sub = f"p={part}"
        spark.createDataFrame(
            [(i, part) for i in range(100)], "k long, v string"
        ).coalesce(1).write.parquet(f"{root}/{sub}")
        import os as _os

        adds += [
            (f"{sub}/{f}", {"p": part})
            for f in sorted(_os.listdir(f"{root}/{sub}"))
            if f.endswith(".parquet")
        ]
    DeltaLogWriter(root).commit(
        adds=adds, schema_json=schema, partition_columns=["p"]
    )
    src = import_delta_to_vintage(spark, root, str(tmp_path / "vt"))
    # CoW update materializes the partition column into rewritten files
    src.update("k < 50", {"v": "'zz'"})
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "7")
    try:
        dest = str(tmp_path / "delta_out")
        export_vintage_to_delta(src, dest)
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    got = DeltaTableReader(spark, dest).read()
    assert got.count() == 200
    assert got.filter("v = 'zz'").count() == 100


def test_last_txn_id_rejects_colon_ambiguity(spark, tmp_path):
    """ADVICE r9: the '<app>:<version>' token encoding is guarded at both
    ends — app ids containing ':' are rejected at lookup, and a token
    with more than one ':' (which app 'a' would mis-read as version
    'b:5') can never be written in the first place."""
    t = VintageTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="more than one"):
        t.write(df, txn_id="a:b:5")
    t.write(df, txn_id="a:5")
    with pytest.raises(ValueError, match="':'"):
        t.last_txn_id(app="a:b")
    assert t.last_txn_id(app="a") == "5"


def test_sql_split_handles_escaped_quotes(spark):
    """ADVICE r9: backslash-escaped and doubled quotes inside string
    literals must not desynchronize the clause splitters."""
    from sdlt_spark import sql_dml

    clauses = sql_dml._split_when_clauses(
        "WHEN MATCHED AND t.name = 'it\\'s' THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert len(clauses) == 2 and clauses[0].endswith("DELETE")
    clauses = sql_dml._split_when_clauses(
        "WHEN MATCHED AND t.name = 'when matched then' THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert len(clauses) == 2
    parts = sql_dml._split_top("a = 'x''y, z', b = 2")
    assert parts == ["a = 'x''y, z'", "b = 2"]
    parts = sql_dml._split_top("a = 'x\\', b', c = 3")
    assert parts == ["a = 'x\\', b'", "c = 3"]


def test_dedup_ops_release_cache(spark):
    """ADVICE r9: repeated dedup calls in one session must not accumulate
    O(corpus) persist() entries (token/gram/signature tables). The eager
    result checkpoints are the one tolerated persistent-RDD class — they
    are O(pairs), tied to LIVE result frames, and reclaimed by the
    ContextCleaner once the caller drops them (asynchronous, so not
    asserted here); the corpus-sized intermediates must be gone
    SYNCHRONOUSLY."""
    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    for _ in range(2):
        dedup.ngram_jaccard_pairs(docs, "doc_id", n=2, threshold=0.1).collect()
        dedup.minhash_dedup(docs, "doc_id", threshold=0.5).collect()
        dedup.simhash_neardup(docs, "doc_id").collect()
        dedup.exact_then_minhash_pairs(docs, "doc_id", threshold=0.5).collect()
    jsc = spark.sparkContext._jsc.sc()
    jmap = spark._jvm.scala.collection.JavaConverters.mapAsJavaMap(
        jsc.getPersistentRDDs()
    )
    leaked = [
        str(rdd) for rdd in jmap.values() if not rdd.isLocallyCheckpointed()
    ]
    assert not leaked, f"persist() leaked: {leaked}"


# --------------------------------------------- round-9 module-sweep findings


def test_zorder_timestamp_and_date_columns(spark, tmp_path):
    """Review r9: OPTIMIZE ZORDER BY over temporal columns crashed on
    float(datetime) — bounds now aggregate on the epoch expression."""
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(k, float(k)) for k in range(40)], "k long, v double"
        ).selectExpr(
            "k",
            "v",
            "timestamp_seconds(1700000000 + k * 3600) AS ts",
            "date_add(DATE '2024-01-01', CAST(k AS INT)) AS d",
        ).repartition(4)
    )
    t.compact(zorder_by=["ts", "d"])
    got = t.read()
    assert got.count() == 40
    assert got.filter("k = 7").head()["v"] == 7.0


def test_zorder_many_columns_shrinks_bits(spark):
    """Review r9: >6 columns at bits=10 would shift past 63 (Spark masks
    mod 64, silently aliasing buckets) — bits now shrink to fit."""
    from sdlt_spark.store.zcurve import zorder_key

    df = spark.createDataFrame(
        [tuple(float(i * 7 + j) for j in range(7)) for i in range(20)],
        ", ".join(f"c{j} double" for j in range(7)),
    )
    keys = [r["z"] for r in df.select(zorder_key(df, [f"c{j}" for j in range(7)]).alias("z")).collect()]
    assert len(set(keys)) > 1  # still discriminates
    assert all(k >= 0 for k in keys)


def test_batch_source_dv_partitions_absolute_and_scoped(spark, tmp_path, monkeypatch):
    """Review r9: (a) partition file paths must be ABSOLUTE so the DV-ref
    comparison in apply_dv_mask matches even when .option('path') is
    relative (a relative abs_path silently skipped the mask, resurrecting
    deleted rows); (b) each partition ships only the sidecars that COVER
    its file, not the full DV list (was O(files x DVs) executor reads)."""
    import os

    from sdlt_spark.store.batch_source import VintageSnapshotReader

    t = VintageTable(spark, str(tmp_path / "vt"))
    t.write(
        spark.createDataFrame([(k, float(k)) for k in range(10)], "k long, v double")
        .repartition(2, "k")
    )
    t.delete("k = 3", mode="dv")
    monkeypatch.chdir(tmp_path)
    reader = VintageSnapshotReader(t.read().schema, {"path": "vt"})
    parts = reader.partitions()
    assert all(os.path.isabs(p.abs_path) for p in parts)
    assert all(os.path.isabs(d) for p in parts for d in p.dv_paths)
    covered = [p for p in parts if p.dv_paths]
    assert len(covered) == 1  # only the file holding k=3 ships its sidecar
    # end-to-end through the data source (absolute path): row masked
    from sdlt_spark.store.batch_source import VintageSnapshotDataSource

    spark.dataSource.register(VintageSnapshotDataSource)
    got = sorted(
        r["k"]
        for r in spark.read.format("vintage")
        .option("path", str(tmp_path / "vt"))
        .load()
        .collect()
    )
    assert got == [k for k in range(10) if k != 3]


def test_batch_source_timestamp_travel_schema(spark, tmp_path):
    """Review r9: timestampAsOf must resolve the schema in effect AT the
    timestamp, not pad old files to the latest schema."""
    import time as _time

    from sdlt_spark.store.batch_source import VintageSnapshotDataSource

    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, 1.0)], "k long, v double"))
    _time.sleep(0.05)
    ts = _time.time()
    _time.sleep(0.05)
    t.merge(
        spark.createDataFrame([(2, 2.0, "w2")], "k long, v double, w string"),
        ["k"],
        schema_evolution=True,
    )
    spark.dataSource.register(VintageSnapshotDataSource)
    old = (
        spark.read.format("vintage")
        .option("path", t.path)
        .option("timestampAsOf", str(ts))
        .load()
    )
    assert "w" not in old.columns
    assert old.count() == 1


def test_resample_unknown_bucket_refuses(spark):
    """Review r9: month/quarter/year buckets silently skipped the
    freq-mismatch guard; unknown buckets now refuse outright."""
    from sdlt_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [(1, "2024-01-15 00:00:00", 1.0), (1, "2024-03-02 00:00:00", 3.0)],
        "k long, ts string, v double",
    ).selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts", "v")
    with pytest.raises(ValueError, match="does not step one"):
        resample_ffill(df, "k", "ts", "v", bucket="month")  # default 1 day
    out = {
        str(r["bucket_start"]): r["value"]
        for r in resample_ffill(
            df, "k", "ts", "v", bucket="month", freq="1 month"
        ).collect()
    }
    assert len(out) == 3  # Jan, Feb (ffilled), Mar
    assert out["2024-02-01 00:00:00"] == 1.0
    with pytest.raises(ValueError, match="not a supported"):
        resample_ffill(df, "k", "ts", "v", bucket="fortnight")


def test_resolve_file_uri_authority():
    """Review r9: file://host/abs must strip the authority, not fold the
    host into the filesystem path."""
    from sdlt_spark.store.paths import resolve_table_path

    assert resolve_table_path("/r", "file:///tmp/x.parquet") == "/tmp/x.parquet"
    assert resolve_table_path("/r", "file://localhost/tmp/x") == "/tmp/x"
    assert resolve_table_path("/r", "file:/tmp/x") == "/tmp/x"
    assert resolve_table_path("/r", "rel/x") == "/r/rel/x"


def test_fold_cdc_null_keys_fold_as_one_group(spark, tmp_path):
    """Review r9: NULL grouping keys must fold like groupBy treats them —
    one group — not accumulate duplicate state rows / drop deletes."""
    from sdlt_spark.operators.incremental import fold_cdc_batch

    state = VintageTable(spark, str(tmp_path / "state"))
    b1 = spark.createDataFrame(
        [(None, 5.0, "insert"), (None, 7.0, "insert"), ("a", 1.0, "insert")],
        "g string, v double, _change_type string",
    )
    fold_cdc_batch(state, b1, 0, ["g"], "v")
    b2 = spark.createDataFrame(
        [(None, 5.0, "delete"), (None, 7.0, "delete")],
        "g string, v double, _change_type string",
    )
    fold_cdc_batch(state, b2, 1, ["g"], "v")
    rows = {r["g"]: (r["n"], float(r["total"])) for r in state.read().collect()}
    assert rows == {"a": (1, 1.0)}  # the NULL group deleted to zero and left


def test_inline_dv_odd_length_truncates_padding(tmp_path):
    """Review r9: delta-spark zero-pads inline DV blobs to a 4-byte
    multiple; readers must slice to sizeInBytes, not reject."""
    from sdlt_spark.store.delta_dv import (
        dv_positions,
        inline_dv_descriptor,
        serialize_rbm_array,
    )

    # 16-bit array container with odd cardinality -> odd-length blob
    for positions in ([1, 5, 9], [0], list(range(7))):
        blob = serialize_rbm_array(positions)
        desc = inline_dv_descriptor(positions)
        assert desc["sizeInBytes"] == len(blob)
        assert dv_positions(desc, str(tmp_path)) == sorted(positions)


def test_dv_file_truncation_fails_descriptively(tmp_path):
    """Review r9: a torn sidecar raises the intended 'truncated' message,
    not struct.error on a short CRC read."""
    import pytest as _pt

    from sdlt_spark.store.delta_dv import read_dv_blob, write_dv_file

    import uuid as _uuid

    desc = write_dv_file(str(tmp_path), [1, 2, 3], str(_uuid.uuid4()))
    path = next(p for p in tmp_path.iterdir() if p.name.startswith("deletion_vector"))
    raw = path.read_bytes()
    path.write_bytes(raw[: len(raw) - 6])  # tear mid-CRC
    with _pt.raises(ValueError, match="truncated deletion vector"):
        read_dv_blob(desc, str(tmp_path))


def test_asof_join_rejects_colliding_output_names(spark):
    """Review r9: an output name already on the left side must fail fast,
    not return a frame with duplicate columns."""
    left = spark.createDataFrame([(1, 10, 0.0)], "k long, ts long, v_asof double")
    right = spark.createDataFrame([(1, 5, 1.0)], "k long, ts long, v double")
    with pytest.raises(ValueError, match="already exist"):
        asof_join(left, right, on="k", ts="ts", value_cols=["v"])
