"""Incremental aggregate maintenance: the CDC fold must equal a full
recompute after every kind of commit, and must keep working across
compaction (silent) and version ranges."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdlt_spark.operators.incremental import incremental_agg
from sdlt_spark.store import VintageTable


def _recompute(table, keys, value_col):
    return (
        table.read()
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double"), 2
            ).alias("total"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_agg_tracks_all_mutations(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "t"), change_feed=True)
    base = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )
    t.write(base)  # v0
    t.merge(  # v1: update 10 keys into group 'X', insert 5 new
        spark.range(95, 110).select(
            F.col("id").alias("k"), F.lit("X").alias("g"), F.lit(7.0).alias("v")
        ),
        ["k"],
    )
    t.delete("g = '1'")  # v2: a whole group drops out
    t.compact(num_files=2)  # v3: dataChange=false, must be silent
    t.update("k = 0", {"v": F.lit(99.0)})  # v4: delete+insert pair

    got = incremental_agg(t, ["g"], "v")
    assert _rows(got) == _rows(_recompute(t, ["g"], "v"))
    # group '1' was fully deleted: it must vanish, not linger at n=0
    assert not any(r[0] == "1" for r in got.collect())


def test_incremental_agg_from_later_seed(spark, tmp_path):
    """Seeding from a mid-history snapshot folds only the later commits."""
    t = VintageTable(spark, str(tmp_path / "t"), change_feed=True)
    t.write(
        spark.range(50).select(
            F.col("id").alias("k"), F.lit("a").alias("g"), F.lit(2.0).alias("v")
        )
    )
    t.delete("k < 10")  # v1
    t.merge(
        spark.range(60, 70).select(
            F.col("id").alias("k"), F.lit("b").alias("g"), F.lit(3.0).alias("v")
        ),
        ["k"],
    )  # v2
    got = incremental_agg(t, ["g"], "v", from_version=1)
    assert _rows(got) == _rows(_recompute(t, ["g"], "v"))


def test_incremental_agg_no_changes_is_snapshot_agg(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "t"), change_feed=True)
    t.write(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("a").alias("g"), F.lit(1.0).alias("v")
        )
    )
    got = incremental_agg(t, ["g"], "v")
    assert _rows(got) == [("a", 10, 10.0)]


def test_maintain_agg_stream_continuous(spark, tmp_path):
    """Streaming MV maintenance: the state table must equal a full
    recompute after the initial snapshot, after in-flight commits, and
    after a stream restart from the checkpoint."""
    from sdlt_spark.operators.incremental import maintain_agg_stream
    from sdlt_spark.streaming.vintage_source import VintageChangeDataSource

    spark.dataSource.register(VintageChangeDataSource)
    src_path = str(tmp_path / "src")
    state_path = str(tmp_path / "state")
    src = VintageTable(spark, src_path, change_feed=True)
    src.write(
        spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 0.5).alias("v"),
        )
    )

    def state_rows():
        return sorted(
            (r["g"], r["n"], float(r["total"]))
            for r in VintageTable(spark, state_path).read().collect()
        )

    def expect():
        return sorted(
            (r["g"], r["n"], float(r["t"]))
            for r in src.read()
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(18,2)")).cast("decimal(28,2)").alias("t"),
            )
            .collect()
        )

    q = maintain_agg_stream(spark, src_path, state_path, ["g"], "v")
    try:
        q.processAllAvailable()
        assert state_rows() == expect()

        src.merge(  # commits landing while the stream runs are folded
            spark.range(95, 120).select(
                F.col("id").alias("k"), F.lit("x").alias("g"), F.lit(2.0).alias("v")
            ),
            ["k"],
        )
        src.delete("g = '1'")
        q.processAllAvailable()
        assert state_rows() == expect()
    finally:
        q.stop()

    # restart from the checkpoint: only the new commit is folded, once
    src.update("k = 2", {"v": F.lit(9.0)})
    q2 = maintain_agg_stream(spark, src_path, state_path, ["g"], "v")
    try:
        q2.processAllAvailable()
        assert state_rows() == expect()
    finally:
        q2.stop()


def test_fold_cdc_batch_replay_is_exactly_once(spark, tmp_path):
    """Replaying a folded batch (the foreachBatch crash window: state
    committed, checkpoint not) must be a no-op; the next batch id still
    applies."""
    from sdlt_spark.operators.incremental import fold_cdc_batch

    state = VintageTable(spark, str(tmp_path / "state"))
    b0 = spark.createDataFrame(
        [("a", 1.0, "insert"), ("a", 2.0, "insert"), ("b", 5.0, "insert")],
        "g string, v double, _change_type string",
    )
    fold_cdc_batch(state, b0, 0, ["g"], "v")
    fold_cdc_batch(state, b0, 0, ["g"], "v")  # replay: must not double-fold
    rows = sorted((r["g"], r["n"], float(r["total"])) for r in state.read().collect())
    assert rows == [("a", 2, 3.0), ("b", 1, 5.0)]

    b1 = spark.createDataFrame(
        [("a", 1.0, "delete"), ("c", 7.0, "insert")],
        "g string, v double, _change_type string",
    )
    fold_cdc_batch(state, b1, 1, ["g"], "v")
    fold_cdc_batch(state, b1, 1, ["g"], "v")  # replay again
    rows = sorted((r["g"], r["n"], float(r["total"])) for r in state.read().collect())
    assert rows == [("a", 1, 2.0), ("b", 1, 5.0), ("c", 1, 7.0)]
