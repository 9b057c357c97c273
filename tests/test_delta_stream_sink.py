"""Streaming Delta sink: foreachBatch append with exactly-once replay
via Delta's setTransaction contract (the write-side twin of the
delta_cdc streaming source). Reference parity: the choreography streams
into format("delta") tables (/root/reference/README.md:92)."""

from __future__ import annotations

import os

from sdlt_spark.store.delta_read import DeltaTableReader
from sdlt_spark.streaming.delta_sink import DeltaStreamSink


def test_write_batch_exactly_once_replay(spark, tmp_path):
    """Spark's foreachBatch contract is at-least-once: after a crash
    between the sink's Delta commit and the offset log's, the SAME
    batch_id replays. A replayed batch must be skipped (txnAppId/
    txnVersion), and a downstream independent reader sees each row
    exactly once."""
    dest = str(tmp_path / "sink")
    sink = DeltaStreamSink(dest, app_id="app-1")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b1 = spark.createDataFrame([(3, "c")], "k long, v string")

    assert sink.write_batch(b0, 0) == 0
    # crash-replay of batch 0: already durable -> skipped, no new version
    assert sink.write_batch(b0, 0) is None
    assert sink.write_batch(b1, 1) == 1
    # out-of-order stale replay is also skipped
    assert sink.write_batch(b0, 0) is None

    r = DeltaTableReader(spark, dest)
    assert sorted((x["k"], x["v"]) for x in r.read().collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    assert r.last_txn_version("app-1") == 1
    # a different writer app has its own idempotence lane
    assert r.last_txn_version("other") is None


def test_write_batch_schema_evolution_and_txn_survives_checkpoint(
    spark, tmp_path
):
    """An evolved micro-batch schema lands as a new metaData action (old
    rows pad null); the txn watermark survives JSON log cleanup because
    checkpoints carry setTransaction state."""
    from sdlt_spark.store.delta_write import DeltaLogWriter

    dest = str(tmp_path / "sink")
    sink = DeltaStreamSink(dest, app_id="app-e")
    sink.write_batch(
        spark.createDataFrame([(1, "a")], "k long, v string"), 0
    )
    sink.write_batch(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, w double"), 1
    )
    r = DeltaTableReader(spark, dest)
    got = sorted(
        (x["k"], x["v"], x["w"]) for x in r.read().collect()
    )
    assert got == [(1, "a", None), (2, "b", 9.5)]
    # checkpoint, clean the JSON log, replay batch 1 -> still skipped
    w = DeltaLogWriter(dest)
    w.write_checkpoint(1)
    log = os.path.join(dest, "_delta_log")
    for f in os.listdir(log):
        if f.endswith(".json") and f[:-5].isdigit():
            os.remove(os.path.join(log, f))
    assert (
        sink.write_batch(
            spark.createDataFrame([(2, "b", 9.5)], "k long, v string, w double"), 1
        )
        is None
    )
    assert sink.write_batch(
        spark.createDataFrame([(3, "c", 1.0)], "k long, v string, w double"), 2
    ) == 2
    assert r.read().count() == 3


def test_stream_restart_no_duplicates(spark, tmp_path):
    """E2E: a file-source stream drains via availableNow into the sink;
    a restart with the same checkpoint and MORE input appends only the
    new rows — the downstream reader sees every input row exactly once."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    dest = str(tmp_path / "sink")
    os.makedirs(src)

    def _feed(lo: int, hi: int, name: str) -> None:
        spark.range(lo, hi).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("v")
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{name}")
        )
        for f in os.listdir(str(tmp_path / f"stage_{name}")):
            if f.endswith(".parquet"):
                os.replace(
                    str(tmp_path / f"stage_{name}" / f),
                    os.path.join(src, f"{name}.parquet"),
                )

    def _run() -> None:
        stream = (
            spark.readStream.schema("k long, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(DeltaStreamSink(dest, "app-s"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not drain"

    _feed(0, 10, "f0")
    _feed(10, 20, "f1")
    _run()
    r = DeltaTableReader(spark, dest)
    assert sorted(x["k"] for x in r.read().collect()) == list(range(20))
    _feed(20, 30, "f2")
    _run()  # restart from the same checkpoint
    assert sorted(x["k"] for x in r.read().collect()) == list(range(30))


def test_write_batch_refuses_partitioned_and_mapped_targets(spark, tmp_path):
    """Review regression: appending flat files with empty partitionValues
    to a partitioned (or column-mapped) table makes stock readers return
    NULL for those columns — the sink must refuse, not corrupt."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from sdlt_spark.store.delta_write import DeltaLogWriter

    root = str(tmp_path / "part")
    os.makedirs(f"{root}/r=0", exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array([1], pa.int64())}), f"{root}/r=0/a.parquet"
    )
    DeltaLogWriter(root).commit(
        adds=[("r=0/a.parquet", {"r": "0"})],
        schema_json=json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                    {"name": "r", "type": "integer", "nullable": True, "metadata": {}},
                ],
            }
        ),
        partition_columns=["r"],
    )
    sink = DeltaStreamSink(root, app_id="app-p")
    with pytest.raises(ValueError, match="PARTITIONED"):
        sink.write_batch(
            spark.createDataFrame([(5, 1)], "k long, r int"), 0
        )


def test_write_batch_refuses_non_additive_schema(spark, tmp_path):
    """Review regression: a NARROWER micro-batch must not replace the
    table schema wholesale (silently dropping columns for every reader);
    only additive evolution commits a new metaData."""
    import pytest

    dest = str(tmp_path / "sink")
    sink = DeltaStreamSink(dest, app_id="app-n")
    sink.write_batch(spark.createDataFrame([(1, "a")], "k long, v string"), 0)
    with pytest.raises(ValueError, match="additive"):
        sink.write_batch(spark.createDataFrame([(2,)], "k long"), 1)
    with pytest.raises(ValueError, match="additive"):
        sink.write_batch(
            spark.createDataFrame([(3, 4)], "k long, v long"), 1  # retyped
        )
    # the failed batches committed nothing
    assert DeltaTableReader(spark, dest).read().count() == 1


def test_write_batch_evolution_carries_configuration(spark, tmp_path):
    """Review regression: the evolved metaData must carry the table's
    existing configuration forward, not reset it to {}."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdlt_spark.store.delta_write import DeltaLogWriter

    root = str(tmp_path / "cfg")
    os.makedirs(root, exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array([1], pa.int64())}), f"{root}/a.parquet"
    )
    DeltaLogWriter(root).commit(
        adds=[("a.parquet", {})],
        schema_json=json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "k", "type": "long", "nullable": True, "metadata": {}}
                ],
            }
        ),
        configuration={"delta.deletedFileRetentionDuration": "interval 2 days"},
    )
    sink = DeltaStreamSink(root, app_id="app-c")
    sink.write_batch(
        spark.createDataFrame([(2, "x")], "k long, v string"), 0
    )
    snap = DeltaTableReader(spark, root).snapshot()
    assert [f.name for f in snap.schema.fields] == ["k", "v"]
    assert (
        snap.metadata["configuration"]["delta.deletedFileRetentionDuration"]
        == "interval 2 days"
    )
