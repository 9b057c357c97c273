"""Streaming ingest smoke: real readStream -> memory sink, and
stream/batch-equivalence of the shared transformations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdlt_spark import tables
from sdlt_spark.streaming import ingest

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file-stream source requires a directory; stage the fixture into one
    (tmp_path / "events.parquet").symlink_to(f"{SF}/events.parquet")
    streamed = ingest.run_stream_once(
        spark,
        str(tmp_path),
        lambda ev: ingest.tumbling_counts(ev, window="1 hour"),
        query_name="t_tumbling",
    ).collect()
    batch = ingest.tumbling_counts(tables.load(spark, SF, "events"), window="1 hour").collect()
    key = lambda r: (r["window_start"], r["event_type"])
    assert sorted(map(key, streamed)) == sorted(map(key, batch))
    s = {key(r): (r["n"], r["total_value"]) for r in streamed}
    b = {key(r): (r["n"], r["total_value"]) for r in batch}
    assert s == b


def test_sessionize_static(spark):
    out = ingest.sessionize(tables.load(spark, SF, "events"), gap="30 minutes")
    rows = out.collect()
    assert rows
    r = rows[0]
    assert r["session_start"] <= r["session_end"]
    assert r["n_events"] >= 1


def test_stream_is_streaming(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(ingest.event_schema())
        .format("parquet")
        .option("path", f"{SF}/events.parquet")
        .load()
    )
    assert raw.isStreaming
    agg = ingest.tumbling_counts(ingest.normalize_events(raw))
    assert agg.isStreaming


def test_stream_into_vintage(spark, tmp_path):
    """readStream -> foreachBatch merge -> VintageTable: row-parity with the
    batch load, and a queryable commit history."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = tmp_path / "in"
    src.mkdir()
    (src / "events.parquet").symlink_to(f"{SF}/events.parquet")
    table = ingest.stream_into_vintage(
        spark, str(src), str(tmp_path / "tbl"), key_cols=["event_id"]
    )
    batch = tables.load(spark, SF, "events")
    assert table.read().count() == batch.count()
    ops = [r["operation"] for r in table.history().collect()]
    assert ops[-1] == "WRITE"  # first batch bootstraps the table
