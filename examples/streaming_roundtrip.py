"""Streaming round-trip on the vintage store: events stream INTO a
versioned table, and a CDC stream tails the commits back OUT.

    python examples/streaming_roundtrip.py [table_dir]

This is the full Delta-style streaming loop the reference's batch
choreography (/root/reference/README.md:92-319) stops short of:

    readStream (files) --foreachBatch merge--> VintageTable(change_feed=True)
    VintageTable --vintage_cdc source--> readStream (change rows)

The inbound half dedups on event_id with a deterministic order_col
tiebreak; the outbound half emits one insert row per new event and
delete+insert pairs when a merge revises one — exactly what a downstream
incremental consumer (feature store, aggregate maintainer) needs.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sdlt_spark import VintageTable, get_spark
from sdlt_spark.streaming import ingest
from sdlt_spark.streaming.vintage_source import VintageChangeDataSource

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("streaming_roundtrip")
    spark.dataSource.register(VintageChangeDataSource)
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    table_dir = os.path.join(root, "events_table")

    # stage the fixture as a file-stream source directory
    src_dir = os.path.join(root, "incoming")
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(f"{SF}/events.parquet", link)

    # ---- inbound: stream files into a change-feed vintage table ----------
    table = ingest.stream_into_vintage(
        spark, src_dir, table_dir, key_cols=["event_id"], order_col="ts",
        change_feed=True,
    )
    n = table.read().count()
    print(f"inbound: {n} events landed, versions: "
          f"{[ (c.version, c.operation) for c in table._commits() ]}")

    # a revision arrives: double the value of 10 events (a merge commit)
    revised = (
        table.read()
        .filter(F.col("event_id") % 100 == 0)
        .withColumn("value", F.round(F.col("value") * 2, 2))
    )
    table.merge(revised, ["event_id"])

    # ---- outbound: tail the commit log as a CDC stream -------------------
    q = (
        spark.readStream.format("vintage_cdc")
        .option("path", table_dir)
        .option("startingVersion", 0)
        .load()
        .writeStream.format("memory")
        .queryName("events_cdc")
        .start()
    )
    try:
        q.processAllAvailable()
        summary = (
            spark.sql("select * from events_cdc")
            .groupBy("_commit_version", "_change_type")
            .agg(F.count(F.lit(1)).alias("rows"))
            .orderBy("_commit_version", "_change_type")
        )
        print("outbound change feed by commit:")
        summary.show(20, truncate=False)
    finally:
        q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
