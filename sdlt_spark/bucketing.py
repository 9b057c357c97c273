"""Bucketed-table support for co-located (exchange-free) joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides on
the join key. Writing both tables bucketed by that key (hash-partitioned
into a fixed bucket count at write time) lets Spark's sort-merge join read
matching buckets side by side with NO Exchange on either side — the shuffle
is paid once at write time and amortized over every subsequent join.

Bucketing requires the session catalog (``saveAsTable``); tables land in
``spark.sql.warehouse.dir`` (gitignored ``spark-warehouse/`` locally; an
object-store path + Hive metastore / catalog in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist df hash-bucketed (and per-bucket sorted) on ``bucket_col``.
    Sorting within buckets additionally removes the join's Sort step."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two tables previously written with the SAME bucket count on the
    join key: Catalyst recognizes the co-partitioning and plans a
    sort-merge join without exchanges."""
    return read_table(spark, left_table).join(read_table(spark, right_table), on, how)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style directory partitioning (``path/col=value/...``). The
    complement of bucketing: bucketing co-locates JOIN keys, directory
    partitioning prunes SCANS — a filter on a partition column eliminates
    whole directories before any file is opened (PartitionFilters in the
    plan, vs pushed filters which still open footers). Partition by
    low-cardinality columns only (date, region); high-cardinality
    partitioning creates the small-file problem the reference warns about
    (README.md:392-396)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back with partition discovery; partition columns come from the
    directory names."""
    return spark.read.parquet(path)
