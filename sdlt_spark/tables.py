"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

Tables (TPC-H-ish star schema + events + LLM-pipeline tables):
    region nation customer supplier part orders lineitem events
    documents embeddings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Timestamp rendering (date_format etc.) follows the session timezone;
    # DuckDB oracles are timezone-naive (UTC). The driver runs queries on its
    # own SparkSession, so pin UTC here rather than relying on our builder.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
        # reader rejects — PARQUET_TYPE_ILLEGAL — unless read as long) in some
        # fixture generations and plain TIMESTAMP(MICROS) (read as
        # TIMESTAMP_NTZ) in others. Adapt to whatever the footer says so the
        # loader survives fixture regeneration; normalize to a session-tz
        # TIMESTAMP (session tz pinned UTC above), matching DuckDB's naive-UTC
        # reading so oracles agree either way.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos read as long: truncate to µs (same truncation DuckDB does)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            # TIMESTAMP_NTZ (or date): naive values are UTC by fixture
            # contract; cast under the UTC session tz is value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def row_count(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footers (pyarrow, driver-side, no Spark
    job) — the cheap stats read operators use to size block/partition counts
    without an extra count() action. On a cluster the same number comes from
    the table catalog or file-listing metadata."""
    import os

    import pyarrow.parquet as pq

    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        # spark.read.parquet (load()) accepts part-file directories —
        # including nested/partitioned layouts, which it reads recursively;
        # keep the two contracts aligned by walking the tree and summing
        # footers, still no Spark job
        total = 0
        for dirpath, dirs, fnames in os.walk(path):
            # Spark's reader ignores hidden paths (_temporary/, .crc, _*);
            # counting them would disagree with load()'s row count
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in fnames:
                # extension-agnostic like spark.read.parquet: the reader
                # takes every non-hidden file in the directory (an
                # extensionless part file written by an external tool
                # still counts toward load()'s rows)
                if not f.startswith(("_", ".")) and not f.endswith(".crc"):
                    total += pq.read_metadata(os.path.join(dirpath, f)).num_rows
        return total
    return pq.read_metadata(path).num_rows


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql paths)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
