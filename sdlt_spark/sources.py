"""Source/sink format helpers beyond parquet (SURVEY.md §2.1 extension).

The engine is format-agnostic where Spark is: CSV (the reference's ingest
format, README.md:67), JSON lines, and ORC all flow through the same
DataFrame plans. These helpers pin the conventions (explicit schemas — no
runtime inference in production paths; compression; single-pass writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV with header + explicit schema (README.md:67 shape). Never
    inferSchema in production: it triggers an extra full scan."""
    return spark.read.csv(path, header=True, schema=schema)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
