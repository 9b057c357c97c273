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


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """The multimodal ingestion source: one row per file with (path,
    modificationTime, length, content BINARY). Spark's binaryFile source
    lists and reads files in parallel across executors — at 100 TB the
    listing comes from the object store and each task streams its own
    files; nothing round-trips the driver. Pair with
    maxPartitionBytes-sized batching and the decode UDFs in
    operators/multimodal.py."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def stage_binary_corpus(df: DataFrame, id_col: str, payload_col: str, out_dir: str) -> None:
    """Test scaffolding: materialize (id, payload-string) rows as one
    UTF-8 file per row named <id>.bin so binaryFile can scan them. Runs on
    the executors via foreachPartition (works on any shared filesystem);
    production data already sits in the object store and never needs this."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _write(rows):
        for row in rows:
            with open(os.path.join(out_dir, f"doc_{row[id_col]}.bin"), "wb") as f:
                f.write(str(row[payload_col]).encode("utf-8"))

    df.select(id_col, payload_col).foreachPartition(_write)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """Stage as XML (Spark 4 ships the former spark-xml natively)."""
    df.write.format("xml").option("rowTag", row_tag).mode("overwrite").save(path)


def read_xml(spark: SparkSession, path: str, schema: T.StructType, row_tag: str = "row") -> DataFrame:
    """XML source with an explicit schema (no inference scan)."""
    return (
        spark.read.format("xml").option("rowTag", row_tag).schema(schema).load(path)
    )


def write_text_lines(df: DataFrame, path: str) -> None:
    """Stage a single string column as line-oriented text (one row per
    line) — the rawest interchange format. The caller is responsible for
    the column containing no newlines."""
    df.write.mode("overwrite").text(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source: one row per line in column ``value``."""
    return spark.read.text(path)
