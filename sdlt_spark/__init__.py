"""sdlt_spark — a PySpark-native analytics engine with the capabilities of
the ``sosna/sdlt`` reference (SDMX statistical data in a versioned lakehouse
table) plus LLM-data-pipeline operators, designed for 100 TB scale.

Layout:
    session      SparkSession builder tuned for local[32] tests / cluster prod
    tables       parquet fixture loaders for the driver testdata star schema
    store        Spark-native versioned table (vintages, merge, time travel)
    operators    relational + dedup + similarity + text + multimodal ops
    streaming    Structured Streaming ingest path
"""

from sdlt_spark.session import get_spark
from sdlt_spark.sql_dml import SqlDispatcher
from sdlt_spark.store import VintageTable

__all__ = ["get_spark", "SqlDispatcher", "VintageTable"]
__version__ = "0.1.0"
