"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (scan -> filter -> broadcast join ->
agg -> sort, SURVEY.md §7 Phase 0); ``queries()``/``oracle_sql()`` expose the
declared operator inventory from SURVEY.md §2, implemented in
``sdlt_spark.queries`` (+ extension modules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make sdlt_spark importable no matter which cwd the driver imports us from
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import sdlt_spark.queries as _queries
from sdlt_spark import tables

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue per (mktsegment, order year) for non-returned items.

    Exercises parquet scan w/ pushdown (S9/P3), broadcast equi join (J1),
    hash aggregation (A2) and total sort (§2.7) in one plan.
    """
    li = tables.load(spark, SF0001, "lineitem")
    o = tables.load(spark, SF0001, "orders")
    c = tables.load(spark, SF0001, "customer")
    return (
        li.filter(F.col("l_returnflag") != "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("c_mktsegment", "order_year")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _queries.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _queries.registry().items() if sql is not None
    }
