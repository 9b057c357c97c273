"""Bucketed co-located joins: the plan must contain NO Exchange — the
write-time bucketing replaces the join-time shuffle (SCALE.md join row)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdlt_spark import bucketing, tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    li = tables.load(spark, SF, "lineitem").withColumnRenamed("l_orderkey", "okey")
    o = tables.load(spark, SF, "orders").withColumnRenamed("o_orderkey", "okey")
    bucketing.write_bucketed(li, "b_lineitem", "okey", num_buckets=8)
    bucketing.write_bucketed(o, "b_orders", "okey", num_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    # at fixture scale Catalyst would (rightly) broadcast the tiny side and
    # ignore bucketing; disable broadcast to exercise the big-big plan shape
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.cobucketed_join(spark, "b_lineitem", "b_orders", "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_cobucketed_join_correct(spark, bucketed):
    joined = bucketing.cobucketed_join(spark, "b_lineitem", "b_orders", "okey")
    expected = (
        tables.load(spark, SF, "lineitem")
        .join(
            tables.load(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected


def test_bucketed_agg_skips_shuffle(spark, bucketed):
    """Aggregation on the bucket key also reuses the layout: no Exchange."""
    agg = (
        bucketing.read_table(spark, "b_lineitem")
        .groupBy("okey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_partitioned_write_prunes_scan(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning), and only the matching partition's rows load."""
    o = tables.load(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    bucketing.write_partitioned(o, path, ["o_year"])

    back = bucketing.read_partitioned(spark, path)
    q = back.filter(F.col("o_year") == 1995)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_year" in plan.split("PartitionFilters")[1][:120], plan
    expected = o.filter(F.col("o_year") == 1995).count()
    assert q.count() == expected > 0
