"""Salted aggregation/join must be result-identical to the unsalted plans
(skew changes the physical distribution, never the answer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdlt_spark import tables
from sdlt_spark.operators import skew

SF = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain(spark):
    li = tables.load(spark, SF, "lineitem")
    plain = {
        (r["l_returnflag"],): (r["sum_qty"], r["n"], r["max_price"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["sum_qty"], r["n"], r["max_price"])
        for r in skew.salted_agg(
            li,
            ["l_returnflag"],
            "l_orderkey",
            {
                "sum_qty": ("sum", "l_quantity"),
                "n": ("count", "*"),
                "max_price": ("max", "l_extendedprice"),
            },
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][1] == salted[k][1]
        assert plain[k][2] == salted[k][2]
        assert abs(plain[k][0] - salted[k][0]) < 1e-6


def test_salted_join_matches_plain(spark):
    orders = tables.load(spark, SF, "orders")
    customer = tables.load(spark, SF, "customer").withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_mktsegment")
    salted = skew.salted_join(
        orders, customer, on="o_custkey", salt_source="o_orderkey"
    ).select("o_orderkey", "c_mktsegment")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    orders = tables.load(spark, SF, "orders")
    # dim missing most keys -> unmatched bigs must survive with nulls
    dim = (
        tables.load(spark, SF, "customer")
        .filter(F.col("c_custkey") < 10)
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    plain = orders.join(dim, "o_custkey", "left").select("o_orderkey", "c_mktsegment")
    salted = skew.salted_join(
        orders, dim, on="o_custkey", salt_source="o_orderkey", how="left"
    ).select("o_orderkey", "c_mktsegment")
    assert sorted(map(tuple, plain.collect()), key=str) == sorted(
        map(tuple, salted.collect()), key=str
    )
