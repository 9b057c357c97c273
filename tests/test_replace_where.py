"""replaceWhere (Delta's predicate-scoped overwrite): one commit replaces
exactly the predicate's rows with the incoming data; untouched files are
not rewritten; out-of-region incoming rows are rejected."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdlt_spark.store import VintageTable


def _base(spark, path, change_feed=False):
    t = VintageTable(spark, path, change_feed=change_feed)
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
    )
    # cluster so each grp owns its own file(s): untouched-file assertions
    # are meaningful
    t.write(df, cluster_by=["grp"], num_files=4)
    return t


def test_replace_where_swaps_only_matching_rows(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    files_before = set(t._live_files())
    new = spark.range(100, 103).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("grp")
    )
    v = t.write(new, mode="overwrite", replace_where="grp = 1")
    rows = t.read().collect()
    got_grp1 = sorted(r["k"] for r in rows if r["grp"] == 1)
    assert got_grp1 == [100, 101, 102]
    got_rest = sorted(r["k"] for r in rows if r["grp"] != 1)
    assert got_rest == sorted(k for k in range(40) if k % 4 != 1)
    # files holding only non-matching rows survived untouched
    files_after = set(t._live_files())
    assert files_before & files_after, "untouched files were rewritten"
    # history: one commit, predicate recorded
    import json

    h = {r["version"]: r for r in t.history().collect()}
    assert json.loads(h[v]["operationParameters"])["predicate"] == "grp = 1"
    # time travel still sees the pre-replace state
    assert sorted(r["k"] for r in t.read(version=v - 1).collect()) == list(range(40))


def test_replace_where_rejects_out_of_region_rows(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    bad = spark.range(200, 202).select(
        F.col("id").alias("k"), F.lit(2).cast("long").alias("grp")
    )
    v_before = t.latest_version()
    with pytest.raises(ValueError, match="do not satisfy the predicate"):
        t.write(bad, mode="overwrite", replace_where="grp = 1")
    assert t.latest_version() == v_before  # nothing committed
    assert sorted(r["k"] for r in t.read().collect()) == list(range(40))


def test_replace_where_null_eval_rows_survive(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, 1), (2, None), (3, 9)], "k long, grp long"
        )
    )
    t.write(
        spark.createDataFrame([(10, 1)], "k long, grp long"),
        mode="overwrite",
        replace_where="grp = 1",
    )
    got = sorted((r["k"], r["grp"]) for r in t.read().collect())
    # the NULL-grp row is NOT in the replaced region (SQL semantics)
    assert got == [(2, None), (3, 9), (10, 1)]


def test_replace_where_change_feed_rows(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"), change_feed=True)
    new = spark.range(100, 102).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("grp")
    )
    v = t.write(new, mode="overwrite", replace_where="grp = 0")
    ch = t.table_changes(v, v).collect()
    dels = sorted(r["k"] for r in ch if r["_change_type"] == "delete")
    ins = sorted(r["k"] for r in ch if r["_change_type"] == "insert")
    assert dels == [k for k in range(40) if k % 4 == 0]
    assert ins == [100, 101]


def test_replace_where_on_missing_table_is_plain_write(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "t"))
    t.write(
        spark.range(3).select(F.col("id").alias("k"), F.lit(1).cast("long").alias("grp")),
        mode="overwrite",
        replace_where="grp = 1",
    )
    assert sorted(r["k"] for r in t.read().collect()) == [0, 1, 2]


def test_replace_where_folds_deletion_vectors_first(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    t.delete("k = 1", mode="dv")  # grp-1 file now has a DV
    new = spark.range(100, 101).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("grp")
    )
    t.write(new, mode="overwrite", replace_where="grp = 1")
    rows = sorted(r["k"] for r in t.read().collect())
    # k=1 was DV-deleted before the replace; it must NOT resurrect
    assert rows == sorted([k for k in range(40) if k % 4 != 1] + [100])
