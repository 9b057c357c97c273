"""merge(not_matched_by_source_delete=...) — Delta's
whenNotMatchedBySourceDelete clause on the vintage store: full-sync and
conditioned deletes, NULL-condition keep semantics, CDC capture, history."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sdlt_spark.store import VintageTable


@pytest.fixture()
def base(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, "F", 20.0), (3, "A", 30.0), (4, "F", 40.0), (5, None, 50.0)],
        "k int, status string, v double",
    )
    t.write(df.repartition(2), mode="overwrite")
    return t


def _rows(t, **kw):
    return sorted(tuple(r) for r in t.read(**kw).collect())


def test_full_sync_replaces_with_source(spark, base):
    src = spark.createDataFrame(
        [(2, "U", 21.0), (6, "N", 60.0)], "k int, status string, v double"
    )
    base.merge(src, ["k"], not_matched_by_source_delete=True)
    assert _rows(base) == [(2, "U", 21.0), (6, "N", 60.0)]
    # time travel still sees the pre-sync state
    assert len(_rows(base, version=0)) == 5


def test_conditioned_delete_keeps_null_condition_rows(spark, base):
    src = spark.createDataFrame([(1, "U", 11.0)], "k int, status string, v double")
    base.merge(src, ["k"], not_matched_by_source_delete="status = 'F'")
    # matched row updated; unmatched 'F' rows deleted; unmatched 'A' kept;
    # the NULL-status row is kept (condition NULL -> no delete)
    assert _rows(base) == [(1, "U", 11.0), (3, "A", 30.0), (5, None, 50.0)]


def test_plain_merge_unaffected(spark, base):
    src = spark.createDataFrame([(1, "U", 11.0)], "k int, status string, v double")
    base.merge(src, ["k"])
    assert len(_rows(base)) == 5


def test_sync_emits_cdc_deletes(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "cdc"), change_feed=True)
    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, "F", 20.0)], "k int, status string, v double"
    )
    t.write(df, mode="overwrite")
    src = spark.createDataFrame([(1, "U", 11.0)], "k int, status string, v double")
    v = t.merge(src, ["k"], not_matched_by_source_delete=True)
    ch = t.table_changes(from_version=v)
    got = sorted(
        (r["k"], r["_change_type"]) for r in ch.select("k", "_change_type").collect()
    )
    # insert of the source row, delete of its old image, delete of row 2
    assert got == [(1, "delete"), (1, "insert"), (2, "delete")]


def test_history_records_clause(spark, base):
    src = spark.createDataFrame([(1, "U", 11.0)], "k int, status string, v double")
    base.merge(src, ["k"], not_matched_by_source_delete="status = 'F'")
    h = base.history().filter(F.col("operation") == "MERGE").collect()
    assert any(
        "notMatchedBySourceDelete" in str(r["operationParameters"])
        and "status = 'F'" in str(r["operationParameters"])
        for r in h
    )


def test_sync_equals_sequential_merge_plus_delete(spark, tmp_path):
    """One sync commit == merge then delete-unmatched, row-for-row."""
    mk = lambda name: VintageTable(spark, str(tmp_path / name))  # noqa: E731
    df = spark.createDataFrame(
        [(i, "F" if i % 2 else "A", float(i)) for i in range(20)],
        "k int, status string, v double",
    )
    src = spark.createDataFrame(
        [(i, "U", float(i * 100)) for i in range(0, 20, 3)],
        "k int, status string, v double",
    )
    a, b = mk("a"), mk("b")
    a.write(df, mode="overwrite")
    b.write(df, mode="overwrite")
    a.merge(src, ["k"], not_matched_by_source_delete="status = 'F'")
    b.merge(src, ["k"])
    b.delete("status = 'F'")
    assert sorted(map(tuple, a.read().collect())) == sorted(
        map(tuple, b.read().collect())
    )
