"""Conditional MERGE clauses (Delta's whenMatchedUpdate(condition)/
whenMatchedDelete(condition)/whenNotMatchedInsert(condition) subset):
matched rows matching NO clause stay unchanged — the contract that differs
from default updateAll — plus composition with whenNotMatchedBySourceDelete
and the change feed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdlt_spark.store.vintage import VintageTable


def _mk(spark, path, change_feed=False):
    t = VintageTable(spark, path, change_feed=change_feed)
    rows = [(k, k % 5, float(k * 10)) for k in range(20)]
    t.write(
        spark.createDataFrame(rows, "k long, grp long, v double").repartition(3)
    )
    return t


def _src(spark, rows):
    return spark.createDataFrame(rows, "k long, grp long, v double")


def test_matched_update_with_condition_leaves_nonmatching_rows(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    # src hits k=1 (v=10) and k=2 (v=20); only rows with v < 15 get updated
    src = _src(spark, [(1, 9, 111.0), (2, 9, 222.0), (50, 9, 555.0)])
    t.merge(
        src, ["k"],
        matched_update={"v": "src_v", "grp": "src_grp"},
        matched_condition="v < 15",
    )
    got = {r["k"]: (r["grp"], r["v"]) for r in t.read().collect()}
    assert got[1] == (9, 111.0)      # matched + condition -> updated
    assert got[2] == (2, 20.0)       # matched, condition false -> UNCHANGED
    assert got[50] == (9, 555.0)     # not matched -> inserted
    assert len(got) == 21


def test_matched_delete_condition(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    src = _src(spark, [(3, 0, 0.0), (4, 0, 0.0)])
    # delete matched rows whose CURRENT v < 35 (k=3 has v=30; k=4 has v=40)
    t.merge(src, ["k"], matched_delete="v < 35")
    ks = sorted(r["k"] for r in t.read().collect())
    assert 3 not in ks and 4 in ks
    # k=4 matched but no clause applied -> unchanged, and src row NOT inserted
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[4] == 40.0
    assert len(ks) == 19


def test_delete_evaluated_before_update(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    src = _src(spark, [(5, 1, -1.0)])
    t.merge(
        src, ["k"],
        matched_delete="v = 50",          # k=5 has v=50 -> deleted
        matched_update={"v": "src_v"},    # would also match; delete wins
    )
    assert t.read().filter(F.col("k") == 5).count() == 0


def test_insert_condition_filters_new_rows(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    src = _src(spark, [(100, 1, 5.0), (101, 1, 500.0)])
    t.merge(src, ["k"], insert_condition="v > 100")
    ks = {r["k"] for r in t.read().collect()}
    assert 101 in ks and 100 not in ks


def test_clauses_compose_with_nmbs_delete(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    src = _src(spark, [(0, 0, 1.0), (1, 0, 1.0)])
    # sync-to-source of grp 0 target rows: unmatched grp-0 rows deleted,
    # matched ones updated
    t.merge(
        src, ["k"],
        matched_update={"v": "src_v"},
        not_matched_by_source_delete="grp = 0",
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[0] == 1.0 and got[1] == 1.0
    # grp-0 keys not in src (5, 10, 15) are gone; other grps intact
    assert {5, 10, 15}.isdisjoint(got)
    assert len(got) == 17


def test_clause_change_feed_rows(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), change_feed=True)
    src = _src(spark, [(1, 1, -1.0), (3, 3, -3.0), (200, 0, 99.0)])
    v = t.merge(
        src, ["k"],
        matched_update={"v": "src_v"},
        matched_condition="k = 1",     # only k=1 updates; k=3 untouched
        insert_condition="v > 0",      # k=200 inserts
    )
    ch = sorted(
        (r["k"], r["_change_type"], r["v"]) for r in t.table_changes(v, v).collect()
    )
    assert ch == [
        (1, "delete", 10.0),
        (1, "insert", -1.0),
        (200, "insert", 99.0),
    ]


def test_clause_mode_rejects_schema_evolution(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    src = _src(spark, [(1, 1, 1.0)])
    with pytest.raises(NotImplementedError, match="schema_evolution"):
        t.merge(src, ["k"], matched_update={"v": "src_v"}, schema_evolution=True)
    with pytest.raises(ValueError, match="matched_condition"):
        t.merge(src, ["k"], matched_condition="v < 0")


def test_clause_merge_is_time_travelable_and_cow(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v0 = t.latest_version()
    files_before = set(t._live_files())
    t.merge(_src(spark, [(7, 0, 0.0)]), ["k"], matched_delete=True)
    assert t.read(version=v0).count() == 20
    assert t.read().count() == 19
    # copy-on-write: only the file(s) holding k=7 were replaced
    assert files_before & set(t._live_files())  # untouched files survive
