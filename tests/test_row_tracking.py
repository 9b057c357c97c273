"""Delta Row Tracking (PROTOCOL.md "Row Tracking").

Fresh row ids = add.baseRowId + position; rowIdHighWaterMark rides the
delta.rowTracking domainMetadata; materialized hidden columns override
fresh values after rewrites. Covers: append assignment, DV-delete
stability (re-add keeps base + original default commit version), CoW
DELETE/UPDATE/MERGE materialization (stable ids survive a rewrite; a
matched MERGE row keeps its id, inserts get fresh ones), checkpoint
carry (JSON log cleanup must not renumber rows), and the loud refusal
on untracked tables.
"""

import json
import os

import pytest

from sdlt_spark.store.delta_mutate import (
    delete_delta_export,
    merge_delta_export,
    update_delta_export,
)
from sdlt_spark.store.delta_read import DeltaProtocolError, DeltaTableReader
from sdlt_spark.store.delta_write import (
    DeltaLogWriter,
    allocate_base_row_ids,
    row_tracking_configuration,
    row_tracking_protocol,
)

_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_part(abs_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(abs_path), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(rows, pa.int64()),
                "v": pa.array([None if r is None else f"v{r}" for r in rows]),
            }
        ),
        abs_path,
    )


def _tracked_table(tmp_path, files, declare_materialized=True):
    """Row-tracked table: one commit per entry of ``files`` so default
    row commit versions differ."""
    root = str(tmp_path / "rt")
    w = DeltaLogWriter(root)
    first = True
    for name, rows in files.items():
        rel = f"data/{name}.parquet"
        _write_part(os.path.join(root, rel), rows)
        base, hwm = allocate_base_row_ids(root, [rel])
        kw = {}
        if first:
            kw = {
                "schema_json": _SCHEMA,
                "protocol": row_tracking_protocol(),
                "configuration": (
                    row_tracking_configuration()
                    if declare_materialized
                    else {"delta.enableRowTracking": "true"}
                ),
            }
            first = False
        w.commit(adds=[(rel, {})], base_row_ids=base,
                 row_id_high_water_mark=hwm, **kw)
    return root


def _ids(spark, root, **kw):
    return {
        r["k"]: (r["row_id"], r["row_commit_version"])
        for r in DeltaTableReader(spark, root).read_with_row_ids(**kw).collect()
    }


def test_fresh_ids_and_commit_versions(spark, tmp_path):
    root = _tracked_table(tmp_path, {"a": [1, 2, 3], "b": [10, 11]})
    got = _ids(spark, root)
    assert got == {1: (0, 0), 2: (1, 0), 3: (2, 0), 10: (3, 1), 11: (4, 1)}
    r = DeltaTableReader(spark, root)
    assert r.row_id_high_water_mark() == 4


def test_dv_delete_preserves_surviving_ids(spark, tmp_path):
    root = _tracked_table(tmp_path, {"a": [1, 2, 3], "b": [10, 11]})
    v = delete_delta_export(root, spark, "k = 2", mode="dv")
    got = _ids(spark, root)
    # physical positions unchanged: 3 keeps fresh id 2; versions original
    assert got == {1: (0, 0), 3: (2, 0), 10: (3, 1), 11: (4, 1)}
    # the re-add carried the file's base and ORIGINAL default version
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    ]
    add = next(a["add"] for a in acts if "add" in a)
    assert add["baseRowId"] == 0 and add["defaultRowCommitVersion"] == 0


def test_cow_delete_materializes_stable_ids(spark, tmp_path):
    root = _tracked_table(tmp_path, {"a": [1, 2, 3], "b": [10, 11]})
    delete_delta_export(root, spark, "k = 2", mode="cow")
    got = _ids(spark, root)
    # survivors of the rewritten file keep id AND original version via
    # the materialized columns; file b untouched
    assert got == {1: (0, 0), 3: (2, 0), 10: (3, 1), 11: (4, 1)}
    # HWM bumped: the new file was assigned a fresh (unused-by-survivors)
    # range — delta-spark does the same
    assert DeltaTableReader(spark, root).row_id_high_water_mark() > 4


def test_cow_delete_declares_materialized_config_when_missing(spark, tmp_path):
    root = _tracked_table(
        tmp_path, {"a": [1, 2, 3]}, declare_materialized=False
    )
    delete_delta_export(root, spark, "k = 2", mode="cow")
    r = DeltaTableReader(spark, root)
    snap = r.snapshot()
    cfg = snap.metadata["configuration"]
    assert "delta.rowTracking.materializedRowIdColumnName" in cfg
    assert _ids(spark, root) == {1: (0, 0), 3: (2, 0)}


def test_update_preserves_ids_and_stamps_touched_rows(spark, tmp_path):
    root = _tracked_table(tmp_path, {"a": [1, 2, 3]})
    v = update_delta_export(root, spark, "k = 2", {"v": "'patched'"})
    got = _ids(spark, root)
    assert got[1] == (0, 0) and got[3] == (2, 0)  # untouched neighbors
    assert got[2] == (1, v)  # updated row: same id, NEW commit version
    rows = {
        r["k"]: r["v"]
        for r in DeltaTableReader(spark, root).read().collect()
    }
    assert rows[2] == "patched"


def test_merge_matched_keeps_id_inserts_get_fresh(spark, tmp_path):
    root = _tracked_table(tmp_path, {"a": [1, 2, 3]})
    src = DeltaTableReader(spark, root).spark.createDataFrame(
        [(2, "upd"), (99, "new")], "k long, v string"
    )
    v = merge_delta_export(root, spark, src, on=["k"])
    got = _ids(spark, root)
    assert got[1] == (0, 0) and got[3] == (2, 0)
    assert got[2] == (1, v)  # matched: inherited id, new version
    nid, nver = got[99]  # insert: fresh id above the old HWM
    assert nid > 2 and nver == v
    # ids stay unique
    assert len({i for i, _ in got.values()}) == len(got)


def test_merge_duplicate_keyed_target_keeps_source_multiplicity(
    spark, tmp_path
):
    """Regression: a duplicate-keyed TARGET must not fan each matched
    source row out once per duplicate — the tracked path dedupes the
    (key, row_id) side before its identity join, so multiplicity matches
    the untracked path (one row per source row) and the survivor keeps
    the OLDEST duplicate's row id (deterministic min)."""
    root = _tracked_table(tmp_path, {"a": [1, 2, 2]})  # k=2 duplicated
    src = DeltaTableReader(spark, root).spark.createDataFrame(
        [(2, "upd")], "k long, v string"
    )
    merge_delta_export(root, spark, src, on=["k"])
    rows = DeltaTableReader(spark, root).read().collect()
    # upsert-all semantics: BOTH k=2 duplicates matched and were replaced
    # by the single source row — exactly one k=2 survives
    assert sorted((r["k"], r["v"]) for r in rows) == [(1, "v1"), (2, "upd")]
    got = _ids(spark, root)
    assert len(got) == 2
    assert got[2][0] == 1  # min(row_id) of the duplicate pair (ids 1, 2)
    assert got[1][0] == 0


def test_second_cow_mutation_keeps_materialized_ids(spark, tmp_path):
    # materialized columns must survive a SECOND rewrite (read back from
    # the hidden column, re-written forward)
    root = _tracked_table(tmp_path, {"a": [1, 2, 3, 4]})
    delete_delta_export(root, spark, "k = 2", mode="cow")
    update_delta_export(root, spark, "k = 4", {"v": "'x'"})
    got = _ids(spark, root)
    assert got[1] == (0, 0) and got[3] == (2, 0)
    assert got[4][0] == 3  # id stable across two rewrites


def test_checkpoint_carries_row_tracking_state(spark, tmp_path):
    root = _tracked_table(tmp_path, {"a": [1, 2, 3], "b": [10, 11]})
    w = DeltaLogWriter(root)
    before = _ids(spark, root)
    w.write_checkpoint()
    # simulate log cleanup: drop every JSON commit at/below the checkpoint
    for f in os.listdir(os.path.join(root, "_delta_log")):
        if f.endswith(".json") and f[:-5].isdigit():
            os.remove(os.path.join(root, "_delta_log", f))
    r = DeltaTableReader(spark, root)
    assert _ids(spark, root) == before
    assert r.row_id_high_water_mark() == 4  # domainMetadata carried


def test_read_with_row_ids_refuses_untracked_tables(spark, tmp_path):
    root = str(tmp_path / "plain")
    rel = "data/a.parquet"
    _write_part(os.path.join(root, rel), [1, 2])
    DeltaLogWriter(root).commit(adds=[(rel, {})], schema_json=_SCHEMA)
    with pytest.raises(DeltaProtocolError, match="baseRowId"):
        DeltaTableReader(spark, root).read_with_row_ids()


def test_row_tracking_protocol_carries_legacy_features():
    p = row_tracking_protocol({"minReaderVersion": 1, "minWriterVersion": 4})
    assert p["minWriterVersion"] == 7
    wf = set(p["writerFeatures"])
    assert {"rowTracking", "domainMetadata", "appendOnly", "invariants",
            "checkConstraints", "changeDataFeed", "generatedColumns"} <= wf
    # idempotent on an already-tracked protocol
    assert row_tracking_protocol(p) == p


def test_optimize_preserves_ids(spark, tmp_path):
    from sdlt_spark.store.delta_write import optimize_delta_export

    root = _tracked_table(tmp_path, {"a": [1, 2], "b": [3, 4], "c": [5]})
    before = _ids(spark, root)
    produced = optimize_delta_export(root, spark)
    assert produced  # the small files were compacted
    assert _ids(spark, root) == before  # materialized through the rewrite


def test_zorder_preserves_ids(spark, tmp_path):
    from sdlt_spark.store.delta_write import optimize_delta_export

    root = _tracked_table(tmp_path, {"a": [3, 1, 4], "b": [2, 5]})
    before = _ids(spark, root)
    produced = optimize_delta_export(root, spark, zorder_by=["k", "v"])
    assert produced
    assert _ids(spark, root) == before


def test_restore_and_clone_preserve_row_ids(spark, tmp_path):
    from sdlt_spark.store.delta_write import (
        clone_delta_export,
        restore_delta_export,
    )

    root = _tracked_table(tmp_path, {"a": [1, 2, 3], "b": [10, 11]})
    v1_ids = _ids(spark, root)
    delete_delta_export(root, spark, "k = 2", mode="cow")
    # restore back to the pre-delete state: re-added file keeps its base
    restore_delta_export(root, version=1)
    assert _ids(spark, root) == v1_ids
    # a shallow clone carries ids AND the high-water mark
    dest = str(tmp_path / "clone")
    clone_delta_export(root, dest)
    assert _ids(spark, dest) == v1_ids
    r = DeltaTableReader(spark, dest)
    assert r.row_id_high_water_mark() >= 4


def test_stream_sink_appends_assign_fresh_ids(spark, tmp_path):
    from sdlt_spark.streaming.delta_sink import DeltaStreamSink

    root = _tracked_table(tmp_path, {"a": [1, 2, 3]})
    sink = DeltaStreamSink(root, app_id="t")
    sink.write_batch(
        spark.createDataFrame([(50, "s0"), (51, "s1")], "k long, v string"),
        batch_id=0,
    )
    got = _ids(spark, root)
    assert got[1] == (0, 0) and got[3] == (2, 0)
    new_ids = {got[50][0], got[51][0]}
    assert new_ids == {3, 4}  # fresh range past the old mark
    assert DeltaTableReader(spark, root).row_id_high_water_mark() == 4
    # a replayed batch is skipped: no double allocation
    assert sink.write_batch(
        spark.createDataFrame([(50, "s0")], "k long, v string"), batch_id=0
    ) is None
    assert DeltaTableReader(spark, root).row_id_high_water_mark() == 4


def test_export_with_row_tracking_and_sync(spark, tmp_path):
    """export_vintage_to_delta(row_tracking=True): the export is a
    row-tracked Delta table from v0; an incremental SYNC allocates fresh
    disjoint ranges for its new files and old ids stay stable."""
    from sdlt_spark import tables
    from sdlt_spark.store.delta_write import export_vintage_to_delta
    from sdlt_spark.store.vintage import VintageTable

    src = tables.load(spark, "/root/testdata/sf0.001", "region").select(
        "r_regionkey", "r_name"
    )
    t = VintageTable(spark, str(tmp_path / "vt"))
    t.write(src.coalesce(1))
    dest = str(tmp_path / "exp")
    export_vintage_to_delta(t, dest, row_tracking=True)
    r = DeltaTableReader(spark, dest)
    ids0 = {
        row["r_regionkey"]: row["row_id"]
        for row in r.read_with_row_ids().collect()
    }
    assert sorted(ids0.values()) == list(range(len(ids0)))
    hwm0 = r.row_id_high_water_mark()
    assert hwm0 == len(ids0) - 1
    # mutate the source, sync: new file gets a range past the mark
    extra = spark.createDataFrame([(90, "NOWHERE")], "r_regionkey int, r_name string")
    t.write(extra, mode="append")
    export_vintage_to_delta(t, dest, row_tracking=True)
    ids1 = {
        row["r_regionkey"]: row["row_id"]
        for row in r.read_with_row_ids().collect()
    }
    for k, v in ids0.items():
        assert ids1[k] == v  # untouched files keep their fresh ids
    assert ids1[90] > hwm0
    assert r.row_id_high_water_mark() > hwm0
