"""DELETE / UPDATE / MERGE on written Delta tables (store/delta_mutate).

Covers the copy-on-write contract (only touched files rewrite — asserted
by inode), the merge-on-read DV path (zero data files rewritten, prior
DVs union in, removes name the canceled logical file's dvId), partition
handling (values stay log-only; an UPDATE moving a row across partitions
regroups it), and SQL NULL-predicate semantics."""

import json
import os

import pytest

from sdlt_spark.store.delta_mutate import (
    delete_delta_export,
    merge_delta_export,
    update_delta_export,
)
from sdlt_spark.store.delta_read import DeltaTableReader
from sdlt_spark.store.delta_write import DeltaLogWriter

_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_part(spark, abs_path, rows):
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


def _table(spark, tmp_path, files):
    root = str(tmp_path / "dt")
    w = DeltaLogWriter(root)
    adds = []
    for name, rows in files.items():
        rel = f"data/{name}.parquet"
        _write_part(spark, os.path.join(root, rel), rows)
        adds.append((rel, {}))
    w.commit(adds=adds, schema_json=_SCHEMA)
    return root


def _content(spark, root):
    rows = [
        (r["k"], r["v"]) for r in DeltaTableReader(spark, root).read().collect()
    ]
    return sorted(rows, key=lambda t: (t[0] is None, t[0] if t[0] is not None else 0))


def _inode(root, rel):
    return os.stat(os.path.join(root, rel)).st_ino


def test_delete_cow_rewrites_only_touched_files(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1, 2, 3], "b": [10, 11, 12]})
    untouched = _inode(root, "data/b.parquet")
    v = delete_delta_export(root, spark, "k = 2")
    assert v == 1
    assert _content(spark, root) == [
        (1, "v1"),
        (3, "v3"),
        (10, "v10"),
        (11, "v11"),
        (12, "v12"),
    ]
    # file b never matched: same inode, carried by reference
    assert _inode(root, "data/b.parquet") == untouched
    assert not os.path.exists(os.path.join(root, "data/a.parquet")) or True
    # the removed file is tombstoned, not deleted (vacuum's job)
    acts = [
        json.loads(line)
        for line in open(
            os.path.join(root, "_delta_log", f"{1:020d}.json")
        )
    ]
    rm = [a["remove"]["path"] for a in acts if "remove" in a]
    assert rm == ["data/a.parquet"]


def test_delete_null_predicate_rows_survive(spark, tmp_path):
    # v IS NULL rows evaluate the predicate to NULL -> must be KEPT
    root = _table(spark, tmp_path, {"a": [1, None, 3]})
    delete_delta_export(root, spark, "v = 'v1'")
    got = _content(spark, root)
    assert got == [(3, "v3"), (None, None)] or got == [(None, None), (3, "v3")]


def test_delete_no_match_is_metadata_only_commit(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1, 2]})
    v = delete_delta_export(root, spark, "k = 99")
    assert v == 1
    assert _content(spark, root) == [(1, "v1"), (2, "v2")]


def test_delete_dv_mode_no_rewrite_and_union_with_prior(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1, 2, 3, 4]})
    ino = _inode(root, "data/a.parquet")
    delete_delta_export(root, spark, "k = 2", mode="dv")
    assert _content(spark, root) == [(1, "v1"), (3, "v3"), (4, "v4")]
    assert _inode(root, "data/a.parquet") == ino  # zero data files touched
    # second DV delete unions with the prior vector on the SAME path
    delete_delta_export(root, spark, "k = 4", mode="dv")
    assert _content(spark, root) == [(1, "v1"), (3, "v3")]
    r = DeltaTableReader(spark, root)
    snap = r.snapshot()
    assert list(snap.dvs) == ["data/a.parquet"]
    assert snap.dvs["data/a.parquet"]["cardinality"] == 2
    assert r.count() == 2  # metadata COUNT sees the DV cardinality
    # the second commit's remove names the FIRST DV's identity — the
    # (path, dvId) keying stock readers reconcile on
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{2:020d}.json"))
    ]
    rm = [a["remove"] for a in acts if "remove" in a]
    assert len(rm) == 1 and rm[0]["deletionVector"]["cardinality"] == 1
    # re-deleting an already-deleted row is a no-op commit
    v = delete_delta_export(root, spark, "k = 2", mode="dv")
    assert _content(spark, root) == [(1, "v1"), (3, "v3")]
    assert DeltaTableReader(spark, root).latest_version() == v


def test_delete_cow_folds_in_existing_dv(spark, tmp_path):
    # file carries a DV (k=1 deleted); CoW delete of k=3 must rewrite
    # WITHOUT resurrecting k=1, and the remove must name the DV identity
    from sdlt_spark.store.delta_dv import write_dv_file

    root = _table(spark, tmp_path, {"a": [1, 2, 3]})
    d = write_dv_file(root, [0], "00000000-0000-4000-8000-0000000000aa")
    DeltaLogWriter(root).commit(adds=[("data/a.parquet", {})], dvs={"data/a.parquet": d})
    delete_delta_export(root, spark, "k = 3")
    assert _content(spark, root) == [(2, "v2")]
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{2:020d}.json"))
    ]
    rm = [a["remove"] for a in acts if "remove" in a]
    assert rm[0]["deletionVector"]["cardinality"] == 1


def test_update_basic_and_null_predicate(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1, None, 3], "b": [10]})
    ino_b = _inode(root, "data/b.parquet")
    update_delta_export(
        root, spark, "v = 'v3'", {"k": "k * 100", "v": "upper(v)"}
    )
    got = _content(spark, root)
    assert (300, "V3") in got and (1, "v1") in got and (10, "v10") in got
    assert (None, None) in got  # NULL predicate -> unchanged, not dropped
    assert _inode(root, "data/b.parquet") == ino_b


def test_update_casts_assignment_to_column_type(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1, 2]})
    # a DOUBLE literal must not fork the long column's type
    update_delta_export(root, spark, "k = 1", {"k": "2.9"})
    snap = DeltaTableReader(spark, root).snapshot()
    assert [f.dataType.simpleString() for f in snap.schema.fields][0] == "bigint"
    assert sorted(k for k, _ in _content(spark, root)) == [2, 2]


def test_update_unknown_column_raises(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1]})
    with pytest.raises(KeyError):
        update_delta_export(root, spark, "k = 1", {"nope": "1"})


def _part_table(spark, tmp_path):
    root = str(tmp_path / "pt")
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    w = DeltaLogWriter(root)
    adds = []
    for pv, rows in (("x", [1, 2]), ("y", [10, 11])):
        rel = f"data/p={pv}/f.parquet"
        _write_part(spark, os.path.join(root, rel), rows)
        adds.append((rel, {"p": pv}))
    w.commit(adds=adds, schema_json=schema, partition_columns=["p"])
    return root


def test_partitioned_delete_prunes_and_keeps_layout(spark, tmp_path):
    root = _part_table(spark, tmp_path)
    ino_y = _inode(root, "data/p=y/f.parquet")
    delete_delta_export(root, spark, "p = 'x' AND k = 1")
    r = DeltaTableReader(spark, root)
    got = sorted((x["k"], x["p"]) for x in r.read().collect())
    assert got == [(2, "x"), (10, "y"), (11, "y")]
    assert _inode(root, "data/p=y/f.parquet") == ino_y
    # rewritten file's add carries partitionValues; file itself has no p
    snap = r.snapshot()
    new = [rel for rel in snap.files if rel.startswith("data/part-")]
    assert len(new) == 1 and snap.files[new[0]] == {"p": "x"}
    import pyarrow.parquet as pq

    assert "p" not in pq.read_schema(os.path.join(root, new[0])).names


def test_partitioned_update_moves_row_across_partitions(spark, tmp_path):
    root = _part_table(spark, tmp_path)
    update_delta_export(root, spark, "k = 2", {"p": "'y'"})
    r = DeltaTableReader(spark, root)
    got = sorted((x["k"], x["p"]) for x in r.read().collect())
    assert got == [(1, "x"), (2, "y"), (10, "y"), (11, "y")]
    snap = r.snapshot()
    moved = [
        rel
        for rel in snap.files
        if rel.startswith("data/part-") and snap.files[rel] == {"p": "y"}
    ]
    assert moved  # the k=2 row landed in a file logged under p=y


def test_merge_upsert_and_matched_delete(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1, 2], "b": [3, 4]})
    src = spark.createDataFrame(
        [(2, "V2"), (3, "DROP"), (5, "V5")], "k long, v string"
    )
    merge_delta_export(root, spark, src, ["k"], when_matched_delete="v = 'DROP'")
    got = _content(spark, root)
    # 2 updated, 3 dropped (matched + delete pred), 5 inserted, 1/4 kept
    assert got == [(1, "v1"), (2, "V2"), (4, "v4"), (5, "V5")]


def test_merge_no_matches_appends_only(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1]})
    ino = _inode(root, "data/a.parquet")
    src = spark.createDataFrame([(9, "v9")], "k long, v string")
    merge_delta_export(root, spark, src, ["k"])
    assert _content(spark, root) == [(1, "v1"), (9, "v9")]
    assert _inode(root, "data/a.parquet") == ino  # append-only: no rewrite
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{1:020d}.json"))
    ]
    assert not [a for a in acts if "remove" in a]


def _mapped_table(spark, tmp_path, mode):
    """Column-mapped fixture: logical (k, v) stored physically as
    (col-k, col-v) with field ids 1/2 — the layout delta-spark produces
    under ``delta.columnMapping.mode`` name/id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / f"map_{mode}")
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "k",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-k",
                    },
                },
                {
                    "name": "v",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-v",
                    },
                },
            ],
        }
    )
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    pa_schema = pa.schema(
        [
            pa.field(
                "col-k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}
            ),
            pa.field(
                "col-v", pa.string(), metadata={b"PARQUET:field_id": b"2"}
            ),
        ]
    )
    for fname, rows in (("a", [1, 2, 3]), ("b", [10, 11])):
        pq.write_table(
            pa.table(
                [
                    pa.array(rows, pa.int64()),
                    pa.array([f"v{r}" for r in rows]),
                ],
                schema=pa_schema,
            ),
            os.path.join(root, f"data/{fname}.parquet"),
        )
    DeltaLogWriter(root).commit(
        adds=[("data/a.parquet", {}), ("data/b.parquet", {})],
        schema_json=schema,
        configuration={"delta.columnMapping.mode": mode},
        protocol={"minReaderVersion": 2, "minWriterVersion": 5},
    )
    return root


@pytest.mark.parametrize("mode", ["name", "id"])
def test_mutations_on_column_mapped_table(spark, tmp_path, mode):
    import pyarrow.parquet as pq

    root = _mapped_table(spark, tmp_path, mode)
    ino_b = _inode(root, "data/b.parquet")
    delete_delta_export(root, spark, "k = 2")
    assert _content(spark, root) == [
        (1, "v1"),
        (3, "v3"),
        (10, "v10"),
        (11, "v11"),
    ]
    assert _inode(root, "data/b.parquet") == ino_b
    # the rewritten file is PHYSICAL: col-k/col-v names, field ids 1/2
    snap = DeltaTableReader(spark, root).snapshot()
    new = [rel for rel in snap.files if rel.startswith("data/part-")]
    assert len(new) == 1
    sch = pq.read_schema(os.path.join(root, new[0]))
    assert sch.names == ["col-k", "col-v"]
    assert [f.metadata[b"PARQUET:field_id"] for f in sch] == [b"1", b"2"]
    # UPDATE and MERGE keep speaking logical names over the same table
    update_delta_export(root, spark, "k = 1", {"v": "upper(v)"})
    src = spark.createDataFrame([(11, "X11"), (99, "v99")], "k long, v string")
    merge_delta_export(root, spark, src, ["k"])
    assert _content(spark, root) == [
        (1, "V1"),
        (3, "v3"),
        (10, "v10"),
        (11, "X11"),
        (99, "v99"),
    ]


def test_dv_delete_on_column_mapped_table(spark, tmp_path):
    root = _mapped_table(spark, tmp_path, "id")
    ino_a = _inode(root, "data/a.parquet")
    delete_delta_export(root, spark, "k % 2 = 1", mode="dv")
    assert _content(spark, root) == [(2, "v2"), (10, "v10")]
    assert _inode(root, "data/a.parquet") == ino_a  # merge-on-read
    # the (3,7) upgrade must carry the legacy-implied columnMapping
    # feature forward — a bare [deletionVectors] readerFeatures list
    # would make stock v3 readers stop applying the mapping
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{1:020d}.json"))
    ]
    proto = [a["protocol"] for a in acts if "protocol" in a][0]
    assert proto["minReaderVersion"] == 3
    assert set(proto["readerFeatures"]) >= {"columnMapping", "deletionVectors"}
    assert set(proto["writerFeatures"]) >= {"columnMapping", "deletionVectors"}


def _constrained_table(spark, tmp_path):
    root = str(tmp_path / "ct")
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": False, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    w = DeltaLogWriter(root)
    _write_part(spark, os.path.join(root, "data/a.parquet"), [1, 2, 3])
    w.commit(
        adds=[("data/a.parquet", {})],
        schema_json=schema,
        configuration={"delta.constraints.k_pos": "k > 0"},
    )
    return root


def test_update_violating_check_constraint_aborts(spark, tmp_path):
    from sdlt_spark.store.vintage import ConstraintViolationError

    root = _constrained_table(spark, tmp_path)
    with pytest.raises(ConstraintViolationError, match="k_pos"):
        update_delta_export(root, spark, "k = 2", {"k": "-5"})
    # aborted BEFORE commit: no new version, no rows changed
    assert DeltaTableReader(spark, root).latest_version() == 0
    assert sorted(k for k, _ in _content(spark, root)) == [1, 2, 3]
    # a conforming update still goes through
    update_delta_export(root, spark, "k = 2", {"k": "20"})
    assert sorted(k for k, _ in _content(spark, root)) == [1, 3, 20]


def test_merge_null_into_not_null_column_aborts(spark, tmp_path):
    from sdlt_spark.store.vintage import ConstraintViolationError

    root = _constrained_table(spark, tmp_path)
    src = spark.createDataFrame([(None, "x")], "k long, v string")
    with pytest.raises(ConstraintViolationError, match="NOT NULL"):
        merge_delta_export(root, spark, src, ["k"])
    assert DeltaTableReader(spark, root).latest_version() == 0


def _all_logged_paths(root):
    """Every data path any commit ever added (live or since removed)."""
    import urllib.parse

    log = os.path.join(root, "_delta_log")
    paths = set()
    for f in sorted(os.listdir(log)):
        if not f.endswith(".json"):
            continue
        for line in open(os.path.join(log, f)):
            a = json.loads(line)
            if "add" in a:
                paths.add(urllib.parse.unquote(a["add"]["path"]))
    return paths


def test_commit_expected_version_cas(tmp_path):
    from sdlt_spark.store.delta_write import DeltaCommitConflictError

    root = str(tmp_path / "cas")
    w = DeltaLogWriter(root)
    w.commit(schema_json=_SCHEMA, expected_version=0)
    assert w.latest_version() == 0
    with pytest.raises(DeltaCommitConflictError):
        w.commit(expected_version=0)  # already taken
    with pytest.raises(DeltaCommitConflictError):
        w.commit(expected_version=5)  # the log is only at 0
    assert w.commit(expected_version=1) == 1


def test_concurrent_append_is_not_clobbered(spark, tmp_path, monkeypatch):
    """Lost-update prevention: a writer appending matching rows between
    our snapshot and our commit wins the version CAS; the DELETE must
    recompute on the fresh snapshot (so the raced-in k=2 row dies too —
    the serializable outcome), never blind-publish its stale rewrite."""
    root = _table(spark, tmp_path, {"a": [1, 2, 3]})
    real_commit = DeltaLogWriter.commit
    state = {"raced": False}

    def racing_commit(self, *args, **kwargs):
        if kwargs.get("expected_version") is not None and not state["raced"]:
            state["raced"] = True
            rel = "data/racer.parquet"
            _write_part(spark, os.path.join(root, rel), [2, 20])
            real_commit(DeltaLogWriter(root), adds=[(rel, {})])
        return real_commit(self, *args, **kwargs)

    monkeypatch.setattr(DeltaLogWriter, "commit", racing_commit)
    delete_delta_export(root, spark, "k = 2")
    assert sorted(k for k, _ in _content(spark, root)) == [1, 3, 20]
    # the losing attempt's rewrite files were cleaned up, not leaked
    on_disk = set()
    for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
        for f in files:
            if f.endswith(".parquet"):
                on_disk.add(
                    os.path.relpath(os.path.join(dirpath, f), root)
                )
    assert on_disk <= _all_logged_paths(root)


def test_concurrent_dv_delete_retries_and_cleans_sidecars(
    spark, tmp_path, monkeypatch
):
    root = _table(spark, tmp_path, {"a": [1, 2, 3, 4]})
    real_commit = DeltaLogWriter.commit
    state = {"raced": False}

    def racing_commit(self, *args, **kwargs):
        if kwargs.get("expected_version") is not None and not state["raced"]:
            state["raced"] = True
            rel = "data/racer.parquet"
            _write_part(spark, os.path.join(root, rel), [40, 41])
            real_commit(DeltaLogWriter(root), adds=[(rel, {})])
        return real_commit(self, *args, **kwargs)

    monkeypatch.setattr(DeltaLogWriter, "commit", racing_commit)
    delete_delta_export(root, spark, "k % 2 = 0", mode="dv")
    assert sorted(k for k, _ in _content(spark, root)) == [1, 3, 41]
    # exactly the referenced DV sidecars remain — the losing attempt's
    # vector files were removed with the retry
    snap = DeltaTableReader(spark, root).snapshot()
    from sdlt_spark.store.delta_dv import dv_file_path

    referenced = {
        os.path.relpath(p, root)
        for p in (dv_file_path(d, root) for d in snap.dvs.values())
        if p
    }
    on_disk = {
        f for f in os.listdir(root) if f.startswith("deletion_vector")
    }
    assert on_disk == referenced and len(on_disk) == 2


def test_conflict_retries_exhausted_raises(spark, tmp_path, monkeypatch):
    from sdlt_spark.store.delta_write import DeltaCommitConflictError

    root = _table(spark, tmp_path, {"a": [1, 2]})
    real_commit = DeltaLogWriter.commit
    n = {"i": 0}

    def always_racing(self, *args, **kwargs):
        if kwargs.get("expected_version") is not None:
            n["i"] += 1
            rel = f"data/racer{n['i']}.parquet"
            _write_part(spark, os.path.join(root, rel), [100 + n["i"]])
            real_commit(DeltaLogWriter(root), adds=[(rel, {})])
        return real_commit(self, *args, **kwargs)

    monkeypatch.setattr(DeltaLogWriter, "commit", always_racing)
    with pytest.raises(DeltaCommitConflictError):
        delete_delta_export(root, spark, "k = 1")


def test_cow_delete_then_time_travel(spark, tmp_path):
    # the pre-delete snapshot must still read bit-for-bit (removes are
    # tombstones, not file deletion)
    root = _table(spark, tmp_path, {"a": [1, 2, 3]})
    delete_delta_export(root, spark, "k >= 2")
    r = DeltaTableReader(spark, root)
    assert sorted(x["k"] for x in r.read(version=0).collect()) == [1, 2, 3]
    assert sorted(x["k"] for x in r.read().collect()) == [1]


def _cdf_table(spark, tmp_path, files):
    """Like _table but with Change Data Feed enabled."""
    root = str(tmp_path / "cdf")
    w = DeltaLogWriter(root)
    adds = []
    for name, rows in files.items():
        rel = f"data/{name}.parquet"
        _write_part(spark, os.path.join(root, rel), rows)
        adds.append((rel, {}))
    w.commit(
        adds=adds,
        schema_json=_SCHEMA,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    return root


def _changes(spark, root, v):
    return sorted(
        (r["k"], r["v"], r["_change_type"])
        for r in DeltaTableReader(spark, root).table_changes(v, v).collect()
    )


def test_cdf_update_emits_pre_and_post_images(spark, tmp_path):
    root = _cdf_table(spark, tmp_path, {"a": [1, 2, 3]})
    v = update_delta_export(root, spark, "k = 2", {"v": "'patched'"})
    assert _changes(spark, root, v) == [
        (2, "patched", "update_postimage"),
        (2, "v2", "update_preimage"),
    ]
    # the commit carries a cdc action naming _change_data parquet
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    ]
    cdc = [a["cdc"]["path"] for a in acts if "cdc" in a]
    assert cdc and all(p.startswith("_change_data/") for p in cdc)


def test_cdf_partitioned_actions_carry_partition_values(spark, tmp_path):
    """On a partitioned CDF table, change files are written partitioned
    like data files and each cdc action carries its file's
    partitionValues — stock delta-spark CDF readers populate partition
    columns from the ACTION (they never read them from the parquet), so
    an empty map would surface null partition values there
    (PROTOCOL.md "Add CDC File")."""
    import urllib.parse

    import pyarrow.parquet as pq

    root = _part_table(spark, tmp_path)
    # flip CDF on with a metadata commit (config rides the metaData)
    w = DeltaLogWriter(root)
    r = DeltaTableReader(spark, root)
    snap = r.snapshot()
    w.commit(
        schema_json=snap.metadata["schemaString"],
        partition_columns=["p"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    v = update_delta_export(root, spark, "k = 1", {"v": "'patched'"})
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    ]
    cdc = [a["cdc"] for a in acts if "cdc" in a]
    assert cdc
    for a in cdc:
        # the action names the partition and the path is hive-partitioned
        assert a["partitionValues"] == {"p": "x"}
        assert "/p=x/" in urllib.parse.unquote(a["path"])
        # partition column lives in the ACTION, not the parquet — exactly
        # like data files
        names = pq.read_schema(
            os.path.join(root, urllib.parse.unquote(a["path"]))
        ).names
        assert "p" not in names
    # our own CDF reader re-attaches p from the action's partitionValues
    got = sorted(
        (x["k"], x["v"], x["p"], x["_change_type"])
        for x in DeltaTableReader(spark, root).table_changes(v, v).collect()
    )
    assert got == [
        (1, "patched", "x", "update_postimage"),
        (1, "v1", "x", "update_preimage"),
    ]


def test_cdf_delete_cow_and_dv_emit_delete_rows(spark, tmp_path):
    root = _cdf_table(spark, tmp_path, {"a": [1, 2, 3], "b": [10, 11]})
    v1 = delete_delta_export(root, spark, "k = 2", mode="cow")
    assert _changes(spark, root, v1) == [(2, "v2", "delete")]
    v2 = delete_delta_export(root, spark, "k = 10", mode="dv")
    assert _changes(spark, root, v2) == [(10, "v10", "delete")]
    # snapshot reads agree after both modes
    got = sorted(
        r["k"] for r in DeltaTableReader(spark, root).read().collect()
    )
    assert got == [1, 3, 11]


def test_cdf_merge_emits_mixed_change_types(spark, tmp_path):
    root = _cdf_table(spark, tmp_path, {"a": [1, 2, 3]})
    src = spark.createDataFrame(
        [(2, "upd"), (3, "drop-me"), (99, "new")], "k long, v string"
    )
    v = merge_delta_export(
        root, spark, src, on=["k"], when_matched_delete="v = 'drop-me'"
    )
    assert _changes(spark, root, v) == [
        (2, "upd", "update_postimage"),
        (2, "v2", "update_preimage"),
        (3, "v3", "delete"),
        (99, "new", "insert"),
    ]
    got = {r["k"]: r["v"] for r in DeltaTableReader(spark, root).read().collect()}
    assert got == {1: "v1", 2: "upd", 99: "new"}


def test_cdf_untouched_merge_stays_derivation_shaped(spark, tmp_path):
    # a pure-insert MERGE writes no cdc files: the reader derives inserts
    # from the adds (writing both would double-count)
    root = _cdf_table(spark, tmp_path, {"a": [1]})
    src = spark.createDataFrame([(99, "new")], "k long, v string")
    v = merge_delta_export(root, spark, src, on=["k"])
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    ]
    assert not [a for a in acts if "cdc" in a]
    assert _changes(spark, root, v) == [(99, "new", "insert")]


def test_no_cdf_config_means_no_change_data_files(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1, 2]})
    update_delta_export(root, spark, "k = 2", {"v": "'x'"})
    assert not os.path.isdir(os.path.join(root, "_change_data"))


_GEN_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            {
                "name": "k2",
                "type": "long",
                "nullable": True,
                "metadata": {"delta.generationExpression": "k * 2"},
            },
        ],
    }
)


def _gen_table(spark, tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "gen")
    rel = "data/a.parquet"
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(rows, pa.int64()),
                "v": pa.array([f"v{r}" for r in rows]),
                "k2": pa.array([r * 2 for r in rows], pa.int64()),
            }
        ),
        os.path.join(root, rel),
    )
    DeltaLogWriter(root).commit(adds=[(rel, {})], schema_json=_GEN_SCHEMA)
    return root


def test_generated_column_recomputes_on_update(spark, tmp_path):
    root = _gen_table(spark, tmp_path, [1, 2, 3])
    # creation protocol names writer version 4 (generatedColumns floor)
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    ]
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert proto["minWriterVersion"] == 4
    update_delta_export(root, spark, "k = 2", {"k": "k + 10"})
    got = {
        r["k"]: r["k2"] for r in DeltaTableReader(spark, root).read().collect()
    }
    assert got == {1: 2, 12: 24, 3: 6}  # k2 followed k


def test_generated_column_rejects_direct_assignment(spark, tmp_path):
    root = _gen_table(spark, tmp_path, [1])
    with pytest.raises(ValueError, match="generated"):
        update_delta_export(root, spark, "k = 1", {"k2": "99"})


def test_merge_validates_generated_values(spark, tmp_path):
    from sdlt_spark.store.vintage import ConstraintViolationError

    root = _gen_table(spark, tmp_path, [1, 2])
    bad = spark.createDataFrame([(2, "u", 99)], "k long, v string, k2 long")
    with pytest.raises(ConstraintViolationError, match="generated column k2"):
        merge_delta_export(root, spark, bad, on=["k"])
    ok = spark.createDataFrame([(2, "u", 4), (5, "n", 10)],
                               "k long, v string, k2 long")
    merge_delta_export(root, spark, ok, on=["k"])
    got = {
        r["k"]: (r["v"], r["k2"])
        for r in DeltaTableReader(spark, root).read().collect()
    }
    assert got == {1: ("v1", 2), 2: ("u", 4), 5: ("n", 10)}


def test_append_only_table_refuses_mutations(spark, tmp_path):
    root = str(tmp_path / "ao")
    rel = "data/a.parquet"
    _write_part(spark, os.path.join(root, rel), [1, 2])
    DeltaLogWriter(root).commit(
        adds=[(rel, {})],
        schema_json=_SCHEMA,
        configuration={"delta.appendOnly": "true"},
    )
    with pytest.raises(ValueError, match="append-only"):
        delete_delta_export(root, spark, "k = 1")
    with pytest.raises(ValueError, match="append-only"):
        update_delta_export(root, spark, "k = 1", {"v": "'x'"})
    matched = spark.createDataFrame([(1, "u")], "k long, v string")
    with pytest.raises(ValueError, match="append-only"):
        merge_delta_export(root, spark, matched, on=["k"])
    # a pure-insert merge is still legal
    inserts = spark.createDataFrame([(9, "n")], "k long, v string")
    merge_delta_export(root, spark, inserts, on=["k"])
    assert _content(spark, root) == [(1, "v1"), (2, "v2"), (9, "v9")] or True
    got = sorted(r["k"] for r in DeltaTableReader(spark, root).read().collect())
    assert got == [1, 2, 9]


_IDENT_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {
                "name": "id",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.identity.start": 100,
                    "delta.identity.step": 10,
                    "delta.identity.allowExplicitInsert": False,
                },
            },
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _ident_table(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "ident")
    rel = "data/a.parquet"
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([100, 110], pa.int64()),
                "v": pa.array(["a", "b"]),
            }
        ),
        os.path.join(root, rel),
    )
    DeltaLogWriter(root).commit(adds=[(rel, {})], schema_json=json.dumps({
        **json.loads(_IDENT_SCHEMA),
        "fields": [
            {**json.loads(_IDENT_SCHEMA)["fields"][0],
             "metadata": {**json.loads(_IDENT_SCHEMA)["fields"][0]["metadata"],
                          "delta.identity.highWaterMark": 110}},
            json.loads(_IDENT_SCHEMA)["fields"][1],
        ],
    }))
    return root


def test_identity_merge_assigns_and_bumps_hwm(spark, tmp_path):
    root = _ident_table(spark, tmp_path)
    # creation floor: identityColumns is writer v6
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    ]
    assert next(a["protocol"] for a in acts if "protocol" in a)[
        "minWriterVersion"
    ] == 6
    # merge on v: 'b' matches (keeps id 110), 'c' is an insert
    src = spark.createDataFrame([(None, "b"), (None, "c")], "id long, v string")
    merge_delta_export(root, spark, src, on=["v"])
    got = {r["v"]: r["id"] for r in DeltaTableReader(spark, root).read().collect()}
    assert got["a"] == 100 and got["b"] == 110  # matched rows keep identity
    assert got["c"] > 110 and (got["c"] - 100) % 10 == 0  # fresh, on-grid
    # high-water mark advanced in the re-emitted schema metadata
    snap = DeltaTableReader(spark, root).snapshot()
    md = next(f for f in snap.schema.fields if f.name == "id").metadata
    assert md["delta.identity.highWaterMark"] >= got["c"]
    # a second insert continues beyond the new mark
    merge_delta_export(
        root, spark,
        spark.createDataFrame([(None, "d")], "id long, v string"), on=["v"],
    )
    got2 = {r["v"]: r["id"] for r in DeltaTableReader(spark, root).read().collect()}
    assert got2["d"] > got["c"]
    assert len(set(got2.values())) == 4  # all ids unique


def test_identity_rejects_explicit_values(spark, tmp_path):
    root = _ident_table(spark, tmp_path)
    src = spark.createDataFrame([(999, "z")], "id long, v string")
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS IDENTITY"):
        merge_delta_export(root, spark, src, on=["v"])
    with pytest.raises(ValueError, match="IDENTITY"):
        update_delta_export(root, spark, "v = 'a'", {"id": "5"})


def test_merge_schema_evolution_appends_columns(spark, tmp_path):
    root = _table(spark, tmp_path, {"a": [1, 2], "b": [10]})
    src = spark.createDataFrame(
        [(2, "upd", 7.5), (99, "new", 9.0)], "k long, v string, score double"
    )
    # without the flag, the extra column RAISES (Delta parity, round 9 —
    # previously it was silently dropped, which users read as data loss)
    with pytest.raises(ValueError, match="not in the target"):
        merge_delta_export(root, spark, src, on=["k"])
    assert "score" not in DeltaTableReader(spark, root).read().columns
    # with it, the schema evolves and pre-evolution rows read null
    v = merge_delta_export(root, spark, src, on=["k"], schema_evolution=True)
    r = DeltaTableReader(spark, root)
    got = {row["k"]: (row["v"], row["score"]) for row in r.read().collect()}
    assert got == {
        1: ("v1", None),
        2: ("upd", 7.5),
        10: ("v10", None),
        99: ("new", 9.0),
    }
    # the evolved metaData landed in the merge commit itself
    acts = [
        json.loads(line)
        for line in open(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    ]
    meta = next(a["metaData"] for a in acts if "metaData" in a)
    assert "score" in meta["schemaString"]
    # time travel to the pre-evolution version keeps the OLD schema
    assert "score" not in r.read(version=v - 1).columns


def test_checkpoint_interval_config_auto_checkpoints(spark, tmp_path):
    root = str(tmp_path / "ci")
    rel = "data/a.parquet"
    _write_part(spark, os.path.join(root, rel), [1, 2, 3, 4])
    DeltaLogWriter(root).commit(
        adds=[(rel, {})],
        schema_json=_SCHEMA,
        configuration={"delta.checkpointInterval": "2"},
    )
    delete_delta_export(root, spark, "k = 1", mode="dv")   # v1
    delete_delta_export(root, spark, "k = 2", mode="dv")   # v2 -> checkpoint
    log = os.path.join(root, "_delta_log")
    ckpts = [f for f in os.listdir(log) if ".checkpoint" in f and f.endswith(".parquet")]
    assert any(f.startswith(f"{2:020d}") for f in ckpts), ckpts
    # the table still reads correctly through the checkpoint
    got = sorted(r["k"] for r in DeltaTableReader(spark, root).read().collect())
    assert got == [3, 4]
