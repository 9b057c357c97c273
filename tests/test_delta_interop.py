"""Delta Lake interop: DeltaTableReader replays a real ``_delta_log``
(hand-built, byte-level fixtures) and export_vintage_to_delta publishes a
VintageTable snapshot Delta readers can open. Reference parity: the
reference choreography's tables ARE Delta tables
(/root/reference/README.md:92,169)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from sdlt_spark.store.delta_read import DeltaProtocolError, DeltaTableReader
from sdlt_spark.store.delta_write import DeltaLogWriter, export_vintage_to_delta
from sdlt_spark.store.vintage import VintageTable


def _write_part(path: str, ids: list[int]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array(ids, pa.int64()),
                  "v": pa.array([f"v{i}" for i in ids], pa.string())}),
        path,
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


def test_replay_add_remove_and_version_travel(spark, tmp_path):
    root = str(tmp_path / "dt")
    _write_part(f"{root}/a.parquet", [1, 2, 3])
    _write_part(f"{root}/b.parquet", [1, 2])
    _write_part(f"{root}/c.parquet", [3, 4])
    w = DeltaLogWriter(root)
    w.commit(adds=[("a.parquet", {})], schema_json=_SCHEMA)
    # v1 compacts a into b+c: replay must honor the remove or k duplicates
    w.commit(adds=[("b.parquet", {}), ("c.parquet", {})], removes=["a.parquet"])
    r = DeltaTableReader(spark, root)
    assert sorted(x["k"] for x in r.read().collect()) == [1, 2, 3, 4]
    assert sorted(x["k"] for x in r.read(version=0).collect()) == [1, 2, 3]
    assert r.latest_version() == 1


def test_timestamp_as_of_uses_commit_mtime(spark, tmp_path):
    root = str(tmp_path / "dt")
    _write_part(f"{root}/a.parquet", [1])
    _write_part(f"{root}/b.parquet", [2])
    w = DeltaLogWriter(root)
    w.commit(adds=[("a.parquet", {})], schema_json=_SCHEMA)
    w.commit(adds=[("b.parquet", {})])
    log = os.path.join(root, "_delta_log")
    os.utime(os.path.join(log, f"{0:020d}.json"), (1_000_000, 1_000_000))
    os.utime(os.path.join(log, f"{1:020d}.json"), (2_000_000, 2_000_000))
    r = DeltaTableReader(spark, root)
    assert sorted(x["k"] for x in r.read(timestamp=1_500_000).collect()) == [1]
    assert sorted(x["k"] for x in r.read(timestamp=2_500_000).collect()) == [1, 2]
    with pytest.raises(ValueError, match="no Delta commit"):
        r.read(timestamp=500_000)


def test_partition_values_reattached_typed(spark, tmp_path):
    """Partition columns live ONLY in the log's partitionValues (the data
    files don't carry them) and must come back with the schema's type."""
    root = str(tmp_path / "dt")
    _write_part(f"{root}/r=0/a.parquet", [1, 2])
    _write_part(f"{root}/r=1/b.parquet", [3])
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "r", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    w = DeltaLogWriter(root)
    w.commit(
        adds=[("r=0/a.parquet", {"r": "0"}), ("r=1/b.parquet", {"r": "1"})],
        schema_json=schema,
        partition_columns=["r"],
    )
    df = DeltaTableReader(spark, root).read()
    assert df.schema["r"].dataType.simpleString() == "int"
    got = sorted((x["k"], x["r"]) for x in df.collect())
    assert got == [(1, 0), (2, 0), (3, 1)]


def test_url_encoded_paths_round_trip(spark, tmp_path):
    root = str(tmp_path / "dt")
    rel = "part with space#1.parquet"
    _write_part(os.path.join(root, rel), [7])
    w = DeltaLogWriter(root)
    v = w.commit(adds=[(rel, {})], schema_json=_SCHEMA)
    assert v == 0
    # the log entry itself must be URL-encoded (byte-level Delta contract)
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as f:
        raw = f.read()
    assert "part%20with%20space%231.parquet" in raw
    assert [x["k"] for x in DeltaTableReader(spark, root).read().collect()] == [7]


def test_checkpoint_replay_skips_earlier_json(spark, tmp_path):
    """A parquet checkpoint is the replay base: JSON commits at or before
    it may be gone (Delta log cleanup) and the read must still work."""
    root = str(tmp_path / "dt")
    _write_part(f"{root}/a.parquet", [1])
    _write_part(f"{root}/b.parquet", [2])
    w = DeltaLogWriter(root)
    w.commit(adds=[("a.parquet", {})], schema_json=_SCHEMA)  # v0
    log = os.path.join(root, "_delta_log")
    # hand-build the v0 checkpoint (row-per-action, struct columns, the
    # PROTOCOL.md checkpoint schema with partitionValues as a map)
    proto = pa.array(
        [{"minReaderVersion": 1, "minWriterVersion": 2}, None, None],
        pa.struct([("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]),
    )
    meta = pa.array(
        [
            None,
            {
                "id": "fixture",
                "schemaString": _SCHEMA,
                "partitionColumns": [],
                "configuration": [],
            },
            None,
        ],
        pa.struct(
            [
                ("id", pa.string()),
                ("schemaString", pa.string()),
                ("partitionColumns", pa.list_(pa.string())),
                ("configuration", pa.map_(pa.string(), pa.string())),
            ]
        ),
    )
    add = pa.array(
        [None, None, {"path": "a.parquet", "partitionValues": [], "size": 1,
                      "modificationTime": 0, "dataChange": True}],
        pa.struct(
            [
                ("path", pa.string()),
                ("partitionValues", pa.map_(pa.string(), pa.string())),
                ("size", pa.int64()),
                ("modificationTime", pa.int64()),
                ("dataChange", pa.bool_()),
            ]
        ),
    )
    pq.write_table(
        pa.table({"protocol": proto, "metaData": meta, "add": add}),
        os.path.join(log, f"{0:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 0, "size": 3}, f)
    w.commit(adds=[("b.parquet", {})])  # v1 json
    os.remove(os.path.join(log, f"{0:020d}.json"))  # log cleanup happened
    r = DeltaTableReader(spark, root)
    assert sorted(x["k"] for x in r.read().collect()) == [1, 2]


def test_deletion_vector_tables_rejected(spark, tmp_path):
    root = str(tmp_path / "dt")
    _write_part(f"{root}/a.parquet", [1])
    w = DeltaLogWriter(root)
    w.commit(adds=[("a.parquet", {})], schema_json=_SCHEMA)
    # append a DV-bearing add the way real Delta would
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "a.parquet",
                        "partitionValues": {},
                        "size": 1,
                        "modificationTime": 0,
                        "dataChange": True,
                        "deletionVector": {
                            "storageType": "u", "pathOrInlineDv": "x",
                            "offset": 1, "sizeInBytes": 40, "cardinality": 2,
                        },
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError, match="deletion vector"):
        DeltaTableReader(spark, root).read()


def test_column_mapping_and_reader_features_rejected(spark, tmp_path):
    root = str(tmp_path / "dt")
    os.makedirs(os.path.join(root, "_delta_log"))
    meta = {
        "metaData": {
            "id": "x",
            "schemaString": _SCHEMA,
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name"},
        }
    }
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}) + "\n")
        f.write(json.dumps(meta) + "\n")
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        DeltaTableReader(spark, root).read()

    root2 = str(tmp_path / "dt2")
    os.makedirs(os.path.join(root2, "_delta_log"))
    with open(os.path.join(root2, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors"],
                        "writerFeatures": ["deletionVectors"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        DeltaTableReader(spark, root2).read()


def test_read_where_skips_files_via_add_stats(spark, tmp_path):
    """Add-action stats (the zone maps real Delta writers record) drive
    file skipping in read_where: a narrow range must list only the
    overlapping file, and files lacking stats are always kept."""
    root = str(tmp_path / "dt")
    _write_part(f"{root}/lo.parquet", [1, 2, 3])
    _write_part(f"{root}/hi.parquet", [100, 101])
    _write_part(f"{root}/nostats.parquet", [7])
    w = DeltaLogWriter(root)
    w.commit(adds=[("lo.parquet", {}), ("hi.parquet", {})], schema_json=_SCHEMA)
    w.commit(adds=[("nostats.parquet", {})], collect_stats=False)
    # the emitted stats are spec-shaped
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as f:
        adds = [json.loads(l)["add"] for l in f if '"add"' in l]
    st = json.loads(adds[0]["stats"])
    assert st["numRecords"] == 3 and st["minValues"]["k"] == 1 and st["maxValues"]["k"] == 3
    r = DeltaTableReader(spark, root)
    df = r.read_where("k", 100, 200)
    scanned = {os.path.basename(p) for p in df.inputFiles()}
    # hi overlaps; nostats has no zone so must be read; lo is skipped
    assert scanned == {"hi.parquet", "nostats.parquet"}
    assert sorted(x["k"] for x in df.collect()) == [100, 101]


def test_read_where_prunes_partition_values(spark, tmp_path):
    root = str(tmp_path / "dt")
    _write_part(f"{root}/r=0/a.parquet", [1])
    _write_part(f"{root}/r=1/b.parquet", [2])
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "r", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    w = DeltaLogWriter(root)
    w.commit(
        adds=[("r=0/a.parquet", {"r": "0"}), ("r=1/b.parquet", {"r": "1"})],
        schema_json=schema,
        partition_columns=["r"],
    )
    df = DeltaTableReader(spark, root).read_where("r", 1, 1)
    assert {os.path.basename(p) for p in df.inputFiles()} == {"b.parquet"}
    assert [x["k"] for x in df.collect()] == [2]


def test_export_vintage_to_delta_round_trip(spark, tmp_path):
    t = VintageTable(spark, str(tmp_path / "vt"))
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    )
    t.write(df.repartition(3))
    t.delete("grp = 2", mode="dv")  # exporter must fold DVs first
    export_vintage_to_delta(t, str(tmp_path / "delta_out"))
    r = DeltaTableReader(spark, str(tmp_path / "delta_out"))
    got = sorted(x["k"] for x in r.read().collect())
    want = sorted(x["k"] for x in t.read().collect())
    assert got == want and len(got) == 40
    # spot-check the emitted log is spec-shaped JSON-lines
    with open(os.path.join(str(tmp_path / "delta_out"), "_delta_log", f"{0:020d}.json")) as f:
        kinds = [next(iter(json.loads(line))) for line in f if line.strip()]
    assert kinds[0] == "protocol" and "metaData" in kinds and "add" in kinds
