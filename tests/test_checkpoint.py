"""Commit-log checkpointing: snapshot reconstruction must replay only
commits after the newest checkpoint (Delta's ``_last_checkpoint`` role —
O(commits-since-checkpoint) driver work, not O(all versions)), while every
read — head, version travel, timestamp travel, schema — stays exact."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sdlt_spark.store import VintageTable
from sdlt_spark.store.vintage import _CHECKPOINT_EVERY


def _fresh(spark, tmp_path, n_commits: int) -> VintageTable:
    """v0 = write of rows 0..9; each later version v merges a new row 10*v."""
    t = VintageTable(spark, str(tmp_path / "t"))
    base = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    t.write(base)
    for i in range(1, n_commits):
        src = spark.createDataFrame([(10 * i, float(i))], "k LONG, v DOUBLE")
        t.merge(src, ["k"])
    return t


def test_auto_checkpoint_written_and_reads_exact(spark, tmp_path):
    n = _CHECKPOINT_EVERY + 3
    t = _fresh(spark, tmp_path, n)
    assert t._checkpoint_versions() == [_CHECKPOINT_EVERY]
    # head read includes every merged key
    keys = {r["k"] for r in t.read().select("k").collect()}
    assert keys == set(range(10)) | {10 * i for i in range(1, n)}
    # the head replay starts from the checkpoint, not commit 0
    ckpt = t._load_checkpoint()
    assert ckpt["version"] == _CHECKPOINT_EVERY
    assert set(t._live_files()) >= set()  # smoke: no exception path


def test_time_travel_before_checkpoint_still_exact(spark, tmp_path):
    t = _fresh(spark, tmp_path, _CHECKPOINT_EVERY + 2)
    # version 3 predates the checkpoint: replay must fall back to commit 0
    keys_v3 = {r["k"] for r in t.read(version=3).select("k").collect()}
    assert keys_v3 == set(range(10)) | {10, 20, 30}
    # version exactly at the checkpoint
    keys_at = {r["k"] for r in t.read(version=_CHECKPOINT_EVERY).select("k").collect()}
    assert keys_at == set(range(10)) | {10 * i for i in range(1, _CHECKPOINT_EVERY + 1)}


def test_manual_checkpoint_then_more_commits(spark, tmp_path):
    t = _fresh(spark, tmp_path, 4)
    v = t.checkpoint()
    assert v == 3
    src = spark.createDataFrame([(999, 9.9)], "k LONG, v DOUBLE")
    t.merge(src, ["k"])
    keys = {r["k"] for r in t.read().select("k").collect()}
    assert 999 in keys and keys >= set(range(10))
    # schema resolution through the checkpoint path
    assert {f.name for f in t._schema_at().fields} == {"k", "v"}


def test_timestamp_travel_across_checkpoint(spark, tmp_path):
    t = _fresh(spark, tmp_path, _CHECKPOINT_EVERY + 2)
    commits = t._commits()
    # travel to the instant of version 2 (pre-checkpoint) by timestamp
    ts = commits[2].timestamp
    keys = {r["k"] for r in t.read(timestamp=ts).select("k").collect()}
    assert keys == set(range(10)) | {10, 20}


def test_checkpoint_survives_vacuum(spark, tmp_path):
    t = _fresh(spark, tmp_path, _CHECKPOINT_EVERY + 2)
    t.vacuum(retention_hours=0.0)
    keys = {r["k"] for r in t.read().select("k").collect()}
    assert keys == set(range(10)) | {10 * i for i in range(1, _CHECKPOINT_EVERY + 2)}


def test_checkpoint_file_is_json_beside_log(spark, tmp_path):
    t = _fresh(spark, tmp_path, _CHECKPOINT_EVERY + 1)
    path = os.path.join(
        t.path, "_vintage_log", f"{_CHECKPOINT_EVERY:08d}.checkpoint.json"
    )
    assert os.path.exists(path)
    # commit parser must not mistake it for a commit entry
    assert [c.version for c in t._commits()] == list(range(_CHECKPOINT_EVERY + 1))
