"""Table CHECK constraints on VintageTable (Delta's ALTER TABLE ADD
CONSTRAINT): add-time validation of existing rows, in-flight enforcement on
every subsequent write/merge/update (no extra scan — the check runs inside
the write job), SQL-standard NULL-passes semantics, and log-replay
durability across checkpoints."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdlt_spark.store import VintageTable
from sdlt_spark.store.vintage import ConstraintViolationError


def _base(spark, path, rows=20):
    df = spark.range(rows).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    t = VintageTable(spark, path)
    t.write(df.repartition(2))
    return t


def test_add_list_drop(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    t.add_constraint("v_nonneg", "v >= 0")
    assert t.constraints() == {"v_nonneg": "v >= 0"}
    t.drop_constraint("v_nonneg")
    assert t.constraints() == {}
    with pytest.raises(KeyError):
        t.drop_constraint("v_nonneg")


def test_add_rejects_existing_violations(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    with pytest.raises(ConstraintViolationError, match="existing row"):
        t.add_constraint("v_small", "v < 5")
    assert t.constraints() == {}


def test_append_enforced_and_aborts_cleanly(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    t.add_constraint("v_nonneg", "v >= 0")
    v_before = t.latest_version()
    bad = spark.range(3).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    )
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.write(bad, mode="append")
    # aborted: no new version, no phantom rows
    assert t.latest_version() == v_before
    assert t.read().count() == 20
    # a conforming append still lands
    good = spark.range(100, 103).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v")
    )
    t.write(good, mode="append")
    assert t.read().count() == 23


def test_merge_and_update_enforced(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    t.add_constraint("v_nonneg", "v >= 0")
    src = spark.range(5).select(F.col("id").alias("k"), F.lit(-3.0).alias("v"))
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.merge(src, ["k"])
    assert t.read().filter(F.col("v") < 0).count() == 0
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.update("k = 3", {"v": F.lit(-9.0)})
    assert t.read().filter(F.col("v") < 0).count() == 0
    # valid mutation passes
    t.update("k = 3", {"v": F.lit(99.0)})
    assert t.read().filter(F.col("v") == 99.0).count() == 1


def test_null_passes_sql_standard(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    t.add_constraint("v_nonneg", "v >= 0")
    nulls = spark.range(3).select(
        F.col("id").alias("k"), F.lit(None).cast("double").alias("v")
    )
    t.write(nulls, mode="append")  # UNKNOWN is not a violation
    assert t.read().filter(F.col("v").isNull()).count() == 3


def test_survives_checkpoint_and_dropped_stays_dropped(spark, tmp_path):
    t = _base(spark, str(tmp_path / "t"))
    t.add_constraint("v_cap", "v <= 1000")
    for i in range(12):  # cross a checkpoint boundary
        t.write(
            spark.range(200 + i, 201 + i).select(
                F.col("id").alias("k"), F.lit(1.0).alias("v")
            ),
            mode="append",
        )
    t.checkpoint()
    assert t.constraints() == {"v_cap": "v <= 1000"}
    with pytest.raises(ConstraintViolationError):
        t.write(
            spark.range(1).select(F.col("id").alias("k"), F.lit(2000.0).alias("v")),
            mode="append",
        )
    t.drop_constraint("v_cap")
    t.write(
        spark.range(1).select(F.col("id").alias("k"), F.lit(2000.0).alias("v")),
        mode="append",
    )
    assert t.read().filter(F.col("v") == 2000.0).count() == 1


def test_schema_dropping_constrained_column_fails_clearly(spark, tmp_path):
    """Overwriting with a schema that no longer carries a constrained
    column must fail with a constraint error naming the constraint, not a
    raw analysis error from deep inside the write job (Delta equivalently
    blocks dropping/renaming constrained columns)."""
    t = _base(spark, str(tmp_path / "t"))
    t.add_constraint("v_nonneg", "v >= 0")
    no_v = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ConstraintViolationError, match="v_nonneg"):
        t.write(no_v, mode="overwrite")
    # table unchanged
    assert t.read().count() == 20
