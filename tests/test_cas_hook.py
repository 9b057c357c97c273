"""Conditional-PUT commit-publisher contract (the object-store seam):
any hook satisfying put_if_absent atomicity gives the same lost-update
prevention the POSIX os.link CAS does. Simulates an S3-style store with a
dict arbiter and injects deterministic races."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sdlt_spark.store.vintage import (
    CommitConflictError,
    ObjectStoreCasPublisher,
    VintageTable,
)


class _FakeObjectStore:
    """In-memory conditional-PUT object store: put_if_absent is atomic
    (single-threaded test; the dict models S3 If-None-Match arbitration)."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.put_attempts: list[str] = []

    def put_if_absent(self, key: str, data: bytes) -> bool:
        self.put_attempts.append(key)
        if key in self.objects:
            return False
        self.objects[key] = data
        return True


def _mirror(final: str, data: bytes) -> None:
    # keep the locally-listable log in sync (tests read the table through
    # the filesystem; a real deployment would list the store itself)
    with open(final, "wb") as f:
        f.write(data)


def _publisher(store: _FakeObjectStore) -> ObjectStoreCasPublisher:
    return ObjectStoreCasPublisher(store.put_if_absent, on_success=_mirror)


def test_object_store_publisher_round_trip(spark, tmp_path):
    store = _FakeObjectStore()
    t = VintageTable(spark, str(tmp_path / "t"), commit_hook=_publisher(store))
    t.write(spark.range(10).select(F.col("id").alias("k")))
    t.delete("k >= 8")
    assert sorted(r["k"] for r in t.read().collect()) == list(range(8))
    # every commit went THROUGH the conditional put
    assert sorted(store.objects) == ["00000000.json", "00000001.json"]


def test_two_writer_race_through_conditional_put(spark, tmp_path):
    """Writer A's delete loses the version-1 PUT to writer B's append (the
    race is injected at the moment of A's publish), retries against the new
    snapshot, and both effects land — sequential-equivalent history."""
    store = _FakeObjectStore()
    path = str(tmp_path / "t")
    setup = VintageTable(spark, path, commit_hook=_publisher(store))
    setup.write(spark.range(10).select(F.col("id").alias("k")).repartition(2))

    writer_b = VintageTable(spark, path, commit_hook=_publisher(store))
    raced = {"done": False}

    def racing_put(key: str, data: bytes) -> bool:
        if not raced["done"]:
            raced["done"] = True
            # B slips in an append THROUGH ITS OWN conditional put first
            writer_b.write(
                spark.range(100, 103).select(F.col("id").alias("k")),
                mode="append",
            )
        return store.put_if_absent(key, data)

    writer_a = VintageTable(
        spark, path, commit_hook=ObjectStoreCasPublisher(racing_put, on_success=_mirror)
    )
    writer_a.delete("k < 5")

    t = VintageTable(spark, path, commit_hook=_publisher(store))
    got = sorted(r["k"] for r in t.read().collect())
    # the delete retried on the post-append snapshot: appended rows survive
    assert got == [5, 6, 7, 8, 9, 100, 101, 102]
    ops = [r["operation"] for r in t.history().collect()]
    assert ops == ["DELETE", "WRITE", "WRITE"]  # newest first
    # version 1 was attempted at least twice (the lost PUT + B's win)
    assert store.put_attempts.count("00000001.json") >= 2


def test_conditional_put_loser_exhausts_cleanly(spark, tmp_path):
    """A publisher that always loses must surface CommitConflictError after
    bounded retries and leak no data files."""
    store = _FakeObjectStore()
    path = str(tmp_path / "t")
    VintageTable(spark, path, commit_hook=_publisher(store)).write(
        spark.range(5).select(F.col("id").alias("k"))
    )

    def always_absent_put(key: str, data: bytes) -> bool:
        return False

    loser = VintageTable(
        spark, path, commit_hook=ObjectStoreCasPublisher(always_absent_put)
    )
    data_before = {
        f
        for f in os.listdir(os.path.join(path, "data"))
    }
    with pytest.raises(CommitConflictError):
        loser.delete("k = 1")
    assert {f for f in os.listdir(os.path.join(path, "data"))} == data_before
