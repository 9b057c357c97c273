"""``vintage_cdc`` — a Structured Streaming SOURCE over a VintageTable.

Tails the commit log as micro-batches (Delta's ``readStream`` on a CDF
table, SURVEY.md §2.10): stream offsets ARE table versions, so restarts
resume exactly where the checkpointed offset left off, and each micro-batch
contains whole commits — never a torn view of one.

Built on the PySpark 4 Python Data Source API (``DataSourceStreamReader``,
the documented extension point for custom streaming sources):

- ``latestOffset``/``partitions`` run driver-side and touch ONLY commit
  metadata (the JSON log) — O(new commits) work per trigger, no data reads;
- each changed file becomes one ``InputPartition``; executors read the
  parquet via pyarrow and emit Arrow RecordBatches (the API's zero-copy
  path), padded/cast to the stream schema so schema-evolved tables stream
  old and new files uniformly;
- change semantics per commit mirror ``VintageTable.table_changes``:
  materialized ``_change_data`` for row-level ops, add=insert /
  remove=delete for file-level ops, nothing for dataChange=false
  (compaction never wakes a downstream consumer).

Usage::

    spark.dataSource.register(VintageChangeDataSource)
    stream = (spark.readStream.format("vintage_cdc")
              .option("path", table_path)
              .option("startingVersion", 0)   # default: tail new commits
              .load())

Reference parity: the reference's Delta tutorial is batch-only; streaming
CDC is the Delta feature (readStream.format("delta") + change feed) a
production user of README.md:92-319's table would reach for next.

Retention interplay (same contract as Delta): a lagging stream holds
version offsets, not file locks — vacuum()/overwrite with a retention
window shorter than the stream's lag can delete files an unprocessed
commit still references, failing that micro-batch. Keep retention_hours
above the maximum expected stream downtime.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sdlt_spark.store.vintage import VintageTable


def _table(path: str) -> VintageTable:
    # metadata-only access: log replay and schema resolution never touch the
    # SparkSession, so a session-less VintageTable works on the driver's
    # DataSource code path
    return VintageTable(None, path)  # type: ignore[arg-type]


def _stream_schema(path: str) -> StructType:
    base = _table(path)._schema_at()
    # every column nullable: pre-evolution commits pad newer columns with
    # NULL, whatever nullability the writer recorded (a non-nullable
    # evolved field would NPE Spark's Arrow conversion on padded rows)
    return StructType(
        [StructField(f.name, f.dataType, True) for f in base.fields]
        + [
            StructField("_change_type", StringType(), True),
            StructField("_commit_version", LongType(), True),
        ]
    )


@dataclass
class _ChangeFilePartition(InputPartition):
    abs_path: str
    # 'insert' / 'delete' for file-level commits; None when the file is
    # materialized change data carrying its own _change_type column
    tag: str | None
    version: int
    # deletion-vector sidecars to apply to this file's rows (absolute
    # paths); rows whose position a DV names are filtered out, so e.g. an
    # overwrite of a DV-bearing table never re-emits already-deleted rows
    dv_paths: tuple[str, ...] = ()
    # canonical absolute path used to match DV 'file' refs (refs are
    # table-relative, or absolute for clone-translated sidecars)
    table_root: str | None = None


class VintageStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        # the Python DataSource API normalizes option keys to lowercase
        options = {k.lower(): v for k, v in options.items()}
        self._path = options.get("path")
        if not self._path:
            raise ValueError("vintage_cdc requires .option('path', <table dir>)")
        self._skip_change_commits = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        self._schema = schema
        start = options.get("startingversion")
        # default: consume only commits AFTER stream start (tail); an
        # explicit startingVersion replays history from there (0 = initial
        # snapshot as inserts, like Delta's startingVersion)
        self._initial = (
            int(start) - 1 if start is not None else _table(self._path).latest_version()
        )
        # admission control (Delta's maxFilesPerTrigger, per commit here):
        # bound each micro-batch to N commits so a stream resuming behind a
        # long backlog processes it as N-commit batches instead of one
        # giant catch-up batch (bounded executor memory / checkpoint cost)
        mcpt = options.get("maxcommitspertrigger")
        self._max_commits = int(mcpt) if mcpt is not None else None
        if self._max_commits is not None and self._max_commits < 1:
            raise ValueError("maxCommitsPerTrigger must be >= 1")
        self._last_end = self._initial

    # ------------------------------------------------------- driver: offsets

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        latest = _table(self._path).latest_version()
        if self._max_commits is None:
            self._last_end = latest
            return {"version": latest}
        # Rate-limited: advance at most max_commits past the stream's
        # position. The position is construction state (`_initial`) only
        # for a FRESH query's first trigger; on a restart Spark replays the
        # last offset-log batch — partitions(ckptStart, ckptEnd) — BEFORE
        # the first latestOffset (verified empirically against this Spark
        # build: fresh order is latestOffset -> initialOffset ->
        # partitions; restart order is partitions -> latestOffset), so
        # _last_end is synced to the true checkpointed position before any
        # capping decision. Correctness never depends on this counter —
        # partitions(start, end) always gets the true checkpointed start;
        # the cap only bounds how far each batch's END advances.
        end = min(latest, self._last_end + self._max_commits)
        self._last_end = max(self._last_end, end)
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        from sdlt_spark.store.vintage import resolve_commit_changes

        if self._max_commits is not None:
            # sync the admission-control counter to the batch Spark is
            # actually running — Spark's offset log is authoritative, so
            # this may move the counter DOWN (restart behind a backlog:
            # the construction-time seed is the table head, the replayed
            # batch reveals the true, older position — without the
            # down-sync the first post-restart latestOffset would cap
            # relative to the head and hand Spark the whole backlog as
            # one unbounded batch). max(start, end) only guards against a
            # pathological backwards range within one batch.
            self._last_end = max(start["version"], end["version"])
        t = _table(self._path)
        # parse only the commits in (start, end] — a long-lived table has
        # O(history) log entries and this runs every micro-batch. Change
        # semantics come from the SAME resolver table_changes uses, so
        # batch and streaming CDC can never drift.
        commits = {
            c.version: c
            for c in t._commits(after=start["version"], up_to=end["version"])
        }
        parts: list[_ChangeFilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            c = commits.get(v)
            if c is None:
                continue
            resolved = resolve_commit_changes(c, self._skip_change_commits, table=t)
            if resolved is None:
                continue
            kind, payload = resolved[0], resolved[1]
            if kind == "dir":
                abs_dir = os.path.join(self._path, payload)
                parts += [
                    _ChangeFilePartition(os.path.join(abs_dir, f), None, v)
                    for f in sorted(os.listdir(abs_dir))
                    if f.endswith(".parquet")
                ]
            else:
                dv_ctx = resolved[2]
                root = os.path.abspath(self._path)
                parts += [
                    _ChangeFilePartition(
                        os.path.normpath(os.path.join(self._path, rel)),
                        tag,
                        v,
                        tuple(
                            os.path.normpath(os.path.join(self._path, d))
                            for d in dv_ctx[tag]
                        ),
                        root,
                    )
                    for rel, tag in payload
                ]
        return parts

    def commit(self, end: dict) -> None:  # offsets live in the stream checkpoint
        pass

    # ----------------------------------------------------- executor: reading

    def read(self, partition: _ChangeFilePartition):
        """Runs on executors: one parquet file -> Arrow RecordBatches cast/
        padded to the stream schema (pre-evolution files lack new columns;
        change-data files carry _change_type, file-level ones get the
        partition's constant tag)."""
        import pyarrow.parquet as pq

        from sdlt_spark.store.batch_source import (
            apply_dv_mask,
            pad_table_to_schema,
        )

        tbl = pq.read_table(partition.abs_path)
        # drop rows whose (file, pos) a deletion-vector sidecar names
        tbl = apply_dv_mask(
            tbl, partition.abs_path, partition.dv_paths, partition.table_root
        )
        overrides: dict = {"_commit_version": partition.version}
        if partition.tag is not None:
            overrides["_change_type"] = partition.tag
        yield from pad_table_to_schema(
            tbl, self._schema, overrides=overrides
        ).to_batches()


class VintageChangeDataSource(DataSource):
    """Register with ``spark.dataSource.register(VintageChangeDataSource)``,
    then ``spark.readStream.format("vintage_cdc")``."""

    @classmethod
    def name(cls) -> str:
        return "vintage_cdc"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("vintage_cdc requires .option('path', <table dir>)")
        return _stream_schema(path)

    def streamReader(self, schema: StructType) -> VintageStreamReader:
        return VintageStreamReader(schema, dict(self.options))
