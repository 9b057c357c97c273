"""``delta_cdc`` — a Structured Streaming SOURCE over a REAL Delta table.

``spark.readStream.format("delta")`` is the reference stack's streaming
consumption path; this provides it without delta-spark jars: stream
offsets ARE Delta versions, each micro-batch contains whole commits, and
change semantics come from the SAME resolver batch CDF uses
(:meth:`~sdlt_spark.store.delta_read.DeltaTableReader.walk_changes`), so
batch and streaming reads of one log can never drift.

Built on the PySpark 4 Python Data Source API, mirroring
``vintage_source.py``:

- ``latestOffset``/``partitions`` are driver-side metadata work — JSON
  log replay, O(new commits) per trigger, no data reads;
- each change unit (cdc file / inserted file / removed file / DV-growth
  diff) becomes one ``InputPartition``; executors read the parquet via
  pyarrow, apply roaring deletion-vector masks locally, and emit Arrow
  RecordBatches padded/cast to the stream schema;
- ``maxCommitsPerTrigger`` admission control with the same
  offset-log-authoritative down-sync the vintage source uses (restart
  behind a backlog stays capped);
- commits with no file-level derivation (un-deletes) raise, unless
  ``skipChangeCommits`` drops them — refusal over wrong rows.

Usage::

    spark.dataSource.register(DeltaChangeDataSource)
    stream = (spark.readStream.format("delta_cdc")
              .option("path", delta_table_path)
              .option("startingVersion", 0)   # default: tail new commits
              .load())

``mode=appends`` gives delta-spark's PLAIN ``readStream`` semantics
instead of CDC: micro-batches are just the appended table rows (no
bookkeeping columns); a commit that modifies existing rows FAILS the
stream unless ``skipChangeCommits`` drops it — refusal over silently
wrong rows, exactly the stock behavior.

Column-mapped tables are rejected for streaming (physical-name renames
inside the Arrow path are not wired; the batch reader supports them).
"""

from __future__ import annotations

import json
import os
import urllib.parse
from dataclasses import dataclass, field

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition
from pyspark.sql.types import LongType, StringType, StructField, StructType

from sdlt_spark.store.delta_read import DeltaProtocolError, DeltaTableReader


def _reader(path: str) -> DeltaTableReader:
    # metadata-only: log replay never touches the SparkSession
    return DeltaTableReader(None, path)  # type: ignore[arg-type]


def _parse_pval(raw: str | None, spark_type) -> object:
    """Partition value string (Delta spec serialization) -> typed python
    value an Arrow constant column can be built from."""
    if raw is None:
        return None
    s = spark_type.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return int(raw)
    if s in ("float", "double"):
        return float(raw)
    if s == "boolean":
        return raw == "true"
    if s == "string":
        return raw
    raise DeltaProtocolError(
        f"partition column type {s} is not supported by the delta_cdc "
        "streaming source"
    )


def _stream_schema(path: str, mode: str = "cdc") -> StructType:
    snap = _reader(path).snapshot()
    if snap.mapping:
        raise DeltaProtocolError(
            "delta_cdc streaming does not support column-mapped tables"
        )
    base = [StructField(f.name, f.dataType, True) for f in snap.schema.fields]
    if mode == "appends":
        # plain delta-spark readStream shape: just the table's rows
        return StructType(base)
    return StructType(
        base
        + [
            StructField("_change_type", StringType(), True),
            StructField("_commit_version", LongType(), True),
        ]
    )


@dataclass
class _DeltaChangePartition(InputPartition):
    abs_path: str
    # 'insert' / 'delete' for file-level units; None for cdc files (they
    # carry their own _change_type column)
    tag: str | None
    version: int
    # typed partition-column constants to attach: {col: value}
    pvals: dict = field(default_factory=dict)
    # roaring DV descriptors (JSON): rows to DROP (prior DV of a removed
    # file) or the keep-diff pair for DV growth
    drop_dv: str | None = None
    keep_new_dv: str | None = None
    keep_old_dv: str | None = None
    table_root: str | None = None


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        options = {k.lower(): v for k, v in options.items()}
        self._path = options.get("path")
        if not self._path:
            raise ValueError("delta_cdc requires .option('path', <table dir>)")
        self._skip_change_commits = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        self._mode = str(options.get("mode", "cdc")).lower()
        if self._mode not in ("cdc", "appends"):
            raise ValueError(f"mode={self._mode!r}; expected 'cdc' or 'appends'")
        self._schema = schema
        start = options.get("startingversion")
        start_ts = options.get("startingtimestamp")
        if start is not None and start_ts is not None:
            raise ValueError(
                "pass startingVersion OR startingTimestamp, not both"
            )
        if start_ts is not None:
            # delta-spark's startingTimestamp: first commit AT OR AFTER the
            # timestamp streams; _resolve_timestamp returns the last commit
            # at-or-before, so start one past it — unless the timestamp
            # precedes the whole log, where version 0 streams (delta-spark
            # raises only for FUTURE timestamps; we mirror the lenient
            # at-or-after rule and let an empty tail mean 'nothing yet')
            import datetime as _dt

            try:
                ts = float(start_ts)
            except ValueError:
                ts = _dt.datetime.fromisoformat(str(start_ts)).timestamp()
            r = _reader(self._path)
            try:
                v = r._resolve_timestamp(ts)
                # at-or-AFTER is inclusive: when the resolved commit's
                # timestamp equals the requested one exactly, that commit
                # itself streams (delta-spark semantics) — back _initial
                # off past EVERY commit sharing the timestamp (coarse
                # mtime granularity can stamp several commits identically;
                # each is at-or-after and must stream)
                try:
                    while v >= 0 and r._commit_timestamp(v) == ts:
                        v -= 1
                except OSError:
                    pass  # checkpoint-cleaned commit: mtime rule stands
                self._initial = v
            except ValueError:
                self._initial = -1  # before the first commit: stream all
        elif start is not None:
            self._initial = int(start) - 1
        else:
            self._initial = _reader(self._path).latest_version()
        mcpt = options.get("maxcommitspertrigger")
        self._max_commits = int(mcpt) if mcpt is not None else None
        if self._max_commits is not None and self._max_commits < 1:
            raise ValueError("maxCommitsPerTrigger must be >= 1")
        self._last_end = self._initial

    # ------------------------------------------------------- driver: offsets

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        latest = _reader(self._path).latest_version()
        if self._max_commits is None:
            self._last_end = latest
            return {"version": latest}
        end = min(latest, self._last_end + self._max_commits)
        self._last_end = max(self._last_end, end)
        return {"version": end}

    def partitions(self, start: dict, end: dict):
        if self._max_commits is not None:
            # offset log is authoritative; may down-sync on restart (see
            # vintage_source.py — same discipline, verified call order)
            self._last_end = max(start["version"], end["version"])
        if end["version"] <= start["version"]:
            return []
        r = _reader(self._path)
        snap = r.snapshot(version=end["version"])
        part_types = {
            f.name: f.dataType
            for f in snap.schema.fields
            if f.name in snap.partition_columns
        }
        root = os.path.abspath(self._path)
        parts: list[_DeltaChangePartition] = []
        for v, cdc_paths, inserts, deletes, dv_grown in r.walk_changes(
            start["version"] + 1,
            end["version"],
            skip_underivable=self._skip_change_commits,
        ):
            def _typed(pvals: dict) -> dict:
                return {
                    col: _parse_pval(pvals.get(col), t)
                    for col, t in part_types.items()
                }

            if self._mode == "appends":
                # delta-spark's plain readStream contract: appends flow as
                # table rows; a data-modifying commit FAILS unless
                # skipChangeCommits drops it. walk_changes already drops
                # most such commits when the option is set, but a cdc
                # commit can still surface a modification here (e.g. a
                # DV-bearing add) — with the option set, the commit must
                # SKIP, never raise advice to set the option already set.
                modification = None
                if deletes or dv_grown:
                    modification = (
                        f"commit {v} modifies existing rows; mode=appends "
                        "streams only appends — set skipChangeCommits to "
                        "drop data-modifying commits"
                    )
                elif cdc_paths:
                    # the appended ROWS live in the commit's add files (cdc
                    # files are the CDC readers' view); a cdc commit that
                    # also removed files — or added a DV-masked file — is
                    # a modification
                    actions = r._commit_actions(v)
                    if any(
                        a["remove"].get("dataChange", True)
                        for a in actions
                        if "remove" in a
                    ):
                        modification = (
                            f"commit {v} modifies existing rows; "
                            "mode=appends streams only appends — set "
                            "skipChangeCommits"
                        )
                    elif any(
                        a["add"].get("deletionVector")
                        for a in actions
                        if "add" in a
                    ):
                        modification = (
                            f"commit {v} adds a deletion-vector-bearing "
                            "file; mode=appends cannot derive its rows — "
                            "set skipChangeCommits"
                        )
                    else:
                        inserts = [
                            (
                                urllib.parse.unquote(a["add"]["path"]),
                                a["add"].get("partitionValues") or {},
                            )
                            for a in actions
                            if "add" in a and a["add"].get("dataChange", True)
                        ]
                        cdc_paths = []
                if modification is not None:
                    if self._skip_change_commits:
                        continue
                    raise DeltaProtocolError(modification)

            for rel, pvals in cdc_paths:
                parts.append(
                    _DeltaChangePartition(
                        os.path.join(root, rel), None, v, _typed(pvals),
                        table_root=root,
                    )
                )
            if cdc_paths:
                continue

            for rel, pvals in inserts:
                parts.append(
                    _DeltaChangePartition(
                        os.path.join(root, rel), "insert", v, _typed(pvals),
                        table_root=root,
                    )
                )
            for rel, prior_dv, pvals in deletes:
                parts.append(
                    _DeltaChangePartition(
                        os.path.join(root, rel), "delete", v, _typed(pvals),
                        drop_dv=json.dumps(prior_dv) if prior_dv else None,
                        table_root=root,
                    )
                )
            for rel, new_dv, old_dv, pvals in dv_grown:
                parts.append(
                    _DeltaChangePartition(
                        os.path.join(root, rel), "delete", v, _typed(pvals),
                        keep_new_dv=json.dumps(new_dv),
                        keep_old_dv=json.dumps(old_dv) if old_dv else None,
                        table_root=root,
                    )
                )
        return parts

    def commit(self, end: dict) -> None:  # offsets live in the stream checkpoint
        pass

    # ----------------------------------------------------- executor: reading

    def read(self, partition: _DeltaChangePartition):
        """Executor-side: one parquet file -> Arrow RecordBatches with the
        deletion-vector row mask applied locally (roaring decode where the
        data lives) and columns cast/padded to the stream schema."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from sdlt_spark.store.delta_dv import dv_positions

        tbl = pq.read_table(partition.abs_path)
        n_total = tbl.num_rows
        mask = None
        if partition.drop_dv:
            drop = dv_positions(json.loads(partition.drop_dv), partition.table_root)
            mask = np.ones(n_total, dtype=bool)
            mask[np.asarray(drop, dtype=np.int64)] = False
        elif partition.keep_new_dv:
            new = set(
                dv_positions(json.loads(partition.keep_new_dv), partition.table_root)
            )
            old = (
                set(dv_positions(json.loads(partition.keep_old_dv), partition.table_root))
                if partition.keep_old_dv
                else set()
            )
            keep = sorted(new - old)
            mask = np.zeros(n_total, dtype=bool)
            mask[np.asarray(keep, dtype=np.int64)] = True
        if mask is not None:
            tbl = tbl.filter(pa.array(mask))
        from sdlt_spark.store.batch_source import pad_table_to_schema

        overrides: dict = {"_commit_version": partition.version}
        if partition.tag is not None:
            overrides["_change_type"] = partition.tag
        yield from pad_table_to_schema(
            tbl, self._schema, overrides=overrides, fallbacks=partition.pvals
        ).to_batches()


class DeltaChangeDataSource(DataSource):
    """Register with ``spark.dataSource.register(DeltaChangeDataSource)``,
    then ``spark.readStream.format("delta_cdc")``."""

    @classmethod
    def name(cls) -> str:
        return "delta_cdc"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("delta_cdc requires .option('path', <table dir>)")
        return _stream_schema(
            path, str(self.options.get("mode", "cdc")).lower()
        )

    def streamReader(self, schema: StructType) -> DeltaStreamReader:
        return DeltaStreamReader(schema, dict(self.options))
