"""Read-only Delta Lake table interop: replay a real ``_delta_log`` and
read the snapshot as a plain DataFrame — no delta-spark jars needed.

The reference's on-disk contract is a Delta table (its choreography writes
``format("delta")``, /root/reference/README.md:92,169 and time-travels it
with ``versionAsOf``/``timestampAsOf``, README.md:166-169). ``VintageTable``
is this repo's write-path substitute; this module closes the read-side
fidelity gap: a user can point ``DeltaTableReader`` at a directory written
by real Delta and scan/time-travel it.

Scope (documented, checked, honest):

- JSON commit replay (``add``/``remove``/``metaData``/``protocol``), the
  Delta PROTOCOL.md state machine: snapshot(v) = adds minus removes of
  commits 0..v, last metaData wins.
- Parquet checkpoints via ``_last_checkpoint`` (replay is then
  O(commits since checkpoint), Delta's own scaling mechanism).
- ``versionAsOf`` / ``timestampAsOf`` time travel (timestamp resolution by
  commit-file modification time, exactly delta-spark's fallback when no
  in-commit timestamps exist).
- Partitioned tables: partition values live in the log, not the data files;
  they're re-attached as typed literal columns per add-action group.
- NOT supported, rejected loudly rather than read wrong: deletion vectors
  (roaring-bitmap sidecars), column mapping (id/name modes), and any
  reader feature beyond protocol minReaderVersion 1 that the table
  actually uses.

Everything here is driver-side metadata work (the log is KB-MB scale);
data reads stay one ``spark.read.parquet`` per partition-value group, so
Catalyst still gets pushdown/pruning over the listed files.
"""

from __future__ import annotations

import json
import os
import urllib.parse
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_LOG = "_delta_log"

# reader features this shim implements; a protocol v3 table listing
# anything else is rejected (reading it anyway would silently drop rows —
# e.g. ignoring deletionVectors resurrects deleted rows)
_SUPPORTED_READER_FEATURES = {"timestampNtz", "vacuumProtocolCheck"}


class DeltaProtocolError(NotImplementedError):
    """The table uses a Delta reader feature this shim does not implement."""


@dataclass
class _Snapshot:
    version: int
    schema: StructType
    partition_columns: list[str]
    # add-action path (relative, URL-decoded) -> partitionValues dict
    files: dict[str, dict] = field(default_factory=dict)
    # add-action path -> parsed stats JSON ({numRecords, minValues,
    # maxValues, nullCount}) when the writer recorded them
    stats: dict[str, dict] = field(default_factory=dict)


class DeltaTableReader:
    """Read a real Delta table directory (``_delta_log`` + parquet)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._log_dir = os.path.join(self.path, _LOG)
        if not os.path.isdir(self._log_dir):
            raise FileNotFoundError(f"no _delta_log under {self.path}")

    # ------------------------------------------------------------- log files

    def _commit_versions(self) -> list[int]:
        out = []
        for f in os.listdir(self._log_dir):
            if f.endswith(".json") and f[:-5].isdigit():
                out.append(int(f[:-5]))
        return sorted(out)

    def latest_version(self) -> int:
        versions = self._commit_versions()
        if not versions:
            raise FileNotFoundError(f"empty _delta_log under {self.path}")
        return versions[-1]

    def _commit_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"{version:020d}.json")

    def _resolve_timestamp(self, timestamp: float) -> int:
        """Latest version whose commit-file mtime <= timestamp — the same
        modification-time rule delta-spark applies for ``timestampAsOf``."""
        best = None
        for v in self._commit_versions():
            if os.path.getmtime(self._commit_path(v)) <= timestamp:
                best = v
        if best is None:
            raise ValueError(
                f"no Delta commit at or before timestamp {timestamp} in {self.path}"
            )
        return best

    # ----------------------------------------------------------- checkpoints

    def _last_checkpoint_version(self, at_or_before: int) -> int | None:
        """Newest usable checkpoint <= the target version. ``_last_checkpoint``
        is only a hint to the newest one; older multipart-free checkpoints
        remain discoverable by listing (Delta readers do the same when the
        hint points past the requested version)."""
        ckpts = []
        for f in os.listdir(self._log_dir):
            if f.endswith(".checkpoint.parquet"):
                head = f.split(".", 1)[0]
                if head.isdigit():
                    ckpts.append(int(head))
        usable = [v for v in sorted(ckpts) if v <= at_or_before]
        return usable[-1] if usable else None

    def _replay_checkpoint(self, snap: _Snapshot, version: int) -> None:
        """Fold a parquet checkpoint's actions into the snapshot state.
        Checkpoints are row-per-action parquet with struct columns
        (add/remove/metaData/protocol) — PROTOCOL.md's checkpoint schema."""
        import pyarrow.parquet as pq

        path = os.path.join(self._log_dir, f"{version:020d}.checkpoint.parquet")
        tbl = pq.read_table(path)
        cols = set(tbl.column_names)
        rows = tbl.to_pylist()
        for row in rows:
            if "protocol" in cols and row.get("protocol"):
                self._check_protocol(row["protocol"])
            if "metaData" in cols and row.get("metaData"):
                self._apply_metadata(snap, row["metaData"])
            if "add" in cols and row.get("add"):
                self._apply_add(snap, row["add"])
            # a checkpoint's remove actions are tombstones for VACUUM only;
            # its add set already reflects them — nothing to subtract

    # ---------------------------------------------------------- action apply

    @staticmethod
    def _check_protocol(proto: dict) -> None:
        reader = proto.get("minReaderVersion", 1)
        if reader <= 1:
            return
        if reader == 2:
            # reader v2 is column mapping's gate; the mode check in
            # _apply_metadata decides, so a v2 table without mapping reads
            return
        features = set(proto.get("readerFeatures") or [])
        unsupported = features - _SUPPORTED_READER_FEATURES
        if unsupported:
            raise DeltaProtocolError(
                f"Delta reader features {sorted(unsupported)} are not "
                "supported by this shim (minReaderVersion="
                f"{reader}); reading anyway would return wrong rows"
            )

    def _apply_metadata(self, snap: _Snapshot, meta: dict) -> None:
        config = meta.get("configuration") or {}
        mapping = config.get("delta.columnMapping.mode", "none")
        if mapping not in ("none", None):
            raise DeltaProtocolError(
                f"delta.columnMapping.mode={mapping!r} is not supported "
                "(physical column names would not match the logical schema)"
            )
        schema_str = meta.get("schemaString")
        if schema_str:
            snap.schema = StructType.fromJson(json.loads(schema_str))
        snap.partition_columns = list(meta.get("partitionColumns") or [])

    def _apply_add(self, snap: _Snapshot, add: dict) -> None:
        if add.get("deletionVector"):
            raise DeltaProtocolError(
                "this Delta table has deletion vectors; reading the raw "
                "files would resurrect deleted rows"
            )
        path = urllib.parse.unquote(add["path"])
        pvals = add.get("partitionValues") or {}
        if isinstance(pvals, list):
            # checkpoint parquet stores partitionValues as a MAP column;
            # pyarrow surfaces map values as (key, value) tuple lists
            pvals = dict(pvals)
        snap.files[path] = pvals
        raw_stats = add.get("stats")
        if raw_stats:
            try:
                snap.stats[path] = json.loads(raw_stats)
            except (TypeError, json.JSONDecodeError):
                pass  # malformed stats: skip the skip, never the file

    # --------------------------------------------------------------- replay

    def snapshot(
        self, version: int | None = None, timestamp: float | None = None
    ) -> _Snapshot:
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self._resolve_timestamp(timestamp)
        if version is None:
            version = self.latest_version()
        snap = _Snapshot(version=version, schema=StructType([]), partition_columns=[])
        start = 0
        ckpt = self._last_checkpoint_version(version)
        if ckpt is not None:
            self._replay_checkpoint(snap, ckpt)
            start = ckpt + 1
        for v in range(start, version + 1):
            path = self._commit_path(v)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"missing Delta commit {v} (vacuumed log?) in {self._log_dir}"
                )
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "protocol" in action:
                        self._check_protocol(action["protocol"])
                    elif "metaData" in action:
                        self._apply_metadata(snap, action["metaData"])
                    elif "add" in action:
                        self._apply_add(snap, action["add"])
                    elif "remove" in action:
                        rel = urllib.parse.unquote(action["remove"]["path"])
                        snap.files.pop(rel, None)
                        snap.stats.pop(rel, None)
                    # commitInfo / txn / cdc / domainMetadata: no read effect
        if not snap.schema.fields:
            raise ValueError(f"no metaData action found replaying {self.path}")
        return snap

    # ----------------------------------------------------------------- read

    def read(
        self, version: int | None = None, timestamp: float | None = None
    ) -> DataFrame:
        """Snapshot read with Delta semantics: ``version``/``timestamp``
        time-travel like delta-spark's ``versionAsOf``/``timestampAsOf``.

        Partitioned tables group add-actions by partition values — one
        parquet scan per group with the partition columns re-attached as
        typed literals (they are absent from the data files, per the Delta
        spec), then a by-name union. Group count = live partitions; for a
        table with pathological partition cardinality, read partitions
        selectively instead (this is a shim, not a planner)."""
        snap = self.snapshot(version=version, timestamp=timestamp)
        return self._read_file_subset(snap, sorted(snap.files))

    def _read_file_subset(self, snap: _Snapshot, rels: list[str]) -> DataFrame:
        out_cols = [f.name for f in snap.schema.fields]
        part_types = {
            f.name: f.dataType
            for f in snap.schema.fields
            if f.name in snap.partition_columns
        }
        if not rels:
            return self.spark.createDataFrame([], snap.schema)
        groups: dict[tuple, list[str]] = {}
        for rel in rels:
            key = tuple(sorted(snap.files[rel].items()))
            groups.setdefault(key, []).append(os.path.join(self.path, rel))
        frames = []
        for key, paths in sorted(groups.items()):
            df = self.spark.read.parquet(*paths)
            for col, raw in key:
                # partitionValues are strings ("" = empty string, null =
                # NULL per spec); cast through the schema's type
                lit = F.lit(raw).cast(part_types[col])
                df = df.withColumn(col, lit)
            frames.append(df.select(*out_cols))
        base = frames[0]
        for f in frames[1:]:
            base = base.unionByName(f)
        return base

    def read_where(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> DataFrame:
        """Data-skipping range read over a Delta table, using the add
        actions' ``stats`` zone maps (minValues/maxValues — what Delta's
        own reader prunes with) AND partitionValues when ``col`` is a
        partition column. Files without usable stats are always kept
        (over-approximation preserves correctness); the exact row predicate
        still applies after the file-list cut."""
        snap = self.snapshot(version=version)
        keep: list[str] = []
        is_part = col in snap.partition_columns
        part_type = (
            {f.name: f.dataType for f in snap.schema.fields}[col] if is_part else None
        )
        for rel in sorted(snap.files):
            if is_part:
                raw = snap.files[rel].get(col)
                if raw is not None:
                    # compare in the column's type space via a 1-row cast
                    try:
                        v = json.loads(raw) if part_type.simpleString() in (
                            "int", "bigint", "smallint", "tinyint", "double", "float"
                        ) else raw
                    except (TypeError, json.JSONDecodeError):
                        v = raw
                    if (lo is not None and v < lo) or (hi is not None and v > hi):
                        continue
                keep.append(rel)
                continue
            st = snap.stats.get(rel) or {}
            mn = (st.get("minValues") or {}).get(col)
            mx = (st.get("maxValues") or {}).get(col)
            if mn is None or mx is None:
                keep.append(rel)  # no zone: must read
                continue
            if (lo is None or mx >= lo) and (hi is None or mn <= hi):
                keep.append(rel)
        df = self._read_file_subset(snap, keep)
        c = F.col(col)
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
        return df

    def history(self) -> list[dict]:
        """Commit metadata (version, timestamp, operation) from commitInfo
        actions — enough for a user to pick time-travel targets."""
        out = []
        for v in self._commit_versions():
            entry = {"version": v, "timestamp": os.path.getmtime(self._commit_path(v))}
            with open(self._commit_path(v)) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        action = json.loads(line)
                        if "commitInfo" in action:
                            info = action["commitInfo"]
                            entry["operation"] = info.get("operation")
                            entry["timestamp"] = info.get(
                                "timestamp", entry["timestamp"] * 1000
                            ) / 1000.0
                            break
            out.append(entry)
        return out
