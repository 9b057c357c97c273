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
  O(commits since checkpoint), Delta's own scaling mechanism) — classic
  single-file, classic multipart, AND V2 (UUID-named manifest + sidecar
  files, the default shape from modern Databricks runtimes); checkpoints
  also carry/restore setTransaction state and remove tombstones per
  PROTOCOL.md.
- Logical files keyed on (path, deletionVector uniqueId) — the spec's
  reconciliation rule — so real DELETE-with-DV commits (remove(path,
  oldDV) paired with add(path, newDV) for the same path) fold correctly
  in either action order.
- ``versionAsOf`` / ``timestampAsOf`` time travel (timestamp resolution by
  commit-file modification time, exactly delta-spark's fallback when no
  in-commit timestamps exist).
- Partitioned tables: partition values live in the log, not the data
  files; they're re-attached via a broadcast (file -> values) map join —
  ONE scan node however many partitions the table has, and null partition
  values (JSON null per spec) work.
- Deletion vectors: ``deletionVector`` descriptors on add actions are
  honored — the roaring-bitmap sidecars (storageType u/i/p, Delta
  PROTOCOL.md "Deletion Vectors") are parsed executor-side and applied as
  a (file, row_index) anti-join, so DV-bearing tables (the default shape
  from modern writers) read correctly instead of resurrecting deleted
  rows.
- Column mapping, ``name`` AND ``id`` modes: data is scanned under the
  physical column names recorded in the schema metadata and presented
  under the logical names (struct casts rename nested fields
  positionally); ``id`` mode scans match by parquet field id
  (``spark.sql.parquet.fieldId.read.enabled``), the shape of tables
  converted from Iceberg.
- Anything else beyond the implemented reader feature set is rejected
  loudly rather than read wrong.

Everything driver-side is metadata work (the log is KB-MB scale); data
reads are one ``spark.read.parquet`` over the live file list with the
snapshot schema supplied explicitly — schema-evolved tables read
early files' missing columns as typed nulls, matching delta-spark, and
Catalyst still gets pushdown/pruning over the listed files.
"""

from __future__ import annotations

import json
import os
import urllib.parse
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_LOG = "_delta_log"

# reader features this shim implements; a protocol v3 table listing
# anything else is rejected (reading it anyway would silently drop rows)
_SUPPORTED_READER_FEATURES = {
    "timestampNtz",
    "vacuumProtocolCheck",
    "deletionVectors",
    "columnMapping",
    "v2Checkpoint",
    # type widening (byte->short->int->long, float->double, int->double,
    # date->timestampNtz, ->decimal): every read supplies the SNAPSHOT
    # schema explicitly to the scan (_keyed_scan), and Spark's parquet
    # reader natively up-converts each file's narrower physical type to
    # the requested one — pre-widening files need no rewrite to read.
    # Both the GA and preview feature names gate the same semantics.
    "typeWidening",
    "typeWidening-preview",
    # Variant columns (schemaString type "variant"): Spark 4's parquet
    # reader/writer handle the binary (metadata, value) encoding natively,
    # and the explicit-schema scan passes the type straight through — GA
    # and preview names gate the same semantics.
    "variantType",
    "variantType-preview",
    # Shredded variants (Parquet VariantShredding.md): files carry
    # per-field typed_value shards next to the binary value/metadata
    # pair. Spark 4.1's parquet reader reassembles shredded OR unshredded
    # groups into the logical variant whenever the requested schema says
    # VariantType (spark.sql.variant.allowReadingShredded, default true)
    # — _keyed_scan always supplies the snapshot schema explicitly, so
    # typed_value shards fold back losslessly; tested against a
    # force-shredded fixture in tests/test_delta_interop.py.
    "variantShredding",
    "variantShredding-preview",
}

_PHYS_KEY = "delta.columnMapping.physicalName"
_ID_KEY = "delta.columnMapping.id"
# the StructField metadata key Spark's parquet reader matches on when
# spark.sql.parquet.fieldId.read.enabled is set (ParquetUtils.FIELD_ID_METADATA_KEY)
_SPARK_FIELD_ID = "parquet.field.id"


class DeltaProtocolError(NotImplementedError):
    """The table uses a Delta reader feature this shim does not implement."""


def dv_unique_id(desc: dict | None) -> str | None:
    """PROTOCOL.md's *unique id* of a deletion-vector descriptor — the
    identity half of the (path, dvId) key Delta keys logical files on:
    ``storageType + pathOrInlineDv`` plus ``@offset`` when an offset is
    present. ``None`` means "no deletion vector" (which only matches
    another no-DV entry)."""
    if not desc:
        return None
    uid = str(desc.get("storageType", "")) + str(desc.get("pathOrInlineDv", ""))
    off = desc.get("offset")
    return uid if off is None else f"{uid}@{off}"


def _field_id_meta(f: StructField, with_ids: bool) -> dict:
    """StructField metadata carrying the parquet field id Spark's reader
    matches on (``id`` column-mapping mode), translated from the Delta
    schema's ``delta.columnMapping.id``."""
    if with_ids and _ID_KEY in (f.metadata or {}):
        return {_SPARK_FIELD_ID: int(f.metadata[_ID_KEY])}
    return {}


def _physical_type(dt, with_ids: bool = False):
    """Recursively rewrite a Spark type so nested struct fields carry
    their PHYSICAL names (column mapping stores the mapping in each
    field's metadata, at every nesting level); ``with_ids`` additionally
    attaches each field's parquet field id, so ``id``-mode tables match
    scan columns by id instead of name."""
    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(
                    f.metadata.get(_PHYS_KEY, f.name),
                    _physical_type(f.dataType, with_ids),
                    f.nullable,
                    _field_id_meta(f, with_ids),
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_physical_type(dt.elementType, with_ids), dt.containsNull)
    if isinstance(dt, MapType):
        return MapType(
            _physical_type(dt.keyType, with_ids),
            _physical_type(dt.valueType, with_ids),
            dt.valueContainsNull,
        )
    return dt


@dataclass
class _Snapshot:
    version: int
    schema: StructType  # logical schema
    partition_columns: list[str]  # logical names
    # add-action path (relative, URL-decoded) -> partitionValues dict
    # (keyed by PHYSICAL name when column mapping is on)
    files: dict[str, dict] = field(default_factory=dict)
    # add-action path -> parsed stats JSON ({numRecords, minValues,
    # maxValues, nullCount}) when the writer recorded them
    stats: dict[str, dict] = field(default_factory=dict)
    # add-action path -> deletionVector descriptor for files with live DVs
    dvs: dict[str, dict] = field(default_factory=dict)
    # logical top-level column name -> physical name ({} = no mapping)
    mapping: dict[str, str] = field(default_factory=dict)
    # the last metaData action verbatim (configuration normalized to a
    # dict) — checkpoint writers re-emit it
    metadata: dict = field(default_factory=dict)
    # the last protocol action verbatim — checkpoint writers must re-emit
    # it (a checkpoint defaulting to (1,2) on a DV table would let legacy
    # readers resurrect deleted rows after log cleanup)
    protocol: dict = field(default_factory=dict)
    # setTransaction state: appId -> newest txn version (PROTOCOL.md
    # requires checkpoints to carry these; a streaming writer's
    # idempotence contract must survive JSON log cleanup)
    txns: dict = field(default_factory=dict)
    # unexpired remove tombstones, keyed (path, dv uniqueId) — VACUUM
    # retention state; checkpoints must carry them or cleanup loses them
    tombstones: dict = field(default_factory=dict)
    # delta.columnMapping.mode in effect ("none" | "name" | "id")
    mapping_mode: str = "none"
    # live domainMetadata actions by domain (PROTOCOL.md: checkpoints must
    # carry them — they hold e.g. clustering state for stock readers)
    domains: dict = field(default_factory=dict)
    # row tracking (PROTOCOL.md "Row Tracking"): add-action path ->
    # (baseRowId, defaultRowCommitVersion) for files whose writer assigned
    # them; fresh row id of a row = baseRowId + its position in the file
    row_ids: dict = field(default_factory=dict)

    def physical_name(self, logical: str) -> str:
        return self.mapping.get(logical, logical)


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
        # a log whose every JSON commit was cleaned up to a checkpoint is
        # still a valid table: the checkpoint IS version state
        ckpts = self._checkpoint_files()
        candidates = versions + sorted(ckpts)
        if not candidates:
            raise FileNotFoundError(f"empty _delta_log under {self.path}")
        return max(candidates)

    def _commit_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"{version:020d}.json")

    def _commit_timestamp(self, version: int) -> float:
        """The commit's clock for ``timestampAsOf``: the commitInfo's
        ``inCommitTimestamp`` when the writer recorded one (the
        inCommitTimestamp table feature — survives file copies/rsync,
        which reset mtimes), else the commit file's modification time
        (delta-spark's classic rule)."""
        path = self._commit_path(version)
        try:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        action = json.loads(line)
                        if "commitInfo" in action:
                            ict = action["commitInfo"].get("inCommitTimestamp")
                            if ict is not None:
                                return ict / 1000.0
                            break
        except OSError:
            pass
        return os.path.getmtime(path)

    def _resolve_timestamp(self, timestamp: float) -> int:
        """Latest version whose commit timestamp <= timestamp — the same
        rule delta-spark applies for ``timestampAsOf``. Versions whose
        JSON commit was cleaned up to a checkpoint are still candidates
        (the checkpoint file's mtime stands in for the commit clock), the
        same fallback ``latest_version()`` applies — otherwise a
        checkpoint-cleaned log would refuse valid timestamps."""
        best = None
        json_versions = set(self._commit_versions())
        ckpts = self._checkpoint_files()
        for v in sorted(json_versions | set(ckpts)):
            if v in json_versions:
                ts = self._commit_timestamp(v)
            else:
                ts = os.path.getmtime(
                    os.path.join(self._log_dir, ckpts[v][0])
                )
            if ts <= timestamp:
                best = v
        if best is None:
            raise ValueError(
                f"no Delta commit at or before timestamp {timestamp} in {self.path}"
            )
        return best

    def last_txn_version(self, app_id: str) -> int | None:
        """Newest ``txn`` action version for ``app_id`` (Delta's
        SetTransaction / ``txnAppId``-``txnVersion`` idempotence contract):
        a replaying streaming writer checks this to skip batches it
        already committed. None when the app never wrote. Resolved through
        the snapshot replay, so setTransaction state carried by a
        checkpoint survives JSON log cleanup (PROTOCOL.md requires
        checkpoints to include txn actions for exactly this reason)."""
        try:
            snap = self.snapshot()
        except FileNotFoundError:
            return None  # brand-new/empty table: nothing committed yet
        return snap.txns.get(app_id)

    # ----------------------------------------------------------- checkpoints

    def _checkpoint_files(self) -> dict[int, list[str]]:
        """Complete checkpoints by version, all three PROTOCOL.md naming
        schemes: classic single-file ``<v>.checkpoint.parquet``, classic
        multipart ``<v>.checkpoint.<i>.<n>.parquet`` (usable only when all
        ``n`` parts are present — a partial multipart upload must not
        replay), and V2 UUID-named ``<v>.checkpoint.<uuid>.{parquet,json}``
        (the default shape from modern Databricks runtimes; their file
        actions may live in ``_sidecars/`` files named by ``sidecar``
        actions). When a version has both, V2 wins (it is the newer
        writer's)."""
        singles: dict[int, str] = {}
        multi: dict[tuple[int, int], dict[int, str]] = {}
        v2: dict[int, str] = {}
        for f in os.listdir(self._log_dir):
            if ".checkpoint" not in f:
                continue
            if f.endswith(".parquet"):
                stem = f[: -len(".parquet")]
            elif f.endswith(".json"):
                stem = f[: -len(".json")]
            else:
                continue
            bits = stem.split(".")
            if len(bits) < 2 or bits[1] != "checkpoint" or not bits[0].isdigit():
                continue
            if len(bits) == 2 and f.endswith(".parquet"):
                singles[int(bits[0])] = f
            elif (
                len(bits) == 4
                and f.endswith(".parquet")
                and all(b.isdigit() for b in (bits[2], bits[3]))
            ):
                v, part, n = int(bits[0]), int(bits[2]), int(bits[3])
                multi.setdefault((v, n), {})[part] = f
            elif len(bits) == 3 and not bits[2].isdigit():
                v2[int(bits[0])] = f  # UUID-named V2 manifest
        out: dict[int, list[str]] = {v: [f] for v, f in singles.items()}
        for (v, n), parts in multi.items():
            if v not in out and len(parts) == n:
                out[v] = [parts[i] for i in sorted(parts)]
        for v, f in v2.items():
            # a V2 manifest whose sidecars are missing (rsync that skipped
            # _sidecars/, interrupted upload) must not shadow a usable
            # classic checkpoint at the same version; with no alternative
            # it stays selected and replay fails LOUDLY (never silently
            # reads an older state when the JSON commits are gone too)
            if v not in out or self._v2_sidecars_present(f):
                out[v] = [f]
        return out

    def _v2_sidecars_present(self, fname: str) -> bool:
        """True when every ``_sidecars/`` file a V2 manifest references
        exists (the V2 analogue of the all-parts-present multipart gate)."""
        path = os.path.join(self._log_dir, fname)
        refs: list[str] = []
        try:
            if fname.endswith(".json"):
                with open(path) as fh:
                    for line in fh:
                        line = line.strip()
                        if line:
                            a = json.loads(line)
                            if a.get("sidecar"):
                                refs.append(a["sidecar"]["path"])
            else:
                import pyarrow.parquet as pq

                if "sidecar" in pq.read_schema(path).names:
                    for row in pq.read_table(path, columns=["sidecar"]).to_pylist():
                        if row.get("sidecar"):
                            refs.append(row["sidecar"]["path"])
        except Exception:
            return False  # unreadable manifest: let a classic one win
        return all(
            os.path.exists(
                os.path.join(self._log_dir, "_sidecars", urllib.parse.unquote(s))
            )
            for s in refs
        )

    def _last_checkpoint_version(self, at_or_before: int) -> int | None:
        """Newest usable checkpoint <= the target version. ``_last_checkpoint``
        is only a hint to the newest one; older checkpoints remain
        discoverable by listing (Delta readers do the same when the hint
        points past the requested version)."""
        usable = [
            v for v in sorted(self._checkpoint_files()) if v <= at_or_before
        ]
        return usable[-1] if usable else None

    def _replay_checkpoint(self, snap: _Snapshot, version: int) -> None:
        """Fold a checkpoint's actions into the snapshot state.
        Checkpoints are row-per-action with struct columns
        (add/remove/metaData/protocol/txn) — PROTOCOL.md's checkpoint
        schema; multipart checkpoints concatenate row-wise (action order
        across parts is immaterial: the state is a set fold). V2
        checkpoints additionally may be JSON (one action per line, like a
        commit) and may park their file actions in ``_sidecars/`` parquet
        files named by ``sidecar`` actions — both folded here; their
        ``checkpointMetadata`` action has no state effect."""
        import pyarrow.parquet as pq

        def _file_rows(path: str) -> tuple[list[dict], set[str]]:
            if path.endswith(".json"):
                out = []
                keys: set[str] = set()
                with open(path) as fh:
                    for line in fh:
                        line = line.strip()
                        if line:
                            action = json.loads(line)
                            keys |= set(action)
                            out.append(action)
                return out, keys
            tbl = pq.read_table(path)
            return tbl.to_pylist(), set(tbl.column_names)

        rows: list[dict] = []
        cols: set[str] = set()
        for fname in self._checkpoint_files()[version]:
            r, c = _file_rows(os.path.join(self._log_dir, fname))
            rows.extend(r)
            cols |= c
        # V2: pull in the sidecar files' add/remove rows (PROTOCOL.md "V2
        # Checkpoints": sidecars live under _delta_log/_sidecars/)
        sidecars = [
            row["sidecar"]["path"]
            for row in rows
            if "sidecar" in cols and row.get("sidecar")
        ]
        for sc in sidecars:
            r, c = _file_rows(
                os.path.join(self._log_dir, "_sidecars", urllib.parse.unquote(sc))
            )
            rows.extend(r)
            cols |= c
        for row in rows:
            if "protocol" in cols and row.get("protocol"):
                self._check_protocol(row["protocol"])
                snap.protocol = {
                    k: v for k, v in row["protocol"].items() if v is not None
                }
            if "metaData" in cols and row.get("metaData"):
                meta = dict(row["metaData"])
                if isinstance(meta.get("configuration"), list):
                    meta["configuration"] = dict(meta["configuration"])
                self._apply_metadata(snap, meta)
            if "add" in cols and row.get("add"):
                self._apply_add(snap, row["add"])
            if "txn" in cols and row.get("txn"):
                txn = row["txn"]
                app, tv = txn.get("appId"), txn.get("version")
                if app is not None and tv is not None:
                    prior = snap.txns.get(app)
                    snap.txns[app] = tv if prior is None else max(prior, tv)
            if "domainMetadata" in cols and row.get("domainMetadata"):
                dm = {k: v for k, v in row["domainMetadata"].items() if v is not None}
                if dm.get("removed"):
                    snap.domains.pop(dm.get("domain"), None)
                else:
                    snap.domains[dm.get("domain")] = dm
            if "remove" in cols and row.get("remove"):
                # a checkpoint's remove actions are tombstones for VACUUM
                # retention only; its add set already reflects them —
                # nothing to subtract from the live state
                rem = {
                    k: v for k, v in row["remove"].items() if v is not None
                }
                if isinstance(rem.get("partitionValues"), list):
                    rem["partitionValues"] = dict(rem["partitionValues"])
                path = urllib.parse.unquote(rem.get("path", ""))
                rem["path"] = path  # stored decoded, re-quoted on write
                snap.tombstones[
                    (path, dv_unique_id(rem.get("deletionVector")))
                ] = rem

    # ---------------------------------------------------------- action apply

    @staticmethod
    def _check_protocol(proto: dict) -> None:
        reader = proto.get("minReaderVersion", 1)
        if reader <= 2:
            # v2 gates column mapping; v3 DVs etc. arrive via readerFeatures.
            # Both paths funnel through _apply_metadata / _apply_add checks.
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
        mapping_mode = config.get("delta.columnMapping.mode", "none")
        if mapping_mode not in ("none", "name", "id", None):
            raise DeltaProtocolError(
                f"delta.columnMapping.mode={mapping_mode!r} is not supported"
            )
        snap.mapping_mode = mapping_mode or "none"
        schema_str = meta.get("schemaString")
        if schema_str:
            snap.schema = StructType.fromJson(json.loads(schema_str))
            # both mapping modes record physicalName per field; 'id' mode
            # additionally matches scan columns by parquet field id (see
            # _keyed_scan) — what tables converted from Iceberg need,
            # where the files carry original names but authoritative ids
            snap.mapping = (
                {
                    f.name: f.metadata.get(_PHYS_KEY, f.name)
                    for f in snap.schema.fields
                }
                if mapping_mode in ("name", "id")
                else {}
            )
        snap.partition_columns = list(meta.get("partitionColumns") or [])
        snap.metadata = {**meta, "configuration": dict(config)}

    def _apply_add(self, snap: _Snapshot, add: dict) -> None:
        path = urllib.parse.unquote(add["path"])
        pvals = add.get("partitionValues") or {}
        if isinstance(pvals, list):
            # checkpoint parquet stores partitionValues as a MAP column;
            # pyarrow surfaces map values as (key, value) tuple lists
            pvals = dict(pvals)
        snap.files[path] = pvals
        dv = add.get("deletionVector")
        if dv:
            snap.dvs[path] = {k: v for k, v in dv.items() if v is not None}
        else:
            # a re-add without a descriptor clears any prior DV (that is
            # how Delta drops a DV: re-add the file without it)
            snap.dvs.pop(path, None)
        # re-adding a logical file cancels its own tombstone (delta-spark's
        # InMemoryLogReplay does the same, keyed on the uniqueId)
        snap.tombstones.pop((path, dv_unique_id(dv)), None)
        if add.get("baseRowId") is not None:
            snap.row_ids[path] = (
                add["baseRowId"],
                add.get("defaultRowCommitVersion"),
            )
        else:
            snap.row_ids.pop(path, None)
        raw_stats = add.get("stats")
        if raw_stats:
            try:
                snap.stats[path] = json.loads(raw_stats)
            except (TypeError, json.JSONDecodeError):
                pass  # malformed stats: skip the skip, never the file
        else:
            snap.stats.pop(path, None)

    def _apply_remove(self, snap: _Snapshot, rem: dict) -> None:
        """Delta keys logical files on (path, DV uniqueId) — a remove only
        cancels the add carrying the SAME deletion vector (null matches
        no-DV). That is what makes within-commit action order immaterial:
        a real delta-spark DELETE-with-DV commit pairs
        ``remove(path, oldDV)`` with ``add(path, newDV)`` for the same
        path, and whichever folds first, the survivor is (path, newDV)."""
        path = urllib.parse.unquote(rem["path"])
        rem_id = dv_unique_id(rem.get("deletionVector"))
        if path in snap.files and rem_id == dv_unique_id(snap.dvs.get(path)):
            snap.files.pop(path, None)
            snap.stats.pop(path, None)
            snap.dvs.pop(path, None)
            snap.row_ids.pop(path, None)
        # the tombstone is tracked either way (it names a logical file
        # that WAS live at some point); vacuum retention keys off it.
        # Stored with the path DECODED so checkpoint writers re-quote it
        # exactly once.
        tomb = {k: v for k, v in rem.items() if v is not None}
        tomb["path"] = path
        snap.tombstones[(path, rem_id)] = tomb

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
                        snap.protocol = action["protocol"]
                    elif "metaData" in action:
                        self._apply_metadata(snap, action["metaData"])
                    elif "add" in action:
                        self._apply_add(snap, action["add"])
                    elif "remove" in action:
                        self._apply_remove(snap, action["remove"])
                    elif "txn" in action:
                        txn = action["txn"]
                        app, tv = txn.get("appId"), txn.get("version")
                        if app is not None and tv is not None:
                            prior = snap.txns.get(app)
                            snap.txns[app] = tv if prior is None else max(prior, tv)
                    elif "domainMetadata" in action:
                        dm = action["domainMetadata"]
                        if dm.get("removed"):
                            snap.domains.pop(dm.get("domain"), None)
                        else:
                            snap.domains[dm.get("domain")] = dm
                    # commitInfo / cdc: no read effect
        if not snap.schema.fields:
            raise ValueError(f"no metaData action found replaying {self.path}")
        return snap

    # ----------------------------------------------------------------- read

    def read(
        self, version: int | None = None, timestamp: float | None = None
    ) -> DataFrame:
        """Snapshot read with Delta semantics: ``version``/``timestamp``
        time-travel like delta-spark's ``versionAsOf``/``timestampAsOf``."""
        snap = self.snapshot(version=version, timestamp=timestamp)
        return self._read_file_subset(snap, sorted(snap.files))

    def history_df(self) -> DataFrame:
        """``DESCRIBE HISTORY`` as a DataFrame (the dict-list form lives
        in :meth:`history`): one row per surviving JSON commit —
        (version, timestamp, operation, operation_parameters,
        read_version). Commits cleaned up into a checkpoint have no
        commitInfo left and are simply absent, matching delta-spark's
        behavior on a vacuumed log. Rows come newest-first, delta-spark's
        DESCRIBE HISTORY order. Metadata-plane: O(commits) small-file
        reads on the driver, no data scan."""
        rows = []
        for v in sorted(self._commit_versions(), reverse=True):
            op, params = None, None
            try:
                with open(self._commit_path(v)) as f:
                    for line in f:
                        line = line.strip()
                        if not line:
                            continue
                        a = json.loads(line)
                        if "commitInfo" in a:
                            ci = a["commitInfo"]
                            op = ci.get("operation")
                            params = json.dumps(
                                ci.get("operationParameters") or {}
                            )
                            break
            except OSError:
                continue
            ts = self._commit_timestamp(v)
            rows.append((v, float(ts), op, params, v - 1 if v > 0 else None))
        return self.spark.createDataFrame(
            rows,
            "version long, timestamp double, operation string, "
            "operation_parameters string, read_version long",
        )

    def row_id_high_water_mark(self, snap: _Snapshot | None = None) -> int:
        """Highest row id ever assigned in the table (PROTOCOL.md "Row
        Tracking": kept in the ``delta.rowTracking`` domainMetadata so
        concurrent writers can allocate disjoint ranges). -1 on a table
        that never assigned one."""
        if snap is None:
            snap = self.snapshot()
        dm = snap.domains.get("delta.rowTracking")
        if not dm:
            return -1
        try:
            cfg = dm.get("configuration")
            if isinstance(cfg, str):
                cfg = json.loads(cfg)
            return int(cfg.get("rowIdHighWaterMark", -1))
        except (TypeError, ValueError, json.JSONDecodeError):
            return -1

    def read_with_row_ids(
        self, version: int | None = None, timestamp: float | None = None
    ) -> DataFrame:
        """Snapshot read surfacing Delta Row Tracking ids (PROTOCOL.md
        "Row Tracking", delta-spark's ``_metadata.row_id``): two extra
        columns, ``row_id`` (stable across OPTIMIZE/UPDATE once
        materialized) and ``row_commit_version`` (the commit that last
        wrote each row). Fresh values come from the add action's
        ``baseRowId`` plus the row's physical position —
        ``_metadata.row_index``, attached via ONE broadcast (file ->
        baseRowId) map join — overridden per row by the hidden
        materialized columns when the table's configuration names them
        (files written before materialization read them as null, so the
        coalesce falls back to fresh values exactly as the spec says).
        DV-deleted rows drop out of the scan but surviving positions are
        physical, so their fresh ids are untouched by a DV delete."""
        snap = self.snapshot(version=version, timestamp=timestamp)
        rels = sorted(snap.files)
        missing = [r for r in rels if r not in snap.row_ids]
        if missing:
            raise DeltaProtocolError(
                f"row tracking unavailable: {len(missing)} live file(s) lack "
                f"baseRowId (e.g. {missing[0]}) — the table was not written "
                "with the rowTracking writer feature"
            )
        out_schema = StructType(
            list(snap.schema.fields)
            + [
                StructField("row_id", LongType(), True),
                StructField("row_commit_version", LongType(), True),
            ]
        )
        if not rels:
            return self.spark.createDataFrame([], out_schema)
        extras = [c for c in self._row_tracking_cols(snap) if c]
        df = self._read_file_subset(
            snap, rels, keep_path=True, extra_physical=extras
        )
        df = self._attach_row_ids(snap, df, rels)
        return df.select(
            *[F.col(f.name) for f in snap.schema.fields],
            "row_id",
            "row_commit_version",
        )

    @staticmethod
    def _row_tracking_cols(snap: _Snapshot) -> tuple[str | None, str | None]:
        """The configured materialized (row id, row commit version)
        physical column names, or Nones."""
        cfg = snap.metadata.get("configuration") or {}
        return (
            cfg.get("delta.rowTracking.materializedRowIdColumnName"),
            cfg.get("delta.rowTracking.materializedRowCommitVersionColumnName"),
        )

    def _attach_row_ids(self, snap: _Snapshot, df: DataFrame, rels: list[str]):
        """Append ``row_id`` / ``row_commit_version`` to a keyed scan
        (``keep_path=True`` plus the configured materialized columns in
        ``extra_physical``): one broadcast (file -> baseRowId,
        defaultRowCommitVersion) map join, materialized values override
        fresh ones per row. Shared by :meth:`read_with_row_ids` and the
        CoW mutation layer (which must carry stable ids into rewritten
        files)."""
        mat_id, mat_rcv = self._row_tracking_cols(snap)
        # a file without baseRowId (pre-tracking history) contributes null
        # fresh values — its rows may still carry materialized ids
        rows = [
            (self._fs_path(r), *snap.row_ids.get(r, (None, None)))
            for r in rels
        ]
        rmap = self.spark.createDataFrame(
            rows, "__delta_path string, __base_row_id long, __default_rcv long"
        )
        df = df.join(F.broadcast(rmap), "__delta_path", "left")
        rid = F.col("__base_row_id") + F.col("__delta_pos")
        rcv = F.col("__default_rcv")
        if mat_id:
            rid = F.coalesce(F.col(mat_id), rid)
        if mat_rcv:
            rcv = F.coalesce(F.col(mat_rcv), rcv)
        return (
            df.withColumn("row_id", rid.cast("long"))
            .withColumn("row_commit_version", rcv.cast("long"))
            .drop("__base_row_id", "__default_rcv")
        )

    @staticmethod
    def _norm_path_col(col):
        """``_metadata.file_path`` -> plain decoded os.path string, so it
        compares equal to the python-side map keys (which are URL-DECODED
        log paths). The decode invariant lives in ONE place —
        :func:`sdlt_spark.store.paths.decoded_file_path` — shared with the
        vintage DV keying and partition attach."""
        from sdlt_spark.store.paths import decoded_file_path

        return decoded_file_path(col)

    def _fs_path(self, rel: str) -> str:
        """Add-action path -> filesystem path; PROTOCOL.md allows paths
        relative to the table root OR absolute (the shallow-clone shape)
        — one resolver (store/paths.resolve_table_path) for every scan,
        DV, CDF, and stats site."""
        from sdlt_spark.store.paths import resolve_table_path

        return resolve_table_path(self.path, rel)

    def _read_file_subset(
        self,
        snap: _Snapshot,
        rels: list[str],
        keep_path: bool = False,
        extra_physical: list[str] | None = None,
    ) -> DataFrame:
        """One parquet scan over the DV-free live files (snapshot schema
        supplied explicitly — early files of a schema-evolved table read
        missing columns as typed nulls, and Catalyst gets pushdown over
        the whole list) plus, when deletion vectors are live, a SECOND
        scan restricted to the covered files with the (file, row position)
        anti-join applied — so the anti-join never shuffles the uncovered
        bulk of the table (DVs usually cover a small fraction of files; at
        100 TB the difference is shuffling GBs vs the whole table, and AQE
        broadcasts the deleted-positions side when it fits). Partition
        columns re-attach via a broadcast (file -> values) map join: no
        per-partition plan fan-out at any partition count.

        ``keep_path=True`` appends the ``__delta_path`` (decoded fs path)
        and ``__delta_pos`` (row position) identity keys to the output —
        the mutation layer (store/delta_mutate.py) uses them to find
        touched files and build deletion vectors."""
        empty_schema = snap.schema
        if keep_path:
            empty_schema = StructType(
                list(snap.schema.fields)
                + [
                    StructField("__delta_path", StringType(), True),
                    StructField("__delta_pos", LongType(), True),
                ]
            )
        if not rels:
            return self.spark.createDataFrame([], empty_schema)
        plain = [r for r in rels if r not in snap.dvs]
        covered = [r for r in rels if r in snap.dvs]
        parts = []
        if plain:
            parts.append(
                self._scan_subset(
                    snap, plain, with_dvs=False, keep_path=keep_path,
                    extra_physical=extra_physical,
                )
            )
        if covered:
            parts.append(
                self._scan_subset(
                    snap, covered, with_dvs=True, keep_path=keep_path,
                    extra_physical=extra_physical,
                )
            )
        if not parts:
            return self.spark.createDataFrame([], empty_schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _keyed_scan(
        self,
        snap: _Snapshot,
        rels: list[str],
        keys: bool = True,
        extra_physical: list[str] | None = None,
    ):
        """The shared scan every read path builds on: the listed files
        under the snapshot's PHYSICAL data schema (explicit — early files
        of a schema-evolved table read missing columns as typed nulls)
        with decoded (__delta_path, __delta_pos) identity keys attached.
        ``keys=False`` skips them — an unpartitioned, DV-free read needs
        neither, and not touching ``_metadata`` keeps the plan a bare
        pruned scan. Returns (df, data_fields, part_fields)."""
        part_set = set(snap.partition_columns)
        data_fields = [f for f in snap.schema.fields if f.name not in part_set]
        part_fields = [f for f in snap.schema.fields if f.name in part_set]
        by_id = snap.mapping_mode == "id"
        scan_schema = StructType(
            [
                StructField(
                    snap.physical_name(f.name),
                    _physical_type(f.dataType, by_id),
                    True,
                    _field_id_meta(f, by_id),
                )
                for f in data_fields
            ]
            # hidden physical columns outside the logical schema (e.g. the
            # materialized row-id column of a row-tracked table): files
            # written before materialization read them as typed nulls
            + [StructField(c, LongType(), True) for c in (extra_physical or [])]
        )
        if by_id:
            # 'id' mapping: Spark matches requested fields to parquet
            # columns by the field id in the footer schema, not by name —
            # the conf only takes effect for schemas that carry
            # parquet.field.id metadata, so it is safe session-wide
            self.spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        paths = [self._fs_path(rel) for rel in rels]
        df = self.spark.read.schema(scan_schema).parquet(*paths)
        if keys:
            df = df.withColumn(
                "__delta_path", self._norm_path_col(F.col("_metadata.file_path"))
            ).withColumn("__delta_pos", F.col("_metadata.row_index"))
        return df, data_fields, part_fields

    @staticmethod
    def _logical_cols(snap: _Snapshot, data_fields) -> list:
        """Physical -> logical projection; struct casts rename nested
        physical fields positionally, so column mapping round-trips at
        every depth."""
        return [
            F.col(snap.physical_name(f.name)).cast(f.dataType).alias(f.name)
            for f in data_fields
        ]

    def _scan_subset(
        self,
        snap: _Snapshot,
        rels: list[str],
        with_dvs: bool,
        keep_path: bool = False,
        extra_physical: list[str] | None = None,
    ) -> DataFrame:
        need_keys = with_dvs or bool(snap.partition_columns) or keep_path
        df, data_fields, part_fields = self._keyed_scan(
            snap, rels, keys=need_keys, extra_physical=extra_physical
        )
        data_cols = self._logical_cols(snap, data_fields)

        if part_fields:
            # partition values live only in the log: build the (file ->
            # values) map — O(live files) driver work, the same cost class
            # as replaying the log — and broadcast-join it on the scan's
            # file path. Values are built as the spec's strings ("" =
            # empty string, null = NULL) and cast through the schema's
            # types; null partition values stay null (and can't crash a
            # sort, since nothing is sorted here).
            from pyspark.sql.types import StringType

            rows = []
            for rel in rels:
                pvals = snap.files[rel]
                raw = [
                    pvals.get(snap.physical_name(f.name)) for f in part_fields
                ]
                rows.append((self._fs_path(rel), *raw))

            pmap = self.spark.createDataFrame(
                rows,
                StructType(
                    [StructField("__delta_path", StringType(), False)]
                    + [
                        StructField(f"__pv_{f.name}", StringType(), True)
                        for f in part_fields
                    ]
                ),
            ).select(
                "__delta_path",
                *[
                    F.col(f"__pv_{f.name}")
                    .cast(f.dataType)
                    .alias(f"__pv_{f.name}")
                    for f in part_fields
                ],
            )
            df = df.join(F.broadcast(pmap), "__delta_path", "left")
            part_cols = {
                f.name: F.col(f"__pv_{f.name}").alias(f.name)
                for f in part_fields
            }
        else:
            part_cols = {}

        if with_dvs:
            df = self._anti_join_dvs(
                df, {rel: snap.dvs[rel] for rel in rels}
            )

        out_cols = [
            part_cols[f.name] if f.name in part_cols else None
            for f in snap.schema.fields
        ]
        ordered = []
        di = 0
        for f, pc in zip(snap.schema.fields, out_cols):
            if pc is not None:
                ordered.append(pc)
            else:
                ordered.append(data_cols[di])
                di += 1
        if keep_path:
            ordered += [F.col("__delta_path"), F.col("__delta_pos")]
        ordered += [F.col(c) for c in (extra_physical or [])]
        return df.select(*ordered)

    def _anti_join_dvs(self, df: DataFrame, live_dvs: dict[str, dict]) -> DataFrame:
        """Expand deletion-vector descriptors to (file, row position) rows
        EXECUTOR-side (the driver only ships the O(#DVs) descriptor list;
        a table with billions of DV'd rows never materializes them on the
        driver) and anti-join against the scan. DV row indexes are
        positions within the parquet file — exactly ``_metadata.row_index``
        (the same contract delta-spark relies on)."""
        import pandas as pd  # noqa: F401  (mapInPandas contract)

        table_root = self.path
        desc_rows = [
            (
                self._fs_path(rel),
                json.dumps(desc),
            )
            for rel, desc in live_dvs.items()
        ]
        desc_df = self.spark.createDataFrame(
            desc_rows, "abs_path string, descriptor string"
        ).repartition(min(len(desc_rows), 64))

        def expand(batches):
            import pandas as pd

            from sdlt_spark.store.delta_dv import dv_positions

            for pdf in batches:
                for abs_path, desc_json in zip(pdf["abs_path"], pdf["descriptor"]):
                    pos = dv_positions(json.loads(desc_json), table_root)
                    yield pd.DataFrame(
                        {"__del_path": abs_path, "__del_pos": pos}
                    )

        deleted = desc_df.mapInPandas(
            expand, "__del_path string, __del_pos long"
        )
        return df.join(
            deleted,
            (df["__delta_path"] == deleted["__del_path"])
            & (df["__delta_pos"] == deleted["__del_pos"]),
            "left_anti",
        )

    def read_where(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> DataFrame:
        """Data-skipping range read over a Delta table, using the add
        actions' ``stats`` zone maps (minValues/maxValues — what Delta's
        own reader prunes with) AND partitionValues when ``col`` is a
        partition column. Files without usable stats are always kept
        (over-approximation preserves correctness; a DV'd file's stats may
        overcount deleted rows, which also only over-keeps); the exact row
        predicate still applies after the file-list cut."""
        snap = self.snapshot(version=version)
        keep: list[str] = []
        is_part = col in snap.partition_columns
        phys = snap.physical_name(col)
        part_type = (
            {f.name: f.dataType for f in snap.schema.fields}[col] if is_part else None
        )
        for rel in sorted(snap.files):
            if is_part:
                raw = snap.files[rel].get(phys)
                if raw is not None:
                    # compare in the column's type space via a 1-row cast
                    try:
                        v = json.loads(raw) if part_type.simpleString() in (
                            "int", "bigint", "smallint", "tinyint", "double", "float"
                        ) else raw
                    except (TypeError, json.JSONDecodeError):
                        v = raw
                    try:
                        if (lo is not None and v < lo) or (
                            hi is not None and v > hi
                        ):
                            continue
                    except TypeError:
                        # value and bound are not comparable (e.g. a string
                        # date vs a datetime bound): the zone is unusable
                        # for THIS query — keep the file, never crash the
                        # read (mirrors VintageTable._prune_by_range)
                        pass
                keep.append(rel)
                continue
            st = snap.stats.get(rel) or {}
            mn = (st.get("minValues") or {}).get(phys)
            mx = (st.get("maxValues") or {}).get(phys)
            if mn is None or mx is None:
                # an all-null column can't match a range predicate —
                # nullCount == numRecords prunes where min/max can't
                nc = (st.get("nullCount") or {}).get(phys)
                nr = st.get("numRecords")
                if nc is not None and nr is not None and nc == nr:
                    continue
                keep.append(rel)  # no usable zone: must read
                continue
            try:
                overlap = (lo is None or mx >= lo) and (hi is None or mn <= hi)
            except TypeError:
                overlap = True  # incomparable zone: must read
            if overlap:
                keep.append(rel)
        df = self._read_file_subset(snap, keep)
        c = F.col(col)
        if lo is not None:
            df = df.filter(c >= F.lit(lo))
        if hi is not None:
            df = df.filter(c <= F.lit(hi))
        return df

    # ------------------------------------------------------ change data feed

    def _commit_actions(self, version: int) -> list[dict]:
        path = self._commit_path(version)
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"missing Delta commit {version} (vacuumed log?) in {self._log_dir}"
            )
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def walk_changes(
        self, from_version: int, to_version: int, skip_underivable: bool = False
    ):
        """Per-commit change-unit resolution shared by batch
        ``table_changes`` and the ``delta_cdc`` streaming source (one
        resolver, so batch and streaming CDC can never drift). Yields
        ``(version, cdc_units, inserts, deletes, dv_grown)`` where
        cdc_units = [(rel, pvals)] (change-data files are partitioned
        like data files — their partition values live in the action, not
        the parquet), inserts = [(rel, pvals)], deletes =
        [(rel, prior_dv, pvals)], dv_grown =
        [(rel, new_dv, old_dv, pvals)]. Commits with no
        file-level derivation (un-deletes) raise
        :class:`DeltaProtocolError` — or, with ``skip_underivable``
        (Delta's ``skipChangeCommits`` semantics), the commit is dropped
        WHOLE while its state still folds. Per delta-spark, the option
        skips every commit that deletes or modifies existing rows
        (removes, DV growth, cdc-marked updates) — not just the
        underivable ones — so a consumer that only wants appends never
        receives delete rows."""
        base = (
            self.snapshot(version=from_version - 1)
            if from_version > 0
            else _Snapshot(version=-1, schema=StructType([]), partition_columns=[])
        )
        live: dict[str, dict] = dict(base.files)
        dv_state: dict[str, dict] = dict(base.dvs)
        for v in range(from_version, to_version + 1):
            actions = self._commit_actions(v)
            cdc_paths = [
                (
                    urllib.parse.unquote(a["cdc"]["path"]),
                    a["cdc"].get("partitionValues") or {},
                )
                for a in actions
                if "cdc" in a
            ]
            inserts: list[tuple[str, dict]] = []
            deletes: list[tuple[str, dict | None, dict]] = []
            dv_grown: list[tuple[str, dict, dict | None, dict]] = []
            underivable: str | None = None
            # Reconcile per (path, dv uniqueId) — Delta's logical-file key
            # — so within-commit action order is immaterial. A real
            # delta-spark DELETE-with-DV commit pairs remove(path, oldDV)
            # with add(path, newDV) for the SAME path: the pair is ONE
            # logical-file update (a DV diff), never an insert+delete.
            adds_by_rel: dict[str, dict] = {}
            removes_by_rel: dict[str, dict] = {}
            order: list[str] = []
            for a in actions:
                if "add" in a:
                    rel = urllib.parse.unquote(a["add"]["path"])
                    adds_by_rel[rel] = a["add"]
                    if rel not in removes_by_rel:
                        order.append(rel)
                elif "remove" in a:
                    rel = urllib.parse.unquote(a["remove"]["path"])
                    removes_by_rel[rel] = a["remove"]
                    if rel not in adds_by_rel:
                        order.append(rel)
            seen: set[str] = set()
            for rel in order:
                if rel in seen:
                    continue
                seen.add(rel)
                add = adds_by_rel.get(rel)
                rem = removes_by_rel.get(rel)
                prior_dv = dv_state.get(rel)
                was_live = rel in live
                if add is not None:
                    new_dv = add.get("deletionVector") or None
                    pvals = add.get("partitionValues") or {}
                    data_change = add.get("dataChange", True)
                    # a paired remove that targets a DIFFERENT logical file
                    # (stale dvId) is a no-op per spec; one that targets the
                    # pre-commit (path, prior dvId) is the old half of this
                    # update and must not read as a row-level delete
                    if data_change and not cdc_paths:
                        if not was_live:
                            if new_dv:
                                underivable = (
                                    f"commit {v}: add of new file {rel} with a "
                                    "deletion vector has no file-level CDF "
                                    "derivation (writer should emit cdc actions)"
                                )
                            else:
                                inserts.append((rel, pvals))
                        elif new_dv and (
                            prior_dv is None
                            or new_dv.get("cardinality", 0)
                            > prior_dv.get("cardinality", 0)
                        ):
                            dv_grown.append((rel, new_dv, prior_dv, pvals))
                        elif (new_dv or {}) != (prior_dv or {}):
                            underivable = (
                                f"commit {v}: re-add of {rel} changes its "
                                "deletion vector in a way with no file-level "
                                "CDF derivation (un-delete); reading would "
                                "emit wrong change rows"
                            )
                    live[rel] = pvals
                    if new_dv:
                        dv_state[rel] = new_dv
                    else:
                        dv_state.pop(rel, None)
                else:  # remove only: cancels its (path, dvId) logical file
                    rem_id = dv_unique_id(rem.get("deletionVector"))
                    if was_live and rem_id == dv_unique_id(prior_dv):
                        if rem.get("dataChange", True) and not cdc_paths:
                            deletes.append((rel, prior_dv, live[rel]))
                        live.pop(rel, None)
                        dv_state.pop(rel, None)
                    # a remove naming a non-live logical file: no-op
            if underivable and not skip_underivable:
                raise DeltaProtocolError(underivable)
            if skip_underivable and (
                underivable
                or deletes
                or dv_grown
                # a cdc-bearing commit that also removed files modified
                # existing rows (UPDATE/DELETE); cdc with pure adds is an
                # append-shaped change and flows
                or (cdc_paths and any("remove" in a for a in actions))
            ):
                continue  # state folded; commit dropped whole
            yield v, cdc_paths, inserts, deletes, dv_grown

    def table_changes(
        self,
        from_version: int,
        to_version: int | None = None,
        skip_change_commits: bool = False,
    ) -> DataFrame:
        """Batch change-data read over a REAL Delta log — the consumer half
        of Delta's Change Data Feed. Per PROTOCOL.md "Change Data Files":

        - commits carrying ``cdc`` actions: their ``_change_data`` parquet
          IS the change set (rows with ``_change_type``); add/remove in
          the same commit are ignored for CDF;
        - otherwise: an ``add`` (dataChange=true) of a NEW file emits its
          rows as ``insert``; a ``remove`` emits the file's rows (minus
          its prior deletion vector — those rows were already reported
          deleted) as ``delete``; a re-``add`` of a live file whose DV
          grew emits exactly the newly-covered positions as ``delete``
          (delta-spark's DV diff derivation);
        - dataChange=false commits (compaction, checkpointing-style
          rewrites) emit nothing;
        - a commit whose row-level effect is NOT derivable file-level (a
          re-add that shrinks/drops a DV, i.e. un-deletes) raises instead
          of emitting wrong rows.

        Output: the table's columns + ``_change_type`` + ``_commit_version``
        (the same shape as ``VintageTable.table_changes``).

        Scale shape: change units are BATCHED across the whole version
        range — one scan per category (cdc files / inserts / plain
        deletes / DV'd deletes / DV diffs) with a broadcast (file ->
        version, partition values) map attaching per-row provenance — so
        reading the CDF of 1000 commits builds ~5 scan nodes, not
        thousands of per-file union leaves. A path re-added across the
        range (rare) falls into an extra batch per reuse."""
        if to_version is None:
            to_version = self.latest_version()
        snap = self.snapshot(version=to_version)  # schema for padding
        cdc_units: list[tuple[str, dict, int]] = []
        ins_units: list[tuple[str, dict, int]] = []
        del_plain: list[tuple[str, dict, int]] = []
        del_dv: list[tuple[str, dict, int]] = []
        dv_by_rel_ver: dict[tuple[str, int], dict] = {}
        grown_units: list[tuple[str, dict, dict | None, dict, int]] = []
        for v, cdc_paths, inserts, deletes, dv_grown in self.walk_changes(
            from_version, to_version, skip_underivable=skip_change_commits
        ):
            if cdc_paths and snap.mapping:
                raise DeltaProtocolError(
                    "change-data files on a column-mapped table are not "
                    "supported by this shim"
                )
            cdc_units.extend((rel, pvals, v) for rel, pvals in cdc_paths)
            ins_units.extend((rel, pvals, v) for rel, pvals in inserts)
            for rel, prior_dv, pvals in deletes:
                if prior_dv:
                    del_dv.append((rel, pvals, v))
                    dv_by_rel_ver[(rel, v)] = prior_dv
                else:
                    del_plain.append((rel, pvals, v))
            grown_units.extend(
                (rel, new, old, pvals, v) for rel, new, old, pvals in dv_grown
            )

        frames: list[DataFrame] = []
        frames += self._cdc_frames(snap, cdc_units)
        frames += self._change_frames(snap, ins_units, "insert")
        frames += self._change_frames(snap, del_plain, "delete")
        frames += self._change_frames(
            snap, del_dv, "delete", dvs_by_rel_ver=dv_by_rel_ver
        )
        frames += self._dv_diff_frames(snap, grown_units)
        if not frames:
            from pyspark.sql.types import LongType, StringType

            empty_schema = StructType(
                snap.schema.fields
                + [
                    StructField("_change_type", StringType(), True),
                    StructField("_commit_version", LongType(), True),
                ]
            )
            return self.spark.createDataFrame([], empty_schema)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    @staticmethod
    def _unique_rel_batches(items: list[tuple]) -> list[list[tuple]]:
        """Split (rel, ...) tuples into batches with unique rels, so a
        broadcast path->provenance map stays a function (a path re-added
        in several commits lands in one batch per occurrence)."""
        batches: list[list[tuple]] = []
        remaining = list(items)
        while remaining:
            seen: set[str] = set()
            batch, rest = [], []
            for it in remaining:
                if it[0] in seen:
                    rest.append(it)
                else:
                    seen.add(it[0])
                    batch.append(it)
            batches.append(batch)
            remaining = rest
        return batches

    def _cdc_frames(
        self, snap: _Snapshot, units: list[tuple[str, dict, int]]
    ) -> list[DataFrame]:
        """All cdc files of the range in one scan (mergeSchema: the change
        schema may have evolved mid-range), version AND missing partition
        columns attached from a broadcast path map (cdc files are
        partitioned like data files — the partition values live in the
        cdc action, not the parquet)."""
        from pyspark.sql.types import LongType, StringType

        part_fields = [
            f for f in snap.schema.fields if f.name in snap.partition_columns
        ]
        out = []
        for batch in self._unique_rel_batches(units):
            paths = [self._fs_path(rel) for rel, _, _ in batch]
            df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
            # change-data files of a column-mapped table carry PHYSICAL
            # column names, like data files — translate back to logical
            for logical, phys in snap.mapping.items():
                if phys in df.columns and logical not in df.columns:
                    df = df.withColumnRenamed(phys, logical)
            df = df.withColumn(
                "__delta_path", self._norm_path_col(F.col("_metadata.file_path"))
            )
            # only partition columns the cdc parquet does NOT carry come
            # from the map (a writer inlining them wins)
            missing = [f for f in part_fields if f.name not in df.columns]
            pmap = self.spark.createDataFrame(
                [
                    (
                        self._fs_path(rel),
                        v,
                        *[
                            (pvals or {}).get(snap.physical_name(f.name))
                            for f in missing
                        ],
                    )
                    for rel, pvals, v in batch
                ],
                StructType(
                    [
                        StructField("__delta_path", StringType(), False),
                        StructField("__ver", LongType(), False),
                    ]
                    + [
                        StructField(f"__pv_{f.name}", StringType(), True)
                        for f in missing
                    ]
                ),
            ).select(
                "__delta_path",
                "__ver",
                *[
                    F.col(f"__pv_{f.name}").cast(f.dataType).alias(f"__pv_{f.name}")
                    for f in missing
                ],
            )
            joined = df.join(F.broadcast(pmap), "__delta_path", "left").withColumn(
                "_commit_version", F.col("__ver")
            )
            for f in missing:
                joined = joined.withColumn(f.name, F.col(f"__pv_{f.name}"))
            out.append(
                joined.drop(
                    "__delta_path", "__ver", *[f"__pv_{f.name}" for f in missing]
                )
            )
        return out

    def _change_frames(
        self,
        snap: _Snapshot,
        units: list[tuple[str, dict, int]],
        tag: str,
        dvs_by_rel_ver: dict[tuple[str, int], dict] | None = None,
    ) -> list[DataFrame]:
        """File-level change units -> frames: one scan per unique-rel
        batch under the snapshot schema, partition values AND commit
        version from a broadcast map, optional prior-DV anti-join (a
        removed DV-bearing file must not re-report already-deleted
        rows)."""
        from pyspark.sql.types import LongType, StringType

        out = []
        for batch in self._unique_rel_batches(units):
            df, data_fields, part_fields = self._keyed_scan(
                snap, [rel for rel, _, _ in batch]
            )
            part_set = set(snap.partition_columns)
            if dvs_by_rel_ver:
                covered = {
                    rel: dvs_by_rel_ver[(rel, v)]
                    for rel, _, v in batch
                    if (rel, v) in dvs_by_rel_ver
                }
                if covered:
                    df = self._anti_join_dvs(df, covered)
            pmap_schema = StructType(
                [
                    StructField("__delta_path", StringType(), False),
                    StructField("__ver", LongType(), False),
                ]
                + [
                    StructField(f"__pv_{f.name}", StringType(), True)
                    for f in part_fields
                ]
            )
            rows = [
                (
                    self._fs_path(rel),
                    v,
                    *[
                        (pvals or {}).get(snap.physical_name(f.name))
                        for f in part_fields
                    ],
                )
                for rel, pvals, v in batch
            ]
            pmap = self.spark.createDataFrame(rows, pmap_schema).select(
                "__delta_path",
                "__ver",
                *[
                    F.col(f"__pv_{f.name}").cast(f.dataType).alias(f"__pv_{f.name}")
                    for f in part_fields
                ],
            )
            df = df.join(F.broadcast(pmap), "__delta_path", "left")
            ordered = []
            it = iter(self._logical_cols(snap, data_fields))
            for f in snap.schema.fields:
                if f.name in part_set:
                    ordered.append(F.col(f"__pv_{f.name}").alias(f.name))
                else:
                    ordered.append(next(it))
            out.append(
                df.select(
                    *ordered,
                    F.lit(tag).alias("_change_type"),
                    F.col("__ver").alias("_commit_version"),
                )
            )
        return out

    def _dv_diff_frames(
        self,
        snap: _Snapshot,
        units: list[tuple[str, dict, dict | None, dict, int]],
    ) -> list[DataFrame]:
        """DV-growth units -> frames of the newly-deleted rows: one scan
        per unique-rel batch, inner-joined against executor-expanded
        (path, pos, version) diff rows (new DV minus old DV — parsed
        where the sidecars live, never on the driver)."""
        table_root = self.path
        out = []
        for batch in self._unique_rel_batches(units):
            df, data_fields, part_fields = self._keyed_scan(
                snap, [rel for rel, *_ in batch]
            )
            part_set = set(snap.partition_columns)
            desc_rows = [
                (
                    self._fs_path(rel),
                    json.dumps(new),
                    json.dumps(old) if old else None,
                    json.dumps(
                        {
                            f.name: (pvals or {}).get(snap.physical_name(f.name))
                            for f in part_fields
                        }
                    ),
                    v,
                )
                for rel, new, old, pvals, v in batch
            ]
            desc_df = self.spark.createDataFrame(
                desc_rows,
                "abs_path string, new_desc string, old_desc string, "
                "pvals string, ver long",
            ).repartition(min(len(desc_rows), 64))

            def expand(batches):
                import pandas as pd

                from sdlt_spark.store.delta_dv import dv_positions

                for pdf in batches:
                    for abs_path, nd, od, pv, ver in zip(
                        pdf["abs_path"], pdf["new_desc"], pdf["old_desc"],
                        pdf["pvals"], pdf["ver"],
                    ):
                        new_pos = set(dv_positions(json.loads(nd), table_root))
                        old_pos = (
                            set(dv_positions(json.loads(od), table_root))
                            if od
                            else set()
                        )
                        diff = sorted(new_pos - old_pos)
                        yield pd.DataFrame(
                            {
                                "__del_path": abs_path,
                                "__del_pos": diff,
                                "__pvals": pv,
                                "__ver": ver,
                            }
                        )

            diff_df = desc_df.mapInPandas(
                expand,
                "__del_path string, __del_pos long, __pvals string, __ver long",
            )
            joined = df.join(
                diff_df,
                (df["__delta_path"] == diff_df["__del_path"])
                & (df["__delta_pos"] == diff_df["__del_pos"]),
                "inner",
            )
            ordered = []
            it = iter(self._logical_cols(snap, data_fields))
            for f in snap.schema.fields:
                if f.name in part_set:
                    ordered.append(
                        F.get_json_object(F.col("__pvals"), f"$.{f.name}")
                        .cast(f.dataType)
                        .alias(f.name)
                    )
                else:
                    ordered.append(next(it))
            out.append(
                joined.select(
                    *ordered,
                    F.lit("delete").alias("_change_type"),
                    F.col("__ver").alias("_commit_version"),
                )
            )
        return out

    def count(self, version: int | None = None) -> int:
        """Exact row count from METADATA alone when possible: sum of the
        add actions' ``numRecords`` stats minus live DV cardinalities —
        the same shortcut delta-spark's ``SELECT COUNT(*)`` takes, O(live
        files) driver work, zero data reads. Files without recorded stats
        fall back to a parquet-footer read (still metadata, not data
        pages). At 100 TB this is the difference between a log replay and
        a full scan for the most common warehouse query there is."""
        import pyarrow.parquet as pq

        snap = self.snapshot(version=version)
        total = 0
        for rel in snap.files:
            st = snap.stats.get(rel)
            n = st.get("numRecords") if st else None
            if n is None:
                n = pq.read_metadata(self._fs_path(rel)).num_rows
            total += int(n)
        for desc in snap.dvs.values():
            total -= int(desc.get("cardinality", 0))
        return total

    def min_max(self, col: str, version: int | None = None) -> tuple:
        """Exact (min, max) of a NUMERIC column from METADATA where
        possible: add-action stats supply per-file bounds (parquet zone
        maps are true values for numerics, never truncated the way long
        string stats are); only files that are stat-less or DV-covered
        fall back to a real scan restricted to just those files (a DV may
        have deleted the extreme row, so their stats are bounds, not
        witnesses). At 100 TB: a log replay plus a scan of the exception
        files instead of the table.

        Non-numeric columns take the honest full-scan path (Delta string
        stats may be prefix-truncated; dates/timestamps round-trip JSON
        as strings) — correctness first, shortcut second."""
        from pyspark.sql.types import NumericType

        snap = self.snapshot(version=version)
        if col not in snap.schema.names:
            raise KeyError(col)
        numeric = isinstance(snap.schema[col].dataType, NumericType)
        is_part = col in snap.partition_columns
        phys = snap.physical_name(col)
        mins: list = []
        maxs: list = []
        need_scan: list[str] = []
        for rel in sorted(snap.files):
            if not numeric:
                need_scan.append(rel)
                continue
            if is_part:
                v = (snap.files[rel] or {}).get(phys)
                if v is not None:
                    fv = float(v)
                    mins.append(fv if fv != int(fv) else int(fv))
                    maxs.append(mins[-1])
                continue  # a null partition value contributes nothing
            st = snap.stats.get(rel)
            lo = (st or {}).get("minValues", {}).get(phys)
            hi = (st or {}).get("maxValues", {}).get(phys)
            if rel in snap.dvs or lo is None or hi is None:
                # all-null files record no bounds — but telling "all null"
                # apart from "stats skipped the column" needs nullCount +
                # numRecords, so only that exact case avoids the scan
                n = (st or {}).get("numRecords")
                nulls = (st or {}).get("nullCount", {}).get(phys)
                if rel not in snap.dvs and n is not None and nulls == n:
                    continue
                need_scan.append(rel)
                continue
            mins.append(lo)
            maxs.append(hi)
        if need_scan:
            row = (
                self._read_file_subset(snap, need_scan)
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .head()
            )
            if row["lo"] is not None:
                mins.append(row["lo"])
                maxs.append(row["hi"])
        if not mins:
            return (None, None)
        return (min(mins), max(maxs))

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


def import_delta_to_vintage(spark, delta_path: str, dest_path: str):
    """Zero-copy IMPORT of a real Delta table into a ``VintageTable`` —
    the inbound counterpart of ``export_vintage_to_delta``: the vintage
    v0 commit points at the Delta table's data files in place
    (out-of-root relative refs, the shallow-clone mechanism), deletion
    vectors are translated from roaring sidecars into vintage (file, pos)
    rows — O(deleted rows), nothing rewritten — and the add actions'
    zone-map stats carry across so file skipping works immediately. The
    Delta table is never touched; subsequent vintage mutations are
    copy-on-write into the vintage directory.

    PARTITIONED tables import zero-copy too: the log-carried
    partitionValues land in the vintage per-file constant-column sidecar
    (``_vintage_log/file_partitions.json``) and reads re-attach them via
    a broadcast map join — O(metadata) import for the most common
    large-table layout; they also merge into the carried zone maps
    (min = max = value), so ``read_where`` prunes on partition columns
    immediately.

    Refused loudly (import via ``write(reader.read())`` instead, which
    materializes): column-mapped tables (the files' physical names would
    not match the logical schema vintage reads with).

    Same caveat as Delta's shallow clone: the SOURCE does not know the
    import exists — vacuuming the source can delete files the import
    still references."""
    from sdlt_spark.store.vintage import VintageTable

    reader = DeltaTableReader(spark, delta_path)
    snap = reader.snapshot()
    if snap.mapping:
        raise DeltaProtocolError(
            "import of a column-mapped Delta table is not zero-copy-able "
            "(data files carry physical column names); materialize instead"
        )
    dest = VintageTable(spark, dest_path)
    src_root = reader.path
    rel_add = [
        os.path.relpath(os.path.join(src_root, rel), dest.path)
        for rel in sorted(snap.files)
    ]
    dv_rows = None
    if snap.dvs:
        # roaring descriptors expand to (file, pos) rows EXECUTOR-side —
        # the driver ships O(#DVs) descriptors, never the deleted-row
        # positions themselves (same invariant as _anti_join_dvs)
        desc_rows = [
            (os.path.normpath(os.path.join(src_root, rel)), json.dumps(desc))
            for rel, desc in sorted(snap.dvs.items())
        ]
        desc_df = spark.createDataFrame(
            desc_rows, "file string, descriptor string"
        ).repartition(min(len(desc_rows), 64))

        def _expand(batches):
            import pandas as pd

            from sdlt_spark.store.delta_dv import dv_positions as _dvp

            for pdf in batches:
                for abs_ref, dj in zip(pdf["file"], pdf["descriptor"]):
                    yield pd.DataFrame(
                        {
                            "file": abs_ref,
                            "pos": _dvp(json.loads(dj), src_root),
                        }
                    )

        dv_rows = desc_df.mapInPandas(_expand, "file string, pos long")
    # carry the add actions' zone maps across (vintage stats shape); only
    # values the vintage pruner's contract allows (int/float/str — the
    # same filter _read_footer_stats applies; Delta stores e.g. nested
    # struct stats as dicts, which must not reach _prune_by_range)
    def _clean(d: dict) -> dict:
        return {
            k: v for k, v in (d or {}).items() if isinstance(v, (int, float, str))
        }

    # partition values: the spec's raw strings per file, keyed by the
    # LOGICAL column name (import refuses column mapping, so logical ==
    # physical); typed copies merge into the zone maps (min = max = value)
    # so read_where prunes partitioned imports with zero extra machinery
    part_types = {
        f.name: f.dataType.simpleString()
        for f in snap.schema.fields
        if f.name in set(snap.partition_columns)
    }

    def _typed(col: str, raw):
        if raw is None:
            return None
        t = part_types.get(col, "")
        try:
            if t in ("int", "bigint", "smallint", "tinyint"):
                return int(raw)
            if t in ("double", "float"):
                return float(raw)
        except (TypeError, ValueError):
            return raw
        return raw

    stats = {}
    partitions = {}
    for rel, out_rel in zip(sorted(snap.files), rel_add):
        st = snap.stats.get(rel)
        if st:
            stats[out_rel] = {
                "rows": st.get("numRecords", 0),
                "min": _clean(st.get("minValues")),
                "max": _clean(st.get("maxValues")),
            }
        pvals = snap.files[rel]
        if snap.partition_columns and pvals:
            partitions[out_rel] = {c: pvals.get(c) for c in snap.partition_columns}
            zone = stats.setdefault(out_rel, {"min": {}, "max": {}})
            for c in snap.partition_columns:
                tv = _typed(c, pvals.get(c))
                if tv is not None:
                    zone.setdefault("min", {})[c] = tv
                    zone.setdefault("max", {})[c] = tv
    dest._bootstrap_v0(
        rel_add,
        dv_rows,
        stats,
        "IMPORT",
        {"source": src_root, "sourceVersion": str(snap.version)},
        snap.schema.json(),
        partitions=partitions or None,
    )
    # CHECK constraints carry over (delta.constraints.* in the table
    # configuration) so writes to the import keep enforcing the source's
    # invariants — each lands as its own commit, same as add_constraint
    for key, expr in sorted((snap.metadata.get("configuration") or {}).items()):
        if key.startswith("delta.constraints."):
            dest.add_constraint(key[len("delta.constraints.") :], expr)
    return dest
