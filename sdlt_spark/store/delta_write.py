"""Minimal Delta Lake log WRITER: emit a spec-conformant ``_delta_log``
so tables produced here are readable by real delta-spark (and by this
repo's own ``DeltaTableReader``).

Two uses:

- building byte-level Delta fixtures for interop tests (hand-authored
  commits, checkpoints, URL-encoded paths);
- ``export_vintage_to_delta``: publish a ``VintageTable`` snapshot as a
  Delta table — the bridge back to the reference's on-disk contract
  (/root/reference/README.md:92 writes ``format("delta")``), so a
  downstream system that only speaks Delta can consume tables maintained
  by this engine. Metadata-only: data files are hard-linked (same-device)
  or left in place is NOT an option for Delta (paths must resolve under
  the table root), so link-else-copy per file.

Only writer features of protocol (1, 2) are emitted — plain adds/removes,
no DVs/column-mapping — which is exactly what the read shim and stock
Delta readers accept everywhere.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.parse
import uuid

_LOG = "_delta_log"


class DeltaLogWriter:
    """Append spec-shaped commits to a ``_delta_log``. The caller supplies
    relative data-file paths it has already written under the table root."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        self.log_dir = os.path.join(self.path, _LOG)
        os.makedirs(self.log_dir, exist_ok=True)

    def _next_version(self) -> int:
        versions = [
            int(f[:-5])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        ]
        return max(versions) + 1 if versions else 0

    def commit(
        self,
        adds: list[tuple[str, dict]] | None = None,
        removes: list[str] | None = None,
        schema_json: str | None = None,
        partition_columns: list[str] | None = None,
        operation: str = "WRITE",
        collect_stats: bool = True,
        stats_override: dict[str, dict] | None = None,
        dvs: dict[str, dict] | None = None,
    ) -> int:
        """One commit: ``adds`` = (relative path, partitionValues) pairs,
        ``removes`` = relative paths. The first commit must carry
        ``schema_json`` (a Spark StructType json) — it becomes the
        metaData action; later commits repeat metaData only when the
        schema changes (pass it again to evolve).

        ``dvs`` maps a relative path to a ``deletionVector`` descriptor
        (see :mod:`sdlt_spark.store.delta_dv`) attached to that add action
        — how Delta's DELETE records row-level deletes without rewriting
        the file. A table carrying DVs needs reader protocol v3, emitted
        automatically.

        ``collect_stats`` records Delta's per-file zone maps (numRecords +
        minValues/maxValues from the parquet footer — metadata-only reads)
        in each add action's ``stats`` field, so stock Delta readers AND
        :class:`~sdlt_spark.store.delta_read.DeltaTableReader.read_where`
        can file-skip. ``stats_override`` maps relative path to an
        already-known ``{"rows", "min", "max"}`` zone (the VintageTable
        stats shape) to avoid re-reading footers on export."""
        version = self._next_version()
        ts = int(time.time() * 1000)
        actions: list[dict] = []
        if dvs:
            # DV-bearing tables are protocol (3, 7) with the feature named
            # — emitted as an upgrade action when the first DV arrives
            # after table creation (spec-legal in any commit)
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors"],
                        "writerFeatures": ["deletionVectors"],
                    }
                }
            )
        elif version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
        if version == 0 and schema_json is None:
            raise ValueError("first Delta commit needs schema_json")
        if schema_json is not None:
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_json,
                        "partitionColumns": partition_columns or [],
                        "configuration": {},
                        "createdTime": ts,
                    }
                }
            )
        for rel, pvals in adds or []:
            abs_f = os.path.join(self.path, rel)
            add = {
                # Delta URL-encodes paths (spaces, '#', ...)
                "path": urllib.parse.quote(rel),
                # spec: values are strings, a null partition value is JSON
                # null (not the string "None")
                "partitionValues": {
                    k: (None if v is None else str(v))
                    for k, v in (pvals or {}).items()
                },
                "size": os.path.getsize(abs_f) if os.path.exists(abs_f) else 0,
                "modificationTime": ts,
                "dataChange": True,
            }
            if dvs and rel in dvs:
                add["deletionVector"] = dvs[rel]
            zone = (stats_override or {}).get(rel)
            if zone is None and collect_stats and os.path.exists(abs_f):
                try:
                    from sdlt_spark.store.vintage import _read_footer_stats

                    zone = _read_footer_stats(abs_f)
                except Exception:
                    zone = None  # stats are an optimization, never a blocker
            if zone is not None:
                add["stats"] = json.dumps(
                    {
                        "numRecords": zone.get("rows", 0),
                        "minValues": zone.get("min", {}),
                        "maxValues": zone.get("max", {}),
                    }
                )
            actions.append({"add": add})
        for rel in removes or []:
            actions.append(
                {
                    "remove": {
                        "path": urllib.parse.quote(rel),
                        "deletionTimestamp": ts,
                        "dataChange": True,
                    }
                }
            )
        actions.append(
            {
                "commitInfo": {
                    "timestamp": ts,
                    "operation": operation,
                    "operationParameters": {},
                }
            }
        )
        final = os.path.join(self.log_dir, f"{version:020d}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write("\n".join(json.dumps(a) for a in actions) + "\n")
        # same atomic CAS publish discipline as the vintage log
        try:
            os.link(tmp, final)
        except FileExistsError:
            os.remove(tmp)
            raise
        os.remove(tmp)
        return version


def export_vintage_to_delta(vintage, dest_path: str) -> int:
    """Publish the current snapshot of a ``VintageTable`` as a brand-new
    Delta table a stock Delta reader can open. Deletion vectors are
    materialized on the SOURCE first if present (exporting raw files would
    resurrect DV-deleted rows; Delta DV sidecars use a roaring-bitmap
    format this writer doesn't emit). Data files are hard-linked when the
    filesystem allows (zero-copy export), else copied."""
    dest = os.path.abspath(dest_path)
    if os.path.isdir(os.path.join(dest, _LOG)):
        raise FileExistsError(f"{dest} is already a Delta table")
    vintage.materialize_deletion_vectors()
    files = vintage._live_files()
    src_stats = vintage._file_stats()
    os.makedirs(os.path.join(dest, "data"), exist_ok=True)
    adds: list[tuple[str, dict]] = []
    stats_override: dict[str, dict] = {}
    for i, rel in enumerate(sorted(files)):
        src = os.path.normpath(os.path.join(vintage.path, rel))
        out_rel = f"data/part-{i:05d}-{uuid.uuid4().hex}.parquet"
        out_abs = os.path.join(dest, out_rel)
        try:
            os.link(src, out_abs)
        except OSError:
            shutil.copy2(src, out_abs)
        adds.append((out_rel, {}))
        if rel in src_stats:
            # carry the vintage zone maps across (no footer re-reads)
            stats_override[out_rel] = src_stats[rel]
    writer = DeltaLogWriter(dest)
    return writer.commit(
        adds=adds,
        schema_json=vintage._schema_at().json(),
        partition_columns=[],
        operation="WRITE",
        stats_override=stats_override,
    )
