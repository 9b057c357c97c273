"""Row-level mutations — DELETE / UPDATE / MERGE — on Delta tables this
engine writes or imports (the write-side twin of
:mod:`sdlt_spark.store.delta_read`): the reference mutates its store
in place (``/root/reference/README.md:125-130`` MERGE,
``README.md:281`` predicate DELETE), and a user whose tables live in the
open Delta format needs the same verbs against ``_delta_log`` directly,
producing spec-conforming commits that stock delta-spark replays.

All three verbs share the delta-spark copy-on-write shape:

1. **Find touched files** — one scan of the live files with the
   ``__delta_path`` identity key, filtered by the predicate (or
   semi-joined with the source keys), reduced to a DISTINCT file list.
   Catalyst pushes the predicate into the parquet scan, so at 100 TB
   this phase reads only row groups whose footer zones can match; the
   driver materializes O(touched files) paths, never rows.
2. **Rewrite only the touched files** — survivors/updated rows write as
   new files (partition columns stay log-only, Delta's layout); every
   untouched file is carried by reference in the commit. A predicate
   touching 0.1% of files rewrites 0.1% of the table.
3. **One commit** — ``remove`` actions name the canceled logical file's
   ``(path, deletionVector uniqueId)`` identity, adds carry
   partitionValues + footer stats.

``delete(mode="dv")`` is merge-on-read instead: matched row POSITIONS
are written as roaring deletion-vector sidecars (built executor-side,
grouped per file — the driver never sees a row position), the data files
stay untouched, and the commit swaps each logical file for the same path
with the new descriptor. Prior DVs union in, so re-deleting is a no-op.

CDF: when the table sets ``delta.enableChangeDataFeed=true``, every verb
also writes ``_change_data/`` parquet and names it in ``cdc`` actions —
PROTOCOL.md requires CDF readers to use those INSTEAD of deriving from
add/remove, which is what lets an UPDATE surface as
``update_preimage``/``update_postimage`` (and a MERGE as its true
update/insert/delete mix) rather than delete+insert. On tables without
the flag, commits stay derivation-shaped (plain add/remove), exactly
what stock readers fall back to.

Column-mapped tables (``name`` and ``id`` modes) mutate too: rewritten
files are written under each column's PHYSICAL name with its parquet
field id attached (top-level via the alias metadata Spark's parquet
writer honors, nested via the physical cast type), so both this repo's
reader and stock delta-spark keep resolving them; predicates,
assignments and constraints stay in LOGICAL names throughout.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, functions as F

from sdlt_spark.store.delta_read import DeltaTableReader
from sdlt_spark.store.delta_write import DeltaCommitConflictError, DeltaLogWriter
from sdlt_spark.store.paths import decode_hive_segments

# Delta's optimistic concurrency, conservative flavor: every verb derives
# its touched-file set and rewrite from ONE snapshot and commits with
# expected_version = snapshot + 1. If any other writer committed first —
# an append whose rows might match the predicate, a compaction that
# rewrote a touched file, another mutation — the CAS loses and the WHOLE
# operation recomputes against the fresh snapshot (never a blind
# re-publish: two writers rewriting one file would otherwise duplicate
# its rows, and a remove of an already-removed logical file would
# resurrect the winner's output). Recompute-everything is strictly more
# conservative than delta-spark's per-exception conflict matrix
# (ConcurrentAppend / ConcurrentDeleteRead / ConcurrentDeleteDelete):
# it serializes every interleaving it would reject, at the cost of
# retrying some it would allow. Data files placed by a losing attempt
# are removed immediately (vacuum's orphan sweep would also reclaim
# them, but a retry loop shouldn't leak O(retries) copies).
_MUTATION_RETRIES = 5


def _mutate(spark, dest_path: str, attempt) -> int:
    last: Exception | None = None
    for _ in range(_MUTATION_RETRIES):
        dest, reader, snap = _open(spark, dest_path)
        writer = DeltaLogWriter(dest)
        placed: list[str] = []
        try:
            version = attempt(dest, reader, snap, writer, placed)
        except DeltaCommitConflictError as exc:
            last = exc
            for rel in placed:
                try:
                    os.remove(os.path.join(dest, rel))
                except OSError:
                    pass
            continue
        # delta.checkpointInterval (delta-spark checkpoints every N
        # commits; its default is 10): bounded replay for long-lived
        # mutation streams. Failure here never fails the mutation — the
        # commit is already durable, the checkpoint is an optimization.
        cfg = (snap.metadata or {}).get("configuration") or {}
        try:
            interval = int(cfg.get("delta.checkpointInterval", 0))
        except (TypeError, ValueError):
            interval = 0
        if interval > 0 and version > 0 and version % interval == 0:
            try:
                writer.write_checkpoint(version)
            except Exception:  # noqa: BLE001
                pass
        return version
    raise last


def _open(spark, dest_path: str):
    dest = os.path.abspath(dest_path)
    reader = DeltaTableReader(spark, dest)
    snap = reader.snapshot()
    return dest, reader, snap


def _row_tracking(snap):
    """``(mat_rid, mat_rcv, needs_config)`` when the table has Row
    Tracking enabled, else None. ``needs_config`` is True when the
    materialized column names are not yet in the table configuration (a
    fresh delta-spark table before its first rewrite) — the mutation's
    commit then declares them, exactly as delta-spark does on first
    materialization. A rewrite that ignored tracking would silently
    re-number every surviving row."""
    from sdlt_spark.store.delta_read import DeltaTableReader
    from sdlt_spark.store.delta_write import (
        MATERIALIZED_ROW_COMMIT_COL,
        MATERIALIZED_ROW_ID_COL,
    )

    cfg = snap.metadata.get("configuration") or {}
    wf = set(snap.protocol.get("writerFeatures") or [])
    if cfg.get("delta.enableRowTracking") != "true" and "rowTracking" not in wf:
        return None
    mat_rid, mat_rcv = DeltaTableReader._row_tracking_cols(snap)
    needs_config = not (mat_rid and mat_rcv)
    return (
        mat_rid or MATERIALIZED_ROW_ID_COL,
        mat_rcv or MATERIALIZED_ROW_COMMIT_COL,
        needs_config,
    )


def _tracked_read(reader, snap, rels):
    """Touched-file read carrying row_id / row_commit_version (plus the
    __delta_path/__delta_pos keys, dropped by the caller)."""
    extras = [c for c in reader._row_tracking_cols(snap) if c]
    df = reader._read_file_subset(
        snap, rels, keep_path=True, extra_physical=extras
    )
    df = reader._attach_row_ids(snap, df, rels)
    return df.drop("__delta_path", "__delta_pos", *extras)


def _tracking_commit_kwargs(dest, reader, snap, adds, tracking):
    """Commit kwargs a rewrite on a row-tracked table must carry: fresh
    disjoint baseRowId ranges for the new files (+ the bumped high-water
    mark), and — first time only — the metaData re-emit declaring the
    materialized column names."""
    from sdlt_spark.store.delta_write import allocate_base_row_ids

    _mat_rid, _mat_rcv, needs_config = tracking
    rels = [rel for rel, _ in adds]
    base_ids, hwm = allocate_base_row_ids(
        dest, rels, prior_hwm=reader.row_id_high_water_mark(snap)
    )
    out = {"base_row_ids": base_ids, "row_id_high_water_mark": hwm}
    if needs_config:
        from sdlt_spark.store.delta_write import row_tracking_configuration

        cfg = dict(snap.metadata.get("configuration") or {})
        cfg.update(row_tracking_configuration())
        out["schema_json"] = snap.metadata.get(
            "schemaString", snap.schema.json()
        )
        out["partition_columns"] = snap.partition_columns
        out["configuration"] = cfg
    return out


def _cdf_enabled(snap) -> bool:
    cfg = snap.metadata.get("configuration") or {}
    return str(cfg.get("delta.enableChangeDataFeed", "")).lower() == "true"


def _write_change_files(
    dest: str, df: DataFrame, n_files: int, snap=None
) -> list[tuple[str, dict]]:
    """Write change rows (table columns + ``_change_type``) as
    ``_change_data/`` parquet — PROTOCOL.md "Add CDC File": when a commit
    carries ``cdc`` actions, CDF readers use them INSTEAD of deriving
    changes from add/remove, which is what lets an UPDATE surface as
    update_preimage/update_postimage rather than delete+insert. On a
    partitioned table, change files are written partitioned like data
    files (``_change_data/<col>=<val>/...``) and each cdc action carries
    its file's partitionValues — PROTOCOL.md requires it, and stock
    delta-spark CDF readers populate partition columns from the ACTION,
    not the parquet, so an empty map would read as null partition values
    there. Same staged-write discipline as data files; zero-row parts
    drop out. Returns ``(rel path, partitionValues)`` pairs for
    ``DeltaLogWriter.commit(cdc=...)``."""
    pcols: list[str] = []
    if snap is not None and snap.partition_columns:
        pcols = [snap.physical_name(c) for c in snap.partition_columns]
    staging = os.path.join(dest, f".staging-{uuid.uuid4().hex}")
    rels: list[tuple[str, dict]] = []
    try:
        w = df.repartition(max(1, n_files), *pcols) if pcols else df.repartition(
            max(1, n_files)
        )
        writer = w.write.mode("errorifexists")
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(staging)
        os.makedirs(os.path.join(dest, "_change_data"), exist_ok=True)
        for dirpath, dirs, files in os.walk(staging):
            dirs.sort()
            relscope = os.path.relpath(dirpath, staging)
            pvals: dict = {}
            if relscope != ".":
                pvals = decode_hive_segments(relscope.split(os.sep))
            for fname in sorted(files):
                if not fname.endswith(".parquet"):
                    continue
                abs_part = os.path.join(dirpath, fname)
                z = _zone(abs_part)
                if z is not None and z.get("rows", 0) == 0:
                    continue
                sub = "" if relscope == "." else relscope.replace(os.sep, "/") + "/"
                rel = f"_change_data/{sub}cdc-{uuid.uuid4().hex}.parquet"
                os.makedirs(
                    os.path.dirname(os.path.join(dest, rel)), exist_ok=True
                )
                os.replace(abs_part, os.path.join(dest, rel))
                rels.append((rel, pvals))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return rels


def _cdc_physical(change: DataFrame, snap) -> DataFrame:
    """Change rows (logical names + _change_type) -> the table's physical
    column names, the same translation data files get."""
    out, _parts = _to_physical(change, snap, extra_cols=("_change_type",))
    return out


def _to_physical(df: DataFrame, snap, extra_cols: tuple[str, ...] = ()):
    """Rename a LOGICAL-schema rewrite result to the table's PHYSICAL
    column names for writing, attaching each field's parquet field id
    (``delta.columnMapping.id``) — top-level ids ride the alias metadata
    (which Spark's parquet writer emits when
    ``spark.sql.parquet.fieldId.write.enabled`` is on), nested ids ride
    the physical cast type. Returns (df, physical partition columns);
    identity on unmapped tables."""
    from sdlt_spark.store.delta_read import _field_id_meta, _physical_type

    if not snap.mapping:
        return df, list(snap.partition_columns)
    # field-id EMISSION is scoped to the actual write (_write_data_files
    # wraps it in _with_parquet_field_ids) — setting the session conf here
    # would leak the behavior change to every later unrelated write
    cols = []
    for f in snap.schema.fields:
        c = F.col(f.name).cast(_physical_type(f.dataType, with_ids=True))
        meta = _field_id_meta(f, with_ids=True)
        phys = snap.physical_name(f.name)
        cols.append(c.alias(phys, metadata=meta) if meta else c.alias(phys))
    # hidden columns (materialized row ids) are already physical: no
    # logical mapping, no field id — carried verbatim
    cols.extend(F.col(c) for c in extra_cols)
    return df.select(*cols), [
        snap.physical_name(c) for c in snap.partition_columns
    ]


def _enforce_constraints(df: DataFrame, snap) -> None:
    """delta-spark's write-side invariant enforcement: rows an UPDATE or
    MERGE is about to publish must satisfy the table's CHECK constraints
    (``delta.constraints.*`` in the metaData configuration) and NOT NULL
    columns (``nullable: false`` in the schema) — a mutation that could
    sneak violating rows past them would break every downstream reader
    relying on the invariant. ONE aggregation pass counts violations of
    every constraint simultaneously (no per-constraint job); tables
    without constraints skip the scan entirely."""
    config = (snap.metadata or {}).get("configuration") or {}
    labeled = [
        (
            f"CHECK constraint {k[len('delta.constraints.'):]} ({v})",
            ~F.coalesce(F.expr(v).cast("boolean"), F.lit(True)),
        )
        for k, v in sorted(config.items())
        if k.startswith("delta.constraints.")
    ] + [
        (
            f"NOT NULL constraint on column {f.name}",
            F.col(f.name).isNull(),
        )
        for f in snap.schema.fields
        if not f.nullable
    ]
    if not labeled:
        return
    counts = df.agg(
        *[
            F.sum(F.when(bad, 1).otherwise(0)).alias(f"c{i}")
            for i, (_label, bad) in enumerate(labeled)
        ]
    ).first()
    from sdlt_spark.store.vintage import ConstraintViolationError

    for i, (label, _bad) in enumerate(labeled):
        n = counts[f"c{i}"]
        if n:
            raise ConstraintViolationError(
                f"{label} violated by {n} row(s) this mutation would "
                "write; aborted before commit"
            )


def _check_append_only(snap, verb: str) -> None:
    """``delta.appendOnly=true`` (the appendOnly writer feature, v2):
    row-deleting / row-modifying commits are forbidden — the whole point
    of the flag is that downstream consumers may assume rows never
    disappear. delta-spark raises the same way."""
    cfg = (snap.metadata or {}).get("configuration") or {}
    if str(cfg.get("delta.appendOnly", "")).lower() == "true":
        raise ValueError(
            f"{verb} is not allowed on an append-only table "
            "(delta.appendOnly=true)"
        )


def _identity_columns(snap) -> dict[str, dict]:
    """Fields carrying ``delta.identity.*`` metadata (PROTOCOL.md
    "Identity Columns", the identityColumns writer feature, v6) ->
    {start, step, hwm, explicit}."""
    out = {}
    for f in snap.schema.fields:
        md = f.metadata or {}
        if "delta.identity.start" in md or "delta.identity.step" in md:
            hwm = md.get("delta.identity.highWaterMark")
            out[f.name] = {
                "start": int(md.get("delta.identity.start", 1)),
                "step": int(md.get("delta.identity.step", 1)),
                "hwm": None if hwm is None else int(hwm),
                "explicit": bool(
                    md.get("delta.identity.allowExplicitInsert", False)
                ),
            }
    return out


def _bump_identity_hwm(schema_str: str, updates: dict[str, int]) -> str:
    """Re-emit the schemaString with each identity column's
    ``delta.identity.highWaterMark`` advanced — how Delta records
    identity allocation state (it lives in field metadata, not
    domainMetadata)."""
    d = json.loads(schema_str)
    for f in d.get("fields", []):
        if f.get("name") in updates:
            f.setdefault("metadata", {})[
                "delta.identity.highWaterMark"
            ] = updates[f["name"]]
    return json.dumps(d)


def _generated_columns(snap) -> dict[str, str]:
    """Columns whose field metadata carries ``delta.generationExpression``
    (PROTOCOL.md "Generated Columns" / the generatedColumns writer
    feature) -> their SQL expressions."""
    out = {}
    for f in snap.schema.fields:
        expr = (f.metadata or {}).get("delta.generationExpression")
        if expr:
            out[f.name] = expr
    return out


def _enforce_generated(df: DataFrame, snap) -> None:
    """Generated-column enforcement, delta-spark's write-side contract:
    every row about to be written must satisfy
    ``col <=> generationExpression`` (null-safe — a generated column may
    legitimately be null when its inputs are). Piggybacks on the same
    one-aggregation-pass shape as :func:`_enforce_constraints`; tables
    without generated columns skip the scan entirely."""
    gen = _generated_columns(snap)
    if not gen:
        return
    types = {f.name: f.dataType for f in snap.schema.fields}
    labeled = [
        (
            f"generated column {c} ({expr})",
            ~F.col(c).eqNullSafe(F.expr(expr).cast(types[c])),
        )
        for c, expr in sorted(gen.items())
    ]
    counts = df.agg(
        *[
            F.sum(F.when(bad, 1).otherwise(0)).alias(f"g{i}")
            for i, (_label, bad) in enumerate(labeled)
        ]
    ).first()
    from sdlt_spark.store.vintage import ConstraintViolationError

    for i, (label, _bad) in enumerate(labeled):
        n = counts[f"g{i}"]
        if n:
            raise ConstraintViolationError(
                f"{label} violated by {n} row(s) this mutation would "
                "write; aborted before commit"
            )


def _touched_rels(reader, snap, matched: DataFrame) -> list[str]:
    """DISTINCT ``__delta_path`` of the matched rows, mapped back to
    log-relative paths. O(touched files) on the driver."""
    by_abs = {reader._fs_path(rel): rel for rel in snap.files}
    rows = matched.select("__delta_path").distinct().collect()
    return sorted(by_abs[r["__delta_path"]] for r in rows)


def _zone(abs_f: str):
    from sdlt_spark.store.vintage import _read_footer_stats

    try:
        return _read_footer_stats(abs_f)
    except Exception:
        return None  # stats are an optimization, never a blocker


def _removes(snap, rels: list[str]) -> list:
    """Remove actions naming each canceled logical file's (path, dvId)
    identity — a bare path remove would not reconcile against a
    DV-bearing add for spec-conforming readers. The file's REAL partition
    values ride as the third element (extendedFileMetadata promises
    them; an empty map on a partitioned table is a spec-shape
    violation that partition-pruning tooling would misread)."""
    return [
        (rel, snap.dvs[rel], snap.files.get(rel) or {})
        if rel in snap.dvs
        else rel
        for rel in rels
    ]


def _write_data_files(
    dest: str, df: DataFrame, partition_columns: list[str], n_files: int | None
):
    """Write logical rows as Delta-layout data files: partition columns
    partitionBy into Hive dirs during the staged write (so the files
    themselves don't contain them — Delta's layout) and come back as each
    add's ``partitionValues``. Staged under ``.staging-*`` (excluded from
    vacuum's orphan sweep) and os.replace'd into ``data/`` so a crash
    mid-write leaves no half-visible files. Zero-row parts are dropped.
    Returns ``(adds, stats_override)`` in DeltaLogWriter.commit's shape."""
    staging = os.path.join(dest, f".staging-{uuid.uuid4().hex}")
    adds: list[tuple[str, dict]] = []
    stats: dict[str, dict] = {}
    try:
        out = df
        if n_files:
            out = (
                out.repartition(n_files, *partition_columns)
                if partition_columns
                else out.repartition(n_files)
            )
        writer = out.write.mode("errorifexists")
        if partition_columns:
            writer = writer.partitionBy(*partition_columns)
        from sdlt_spark.store.delta_write import _with_parquet_field_ids

        with _with_parquet_field_ids(df.sparkSession):
            writer.parquet(staging)
        pending = []
        for dirpath, _dirs, files in os.walk(staging):
            relpart = os.path.relpath(dirpath, staging)
            pvals: dict = {}
            if relpart != ".":
                segs = relpart.split(os.sep)
                if not all("=" in s for s in segs):
                    continue
                pvals = decode_hive_segments(segs)
            for fname in sorted(files):
                if not fname.endswith(".parquet"):
                    continue
                abs_part = os.path.join(dirpath, fname)
                z = _zone(abs_part)
                if z is not None and z.get("rows", 0) == 0:
                    continue  # empty part adds nothing to the table
                rel = f"data/part-{uuid.uuid4().hex}.parquet"
                pending.append((abs_part, rel, pvals, z))
        os.makedirs(os.path.join(dest, "data"), exist_ok=True)
        for staged, rel, pvals, z in pending:
            os.replace(staged, os.path.join(dest, rel))
            adds.append((rel, pvals))
            if z is not None:
                stats[rel] = z
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return adds, stats


def delete_delta_export(
    dest_path: str, spark, condition: str, mode: str = "cow"
) -> int:
    """Predicate DELETE against a written Delta table.

    ``mode="cow"``: rewrite only the files containing matching rows,
    keeping rows where the predicate is FALSE **or NULL** (SQL DELETE
    removes only rows where it is true). ``mode="dv"``: record matched
    positions as roaring deletion-vector sidecars — O(matched rows)
    written, zero data files rewritten; the right shape for point/GDPR
    deletes on a 100 TB table. Returns the committed version."""
    if mode not in ("cow", "dv"):
        raise ValueError(f"mode={mode!r}; expected 'cow' or 'dv'")

    def _attempt(dest, reader, snap, writer, placed):
        _check_append_only(snap, "DELETE")
        cond = F.expr(condition)
        params = {"predicate": condition}
        if mode == "dv":
            return _delete_dv(dest, reader, snap, writer, cond, params, placed)
        live = sorted(snap.files)
        keyed = reader._read_file_subset(snap, live, keep_path=True)
        touched = _touched_rels(reader, snap, keyed.filter(cond))
        if not touched:
            return writer.commit(operation="DELETE", operation_params=params)
        tracking = _row_tracking(snap)
        extra_cols: tuple[str, ...] = ()
        if tracking:
            # surviving rows are UNCHANGED: they carry their stable row id
            # and original row commit version into the rewritten file as
            # materialized columns (delta-spark's DELETE contract)
            mat_rid, mat_rcv, _ = tracking
            rows = _tracked_read(reader, snap, touched)
            survivors = rows.filter(~F.coalesce(cond, F.lit(False)))
            survivors = survivors.withColumnRenamed(
                "row_id", mat_rid
            ).withColumnRenamed("row_commit_version", mat_rcv)
            extra_cols = (mat_rid, mat_rcv)
        else:
            rows = reader._read_file_subset(snap, touched)  # DV-applied
            survivors = rows.filter(~F.coalesce(cond, F.lit(False)))
        logical = [f.name for f in snap.schema.fields]
        cdc_rels: list[str] = []
        if _cdf_enabled(snap):
            change = (
                rows.filter(F.coalesce(cond, F.lit(False)))
                .select(*logical)
                .withColumn("_change_type", F.lit("delete"))
            )
            cdc_rels = _write_change_files(
                dest, _cdc_physical(change, snap), len(touched), snap=snap
            )
            placed.extend(r for r, _ in cdc_rels)
        out, part_cols = _to_physical(survivors, snap, extra_cols)
        adds, stats = _write_data_files(
            dest, out, part_cols, n_files=len(touched)
        )
        placed.extend(rel for rel, _ in adds)
        extra_kwargs = (
            _tracking_commit_kwargs(dest, reader, snap, adds, tracking)
            if tracking
            else {}
        )
        return writer.commit(
            adds=adds,
            removes=_removes(snap, touched),
            stats_override=stats,
            cdc=cdc_rels or None,
            operation="DELETE",
            operation_params=params,
            expected_version=snap.version + 1,
            **extra_kwargs,
        )

    return _mutate(spark, dest_path, _attempt)


def _delete_dv(dest, reader, snap, writer, cond, params, placed) -> int:
    """Merge-on-read DELETE: per touched file, union the newly matched
    positions with the file's prior DV (the scan already excludes
    prior-DV rows, so re-deleting is a no-op) and write ONE new roaring
    sidecar — executor-side via applyInPandas grouped on the file path;
    the driver ships only O(#DV'd files) descriptors, never positions."""
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    live = sorted(snap.files)
    keyed = reader._read_file_subset(snap, live, keep_path=True)
    cdc_rels: list[str] = []
    if _cdf_enabled(snap):
        logical = [f.name for f in snap.schema.fields]
        change = (
            keyed.filter(cond)
            .select(*logical)
            .withColumn("_change_type", F.lit("delete"))
        )
        cdc_rels = _write_change_files(
            dest, _cdc_physical(change, snap), n_files=4, snap=snap
        )
        placed.extend(r for r, _ in cdc_rels)
    matched = keyed.filter(cond).select(
        F.col("__delta_path").alias("path"), F.col("__delta_pos").alias("pos")
    )
    old_desc = {
        reader._fs_path(rel): json.dumps(desc) for rel, desc in snap.dvs.items()
    }
    old_b = reader.spark.sparkContext.broadcast(old_desc)
    root = dest

    def _build(pdf):
        import uuid as _uuid

        import pandas as _pd

        from sdlt_spark.store.delta_dv import dv_positions, write_dv_file

        abs_path = pdf["path"].iloc[0]
        pos = set(int(p) for p in pdf["pos"])
        prior = old_b.value.get(abs_path)
        if prior:
            pos |= set(dv_positions(json.loads(prior), root))
        desc = write_dv_file(root, sorted(pos), str(_uuid.uuid4()))
        return _pd.DataFrame(
            {"path": [abs_path], "descriptor": [json.dumps(desc)]}
        )

    descs = (
        matched.groupBy("path")
        .applyInPandas(_build, "path string, descriptor string")
        .collect()
    )
    if not descs:
        return writer.commit(operation="DELETE", operation_params=params)
    by_abs = {reader._fs_path(rel): rel for rel in snap.files}
    new_dvs = {by_abs[r["path"]]: json.loads(r["descriptor"]) for r in descs}
    from sdlt_spark.store.delta_dv import dv_file_path

    for desc in new_dvs.values():
        abs_dv = dv_file_path(desc, dest)
        if abs_dv:
            placed.append(os.path.relpath(abs_dv, dest))
    touched = sorted(new_dvs)
    params = dict(params, deletionVectors="true")
    from sdlt_spark.store.delta_write import upgraded_dv_protocol

    # a DV re-add names the SAME physical file: it must keep the file's
    # original baseRowId and defaultRowCommitVersion (positions — and so
    # fresh row ids — are untouched by a merge-on-read delete)
    base_row_ids = {
        rel: snap.row_ids[rel][0] for rel in touched if rel in snap.row_ids
    }
    row_commit_versions = {
        rel: snap.row_ids[rel][1]
        for rel in touched
        if rel in snap.row_ids and snap.row_ids[rel][1] is not None
    }
    return writer.commit(
        adds=[(rel, snap.files[rel] or {}) for rel in touched],
        removes=_removes(snap, touched),
        dvs=new_dvs,
        cdc=cdc_rels or None,
        operation="DELETE",
        operation_params=params,
        base_row_ids=base_row_ids or None,
        row_commit_versions=row_commit_versions or None,
        # first DV on the table upgrades the protocol to (3,7) WITH the
        # legacy-implied features carried forward (a bare deletionVectors
        # list would make stock readers drop e.g. columnMapping)
        protocol=upgraded_dv_protocol(snap.protocol),
        expected_version=snap.version + 1,
    )


def update_delta_export(
    dest_path: str, spark, condition: str, assignments: dict[str, str]
) -> int:
    """Predicate UPDATE (copy-on-write): rewrite only the files
    containing matching rows, applying ``assignments`` (SQL expressions
    over the pre-update row, cast to the column's type so a literal
    can't fork the schema) where the predicate is true; NULL-predicate
    rows stay unchanged. Updating a partition column moves rows across
    partitions — the rewrite regroups by the NEW values. Touched files'
    DVs fold in (the rewrite materializes them, delta-spark's UPDATE
    contract). Returns the committed version."""

    def _attempt(dest, reader, snap, writer, placed):
        _check_append_only(snap, "UPDATE")
        types = {f.name: f.dataType for f in snap.schema.fields}
        gen = _generated_columns(snap)
        for c in assignments:
            if c not in types:
                raise KeyError(f"unknown column {c!r}")
            if c in gen:
                # delta-spark rejects direct writes to generated columns;
                # their values recompute below when dependencies change
                raise ValueError(
                    f"column {c} is generated ({gen[c]}) and cannot be "
                    "assigned directly"
                )
            if c in _identity_columns(snap):
                raise ValueError(
                    f"column {c} is an IDENTITY column and cannot be updated"
                )
        cond = F.expr(condition)
        live = sorted(snap.files)
        params = {"predicate": condition}
        keyed = reader._read_file_subset(snap, live, keep_path=True)
        touched = _touched_rels(reader, snap, keyed.filter(cond))
        if not touched:
            return writer.commit(operation="UPDATE", operation_params=params)
        tracking = _row_tracking(snap)
        extra_cols: tuple[str, ...] = ()
        rows = (
            _tracked_read(reader, snap, touched)
            if tracking
            else reader._read_file_subset(snap, touched)
        )
        safe = F.coalesce(cond, F.lit(False))
        id_cols = []
        if tracking:
            # an UPDATE preserves row identity: every row keeps its stable
            # id; rows the predicate touched get the NEW commit as their
            # row commit version, untouched neighbors keep their old one
            mat_rid, mat_rcv, _ = tracking
            extra_cols = (mat_rid, mat_rcv)
            id_cols = [
                F.col("row_id").alias(mat_rid),
                F.when(safe, F.lit(snap.version + 1))
                .otherwise(F.col("row_commit_version"))
                .cast("long")
                .alias(mat_rcv),
            ]
        assign_cols = [
            F.when(safe, F.expr(assignments[f.name]).cast(f.dataType))
            .otherwise(F.col(f.name))
            .alias(f.name)
            if f.name in assignments
            else F.col(f.name)
            for f in snap.schema.fields
        ]
        updated = rows.select(*assign_cols, *id_cols)
        if gen:
            # recompute generated columns over the POST-assignment rows
            # (their expressions may reference updated dependencies);
            # untouched rows recompute to the value they already carry
            updated = updated.withColumns(
                {c: F.expr(e).cast(types[c]) for c, e in gen.items()}
            )
        logical = [f.name for f in snap.schema.fields]
        cdc_rels: list[str] = []
        if _cdf_enabled(snap):
            matched = rows.filter(safe)
            pre = matched.select(*logical).withColumn(
                "_change_type", F.lit("update_preimage")
            )
            post = matched.select(*assign_cols)
            if gen:
                post = post.withColumns(
                    {c: F.expr(e).cast(types[c]) for c, e in gen.items()}
                )
            post = post.withColumn("_change_type", F.lit("update_postimage"))
            cdc_rels = _write_change_files(
                dest,
                _cdc_physical(pre.unionByName(post), snap),
                len(touched),
                snap=snap,
            )
            placed.extend(r for r, _ in cdc_rels)
        _enforce_constraints(updated, snap)
        out, part_cols = _to_physical(updated, snap, extra_cols)
        adds, stats = _write_data_files(
            dest, out, part_cols, n_files=len(touched)
        )
        placed.extend(rel for rel, _ in adds)
        extra_kwargs = (
            _tracking_commit_kwargs(dest, reader, snap, adds, tracking)
            if tracking
            else {}
        )
        return writer.commit(
            adds=adds,
            removes=_removes(snap, touched),
            stats_override=stats,
            cdc=cdc_rels or None,
            operation="UPDATE",
            operation_params=params,
            expected_version=snap.version + 1,
            **extra_kwargs,
        )

    return _mutate(spark, dest_path, _attempt)


def merge_delta_export(
    dest_path: str,
    spark,
    source: DataFrame,
    on: list[str],
    when_matched_delete: str | None = None,
    schema_evolution: bool = False,
) -> int:
    """MERGE (upsert): ``whenMatchedUpdateAll`` + ``whenNotMatchedInsertAll``
    — every source row lands, matched target rows are replaced — plus an
    optional ``when_matched_delete`` predicate (evaluated on the SOURCE
    row) under which a matched key is dropped instead of upserted.
    Source must supply every target column and be unique on ``on``
    (multiple source rows per key would make the result
    order-dependent, which delta-spark rejects too).

    Copy-on-write: files containing matched keys are found with ONE
    semi-join (AQE broadcasts the source side when it fits), only those
    rewrite; unmatched source rows append. Returns the committed
    version."""

    def _attempt(dest, reader, snap, writer, placed):
        new_cols: list[str] = []
        if schema_evolution:
            # delta-spark's autoMerge: source-only columns APPEND to the
            # table schema as nullable fields; the evolved snapshot drives
            # every scan below, so pre-evolution files read the new
            # columns as typed nulls with no rewrite
            import dataclasses

            from pyspark.sql.types import StructField, StructType

            have = {f.name for f in snap.schema.fields}
            new_cols = [c for c in source.columns if c not in have]
            if new_cols and snap.mapping:
                raise ValueError(
                    "schema evolution on a column-mapped table is not "
                    "supported (new fields would need physical names + "
                    "field ids assigned)"
                )
            if new_cols:
                evolved = StructType(
                    list(snap.schema.fields)
                    + [
                        StructField(c, source.schema[c].dataType, True)
                        for c in new_cols
                    ]
                )
                snap = dataclasses.replace(
                    snap,
                    schema=evolved,
                    metadata={
                        **snap.metadata,
                        "schemaString": evolved.json(),
                    },
                )
        tcols = [f.name for f in snap.schema.fields]
        if not schema_evolution:
            # star semantics (updateAll/insertAll) without autoMerge:
            # extra source columns raise like delta-spark, instead of the
            # select below silently discarding them
            extra = sorted(set(source.columns) - set(tcols))
            if extra:
                raise ValueError(
                    f"MERGE source has column(s) {extra} not in the target "
                    "schema; pass schema_evolution=True to add them"
                )
        src = source.select(*tcols)  # errors if a target column is missing
        # duplicate source keys: the kept/incoming split below would land
        # BOTH duplicates (and on a row-tracked table both would inherit
        # one stable row id) — delta-spark raises
        # DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW; one tiny agg
        # validates (the same job class as the identity-column check)
        from pyspark.sql import functions as _F

        chk = src.agg(
            _F.count(_F.lit(1)).alias("n"),
            _F.count_distinct(_F.struct(*on)).alias("nd"),
        ).head()
        if chk["n"] != chk["nd"]:
            raise ValueError(
                f"MERGE source has {chk['n'] - chk['nd']} duplicate key(s) "
                f"on {on} (delta-spark raises here too); de-duplicate the "
                "source first"
            )
        live = sorted(snap.files)
        params = {
            "predicate": " AND ".join(f"{k} = source.{k}" for k in on),
            "clauses": "updateAll,insertAll"
            + (",matchedDelete" if when_matched_delete else ""),
        }
        keyed = reader._read_file_subset(snap, live, keep_path=True)
        touched = _touched_rels(
            reader, snap, keyed.join(src.select(*on).distinct(), on, "left_semi")
        )
        if touched:
            # a MERGE that matches existing keys rewrites rows; a
            # pure-insert merge is still legal on an append-only table
            _check_append_only(snap, "MERGE with matched keys")
        ident = _identity_columns(snap)
        ident_auto = sorted(c for c, s in ident.items() if not s["explicit"])
        types_by_name = {f.name: f.dataType for f in snap.schema.fields}
        if ident_auto:
            # GENERATED ALWAYS AS IDENTITY: the source must not supply
            # values (delta-spark's rule) — matched rows inherit the
            # target's value, inserts get system-assigned ones below
            bad = src.agg(
                *[
                    F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)).alias(
                        f"i{i}"
                    )
                    for i, c in enumerate(ident_auto)
                ]
            ).first()
            for i, c in enumerate(ident_auto):
                if bad[f"i{i}"]:
                    raise ValueError(
                        f"column {c} is GENERATED ALWAYS AS IDENTITY; the "
                        "MERGE source must not supply values for it"
                    )

        def _apply_identity(inc, tgt_rows):
            if not ident_auto:
                return inc
            if tgt_rows is not None:
                # matched source rows keep the TARGET row's identity (an
                # updateAll never rewrites an identity column); min() makes
                # duplicate-keyed targets deterministic
                tgt = tgt_rows.groupBy(*on).agg(
                    *[F.min(c).alias(f"__tgt_{c}") for c in ident_auto]
                )
                inc = inc.join(tgt, on, "left")
                for c in ident_auto:
                    inc = inc.withColumn(c, F.col(f"__tgt_{c}")).drop(
                        f"__tgt_{c}"
                    )
            # inserts: fresh values beyond the high-water mark; the spec
            # allows gaps, so a partition-skewed monotonic id is fine —
            # no global sort, no shuffle
            mid = F.monotonically_increasing_id()
            for c in ident_auto:
                s = ident[c]
                nxt = s["start"] if s["hwm"] is None else s["hwm"] + s["step"]
                inc = inc.withColumn(
                    c,
                    F.coalesce(
                        F.col(c),
                        (F.lit(nxt) + F.lit(s["step"]) * mid).cast(
                            types_by_name[c]
                        ),
                    ),
                )
            return inc

        tracking = _row_tracking(snap)
        extra_cols: tuple[str, ...] = ()
        if tracking:
            mat_rid, mat_rcv, _ = tracking
            extra_cols = (mat_rid, mat_rcv)
        incoming = src
        cdc_rels: list[str] = []
        if touched:
            rows = (
                _tracked_read(reader, snap, touched)
                if tracking
                else reader._read_file_subset(snap, touched)
            )
            kept = rows.join(src.select(*on), on, "left_anti")
            drop_keys = None
            if when_matched_delete is not None:
                del_cond = F.coalesce(F.expr(when_matched_delete), F.lit(False))
                drop_keys = (
                    src.join(rows.select(*on).distinct(), on, "left_semi")
                    .filter(del_cond)
                    .select(*on)
                    .distinct()
                )
                incoming = src.join(drop_keys, on, "left_anti")
            incoming = _apply_identity(incoming, rows)
            if _cdf_enabled(snap):
                # MERGE change feed: replaced target rows surface as
                # update_preimage (the incoming row is the postimage),
                # matched-delete rows as delete, unmatched source rows as
                # insert — the reader then uses these INSTEAD of the
                # commit's add/remove (which would read as delete+insert)
                tgt_matched = rows.join(
                    src.select(*on), on, "left_semi"
                ).select(*tcols)
                if drop_keys is not None:
                    deleted_pre = tgt_matched.join(
                        drop_keys, on, "left_semi"
                    ).withColumn("_change_type", F.lit("delete"))
                    upd_pre = tgt_matched.join(
                        drop_keys, on, "left_anti"
                    ).withColumn("_change_type", F.lit("update_preimage"))
                else:
                    deleted_pre = None
                    upd_pre = tgt_matched.withColumn(
                        "_change_type", F.lit("update_preimage")
                    )
                upd_post = (
                    incoming.join(rows.select(*on), on, "left_semi")
                    .select(*tcols)
                    .withColumn("_change_type", F.lit("update_postimage"))
                )
                ins = (
                    incoming.join(rows.select(*on), on, "left_anti")
                    .select(*tcols)
                    .withColumn("_change_type", F.lit("insert"))
                )
                change = upd_pre.unionByName(upd_post).unionByName(ins)
                if deleted_pre is not None:
                    change = change.unionByName(deleted_pre)
                cdc_rels = _write_change_files(
                    dest,
                    _cdc_physical(change, snap),
                    max(1, len(touched)),
                    snap=snap,
                )
                placed.extend(r for r, _ in cdc_rels)
            if tracking:
                # whenMatchedUpdateAll preserves row identity: a matched
                # source row inherits the target row's stable id with the
                # NEW commit as its row commit version; inserts carry
                # nulls and get FRESH ids from the add's baseRowId + pos.
                # Kept (unmatched) rows carry both through unchanged.
                # Dedupe the target side first: duplicate-keyed target
                # rows would otherwise fan each source row out once per
                # duplicate — a multiplicity change vs the untracked path
                # (one row per source row). min(row_id) keeps the result
                # deterministic; the surviving id is the oldest identity.
                incoming = incoming.join(
                    rows.select(*on, "row_id")
                    .groupBy(*on)
                    .agg(F.min("row_id").alias("row_id")),
                    on,
                    "left",
                ).select(
                    *tcols,
                    F.col("row_id").alias(mat_rid),
                    F.when(
                        F.col("row_id").isNotNull(), F.lit(snap.version + 1)
                    )
                    .cast("long")
                    .alias(mat_rcv),
                )
                kept = kept.withColumnRenamed(
                    "row_id", mat_rid
                ).withColumnRenamed("row_commit_version", mat_rcv)
            new_data = incoming.unionByName(kept)
        else:
            incoming = _apply_identity(incoming, None)
            if tracking:
                incoming = incoming.select(
                    *tcols,
                    F.lit(None).cast("long").alias(mat_rid),
                    F.lit(None).cast("long").alias(mat_rcv),
                )
            new_data = incoming
        _enforce_constraints(new_data, snap)
        # source rows supply generated columns explicitly (MERGE requires
        # every target column): validate them against their expressions
        # rather than silently overwriting what the caller provided
        _enforce_generated(new_data, snap)
        out, part_cols = _to_physical(new_data, snap, extra_cols)
        adds, stats = _write_data_files(
            dest, out, part_cols, n_files=max(1, len(touched))
        )
        placed.extend(rel for rel, _ in adds)
        extra_kwargs = (
            _tracking_commit_kwargs(dest, reader, snap, adds, tracking)
            if tracking
            else {}
        )
        if new_cols:
            # evolved schema re-emits in this commit's metaData (with the
            # existing configuration carried — an absent dict would wipe it)
            extra_kwargs["schema_json"] = snap.metadata["schemaString"]
            extra_kwargs.setdefault(
                "configuration", dict(snap.metadata.get("configuration") or {})
            )
            extra_kwargs.setdefault("partition_columns", snap.partition_columns)
        if ident_auto and adds:
            # advance each identity column's high-water mark from the
            # written files' footer zones (metadata-only — kept rows sit
            # at or below the old mark, so max over all rows is correct);
            # a missing zone falls back to ONE bounded agg over the new
            # files, never the table
            hwm_updates: dict[str, int] = {}
            fallback: list[str] = []
            for c in ident_auto:
                s = ident[c]
                phys = snap.physical_name(c)
                key = "max" if s["step"] > 0 else "min"
                vals = []
                for rel, _pv in adds:
                    z = stats.get(rel) or {}
                    v = (z.get(key) or {}).get(phys)
                    if v is None:
                        fallback.append(c)
                        break
                    vals.append(int(v))
                else:
                    ext = max(vals) if s["step"] > 0 else min(vals)
                    cur = s["hwm"]
                    hwm_updates[c] = (
                        ext
                        if cur is None
                        else (max(cur, ext) if s["step"] > 0 else min(cur, ext))
                    )
            if fallback:
                new_files = [os.path.join(dest, rel) for rel, _pv in adds]
                row = reader.spark.read.parquet(*new_files).agg(
                    *[
                        (
                            F.max(snap.physical_name(c))
                            if ident[c]["step"] > 0
                            else F.min(snap.physical_name(c))
                        ).alias(f"h{i}")
                        for i, c in enumerate(fallback)
                    ]
                ).first()
                for i, c in enumerate(fallback):
                    v = row[f"h{i}"]
                    if v is None:
                        continue
                    s, cur = ident[c], ident[c]["hwm"]
                    v = int(v)
                    hwm_updates[c] = (
                        v
                        if cur is None
                        else (max(cur, v) if s["step"] > 0 else min(cur, v))
                    )
            if hwm_updates:
                base_schema = extra_kwargs.get("schema_json") or snap.metadata.get(
                    "schemaString", snap.schema.json()
                )
                extra_kwargs["schema_json"] = _bump_identity_hwm(
                    base_schema, hwm_updates
                )
                extra_kwargs.setdefault(
                    "configuration",
                    dict(snap.metadata.get("configuration") or {}),
                )
                extra_kwargs.setdefault(
                    "partition_columns", snap.partition_columns
                )
        return writer.commit(
            adds=adds,
            removes=_removes(snap, touched),
            stats_override=stats,
            cdc=cdc_rels or None,
            operation="MERGE",
            operation_params=params,
            expected_version=snap.version + 1,
            **extra_kwargs,
        )

    return _mutate(spark, dest_path, _attempt)
