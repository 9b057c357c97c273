"""Streaming Delta SINK — the write-side twin of the ``delta_cdc``
source: a ``foreachBatch`` target that appends each micro-batch to a
real Delta table (``store/delta_write.DeltaLogWriter``) with
EXACTLY-ONCE semantics across restarts via Delta's setTransaction
(``txnAppId``/``txnVersion``) contract.

Reference parity: the reference choreography streams into Delta tables
(/root/reference/README.md:92 ``format("delta")``); this closes the
streaming write side of that contract for stock-Delta consumers.

Why txn and not just the checkpoint: Spark's foreachBatch gives
AT-LEAST-ONCE — after a crash between the sink's commit and the offset
log's, the SAME ``batch_id`` replays. Delta writers handle this by
recording ``txn {appId, version=batch_id}`` with every commit and
skipping any batch at or below ``last_txn_version(appId)`` — the exact
protocol delta-spark's streaming sink implements. The reader resolves
txn state through the snapshot, so the idempotence contract survives
JSON log cleanup into checkpoints (PROTOCOL.md requires checkpoints to
carry txn actions for this reason).

Scale shape: the data write is one executor-side distributed parquet
job per micro-batch (staged, then renamed into ``data/`` — nothing
lands in the table until the commit that references it, the same
discipline as the export path); the commit is O(files) driver metadata.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

from sdlt_spark.store.delta_write import DeltaLogWriter

_LOG = "_delta_log"


class DeltaStreamSink:
    """``stream.writeStream.foreachBatch(DeltaStreamSink(dest, app_id))``
    — appends each micro-batch to the Delta table at ``dest``, exactly
    once per ``batch_id`` even when Spark replays batches on restart."""

    def __init__(
        self,
        dest_path: str,
        app_id: str,
        checkpoint_interval: int = 10,
        tombstone_retention_hours: float = 168.0,
    ):
        self.dest = os.path.abspath(dest_path)
        self.app_id = app_id
        self.checkpoint_interval = checkpoint_interval
        # align with the vacuum retention the table's operator uses: a
        # checkpoint drops tombstones older than this, and a vacuum with a
        # LONGER window would then lose their protection after log cleanup
        self.tombstone_retention_hours = tombstone_retention_hours

    # foreachBatch calls the object itself
    def __call__(self, df: DataFrame, batch_id: int) -> None:
        self.write_batch(df, batch_id)

    def write_batch(self, df: DataFrame, batch_id: int) -> int | None:
        """Append ``df`` as Delta version carrying txn(app_id, batch_id).
        Returns the committed version, or None when the batch was already
        committed by a previous (crashed) run and is skipped."""
        from sdlt_spark.store.delta_read import DeltaTableReader

        spark = df.sparkSession
        log_dir = os.path.join(self.dest, _LOG)
        # "exists" = the log holds actual commits or a checkpoint. A log
        # dir with replayable state that FAILS to replay is corrupt and
        # must fail loudly below — swallowing it would silently drop the
        # txn exactly-once guard and duplicate replayed batches.
        exists = os.path.isdir(log_dir) and any(
            (f.endswith(".json") and f[:-5].isdigit())
            or f == "_last_checkpoint"
            for f in os.listdir(log_dir)
        )
        schema_json: str | None = df.schema.json()
        snap = None
        config_arg: dict | None = None
        if exists:
            # ONE snapshot replay serves the txn watermark, the schema
            # comparison and the target-shape checks — the per-batch hot
            # path
            snap = DeltaTableReader(spark, self.dest).snapshot()
            if snap.partition_columns:
                # adds with empty partitionValues against a partitioned
                # metaData read as NULL partition values in every stock
                # reader — refuse rather than corrupt
                raise ValueError(
                    "DeltaStreamSink cannot append to a PARTITIONED table "
                    f"(partitionColumns={snap.partition_columns}); write "
                    "through export_vintage_to_delta or an unpartitioned "
                    "target"
                )
            if snap.mapping_mode != "none":
                raise ValueError(
                    "DeltaStreamSink cannot append to a column-mapped "
                    f"table (mode={snap.mapping_mode!r}): batch files "
                    "would carry logical names stock readers can't resolve"
                )
            last = snap.txns.get(self.app_id)
            if last is not None and batch_id <= last:
                return None  # replayed batch: already durable, skip
            if snap.schema.json() == schema_json:
                schema_json = None  # unchanged: don't repeat metaData
            else:
                # additive evolution ONLY: every table column must survive
                # with its type, and nullability can only loosen — a
                # narrower batch would otherwise REPLACE the table schema
                # wholesale, silently dropping columns for every reader
                bat = {f.name: f for f in df.schema.fields}
                for f in snap.schema.fields:
                    b = bat.get(f.name)
                    if (
                        b is None
                        or b.dataType != f.dataType
                        or (f.nullable and not b.nullable)
                    ):
                        raise ValueError(
                            "micro-batch schema is not an additive "
                            f"evolution of the table schema: column "
                            f"{f.name!r} is missing, retyped, or "
                            "null-tightened in the batch"
                        )
                # the evolved metaData must carry the table's existing
                # configuration forward, not reset it to {}
                config_arg = dict(
                    snap.metadata.get("configuration") or {}
                ) or None

        # a row-tracked target (rowTracking writer feature / config) needs
        # every add to carry a fresh baseRowId range — an append without
        # one would break read_with_row_ids for the whole table
        tracked = False
        if exists and snap is not None:
            cfg = snap.metadata.get("configuration") or {}
            wf = set((snap.protocol or {}).get("writerFeatures") or [])
            tracked = (
                cfg.get("delta.enableRowTracking") == "true"
                or "rowTracking" in wf
            )
        staging = os.path.join(self.dest, f".staging-{uuid.uuid4().hex}")
        writer = DeltaLogWriter(self.dest)  # creates dest + _delta_log
        os.makedirs(os.path.join(self.dest, "data"), exist_ok=True)
        try:
            df.write.mode("errorifexists").parquet(staging)
            adds: list[tuple[str, dict]] = []
            for f in sorted(os.listdir(staging)):
                if not f.endswith(".parquet"):
                    continue
                out_rel = f"data/part-{uuid.uuid4().hex}.parquet"
                os.replace(
                    os.path.join(staging, f), os.path.join(self.dest, out_rel)
                )
                adds.append((out_rel, {}))
            row_kwargs = {}
            if tracked and adds:
                from sdlt_spark.store.delta_write import allocate_base_row_ids

                base, hwm = allocate_base_row_ids(
                    self.dest, [rel for rel, _ in adds]
                )
                row_kwargs = {
                    "base_row_ids": base,
                    "row_id_high_water_mark": hwm,
                }
            version = writer.commit(
                adds=adds,
                schema_json=schema_json,
                configuration=config_arg,
                operation="STREAMING UPDATE",
                txn=(self.app_id, batch_id),
                **row_kwargs,
            )
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        if (
            self.checkpoint_interval
            and version > 0
            and version % self.checkpoint_interval == 0
        ):
            writer.write_checkpoint(
                version,
                tombstone_retention_hours=self.tombstone_retention_hours,
            )
        return version
