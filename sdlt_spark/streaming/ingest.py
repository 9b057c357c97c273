"""Streaming ingest: watermarked tumbling windows + sessionization.

The reference is batch-only (Spark shell choreography); streams are a
north-star extension. The transformations below are written once and work
on BOTH a static DataFrame and a ``readStream`` DataFrame — the recommended
Spark pattern (same Catalyst plan, different sink semantics). Tests drive
them through a real ``readStream`` -> memory-sink query with
``processAllAvailable()``, plus the batch equivalents are oracle-checked via
``events_tumbling_window`` in the declared registry.

Scale notes: the watermark bounds state (late rows beyond it are dropped);
windowed aggregation state is per (window, event_type) — tiny; session
windows use Spark's built-in ``session_window`` operator whose state is
bounded per active user by the gap timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_field_type(source_path: str | None) -> T.DataType:
    """Pick the read type for events.ts from the parquet footer.

    The fixture has shipped both as TIMESTAMP(NANOS) — which Spark's reader
    only accepts as a long (``spark.sql.legacy.parquet.nanosAsLong``) — and
    as TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ. File-stream sources
    need an explicit schema, so peek at one footer (driver-side, no Spark
    job) instead of hardcoding either generation."""
    if source_path is not None:
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        path = source_path
        if os.path.isdir(path):
            for dirpath, _dirs, fnames in os.walk(path):
                hit = next((f for f in sorted(fnames) if f.endswith(".parquet")), None)
                if hit:
                    path = os.path.join(dirpath, hit)
                    break
        try:
            ts = pq.read_schema(path).field("ts").type
            if pa.types.is_timestamp(ts):
                return T.LongType() if ts.unit == "ns" else T.TimestampNTZType()
        except Exception:
            pass
    return T.TimestampNTZType()


def event_schema(source_path: str | None = None) -> T.StructType:
    """events fixture schema; ts type adapts to the source footer
    (see _ts_field_type)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", _ts_field_type(source_path), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


def _event_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """The parquet readStream for the events fixture, SELF-CONTAINED: a
    TIMESTAMP(NANOS) source needs ``spark.sql.legacy.parquet.nanosAsLong``
    or the scan throws PARQUET_TYPE_ILLEGAL — tables.load sets it for the
    batch path, and the streaming helpers must not depend on the caller
    having gone through it first."""
    schema = event_schema(source_dir)
    if isinstance(schema["ts"].dataType, T.LongType):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("path", source_dir)
        .load()
    )


def normalize_events(raw: DataFrame) -> DataFrame:
    """Normalize ts to a session-tz timestamp, matching tables.load batch
    semantics: ns-long -> µs truncation, TIMESTAMP_NTZ -> UTC-session cast."""
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampType):
        return raw
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type. Append-mode
    compatible: windows finalize once the watermark passes their end."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user: built-in session_window keeps state bounded
    by the gap timeout; works identically on static input."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.date_format("sess.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sess.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_stream_once(
    spark: SparkSession,
    source_dir: str,
    transform,
    query_name: str = "sdlt_stream",
    output_mode: str = "complete",
) -> DataFrame:
    """Drive a parquet-source streaming query to completion against a static
    directory (smoke-test harness; production swaps the source for Kafka /
    files-arriving and the sink for a VintageTable foreachBatch writer)."""
    raw = _event_stream(spark, source_dir)
    out = transform(normalize_events(raw))
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_into_vintage(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    key_cols: list[str],
    query_name: str = "vintage_ingest",
    order_col: str | None = None,
    change_feed: bool = False,
):
    """Exactly-once-style streaming upsert into a VintageTable: each
    micro-batch merges on the key columns via foreachBatch (the same
    pattern Delta uses for streaming MERGE sinks). The vintage log records
    one commit per non-empty batch.

    Batches are deduplicated per key BEFORE hitting the table (the first
    batch bootstraps via write(), which has no merge-side dedup). With
    ``order_col`` the row with the greatest value wins deterministically
    (e.g. an update timestamp); without it an arbitrary row per key is kept.
    ``change_feed`` materializes CDC rows per commit so a ``vintage_cdc``
    stream can tail the table back out (see streaming/vintage_source.py).
    """
    from pyspark.sql import Window

    from sdlt_spark.store import VintageTable

    if ":" in query_name:
        raise ValueError(
            f"query_name {query_name!r} contains ':' (the txn-token "
            "separator); see VintageTable.last_txn_id"
        )
    table = VintageTable(spark, table_path, change_feed=change_feed)

    def _dedup(df: DataFrame) -> DataFrame:
        if order_col is None:
            return df.dropDuplicates(key_cols)
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def _sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # exactly-once guard (Delta's APP-SCOPED txnVersion pattern): a
        # batch replayed after a crash between table commit and stream
        # checkpoint would be value-idempotent for an upsert, but it would
        # still append a phantom commit — and with change_feed=True,
        # phantom CDC rows downstream consumers would double-apply. The
        # watermark is scoped by ``query_name`` so a SECOND stream (or any
        # other txn_id writer) sharing the table can never swallow this
        # stream's batches.
        if table.exists():
            last = table.last_txn_id(app=query_name)
            if last is not None and int(last) >= batch_id:
                return
        deduped = _dedup(batch_df)
        txn = f"{query_name}:{batch_id}"
        if not table.exists():
            table.write(deduped, mode="errorifexists", txn_id=txn)
        else:
            # batch already deduped above — skip merge's validation agg job
            table.merge(
                deduped,
                key_cols,
                on_duplicate_source="assume_unique",
                txn_id=txn,
            )

    raw = _event_stream(spark, source_dir)
    q = (
        normalize_events(raw)
        .writeStream.foreachBatch(_sink)
        .queryName(query_name)
        .trigger(availableNow=True)
        # checkpoint is per QUERY (like the txn watermark): two streams
        # feeding one table must not share offsets
        .option(
            "checkpointLocation",
            f"{table_path}/_stream_checkpoint_{query_name}",
        )
        .start()
    )
    q.awaitTermination()
    return table


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key, with
    state bounded by the watermark (dropDuplicatesWithinWatermark — Spark
    evicts a key's state once the watermark passes its event time, so a
    forever-running ingest doesn't accumulate unbounded key state; an
    unwatermarked dropDuplicates would). On a static frame this degrades to
    plain dropDuplicates for batch parity."""
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "1 hour",
    watermark: str = "10 minutes",
    self_join: bool = True,
) -> DataFrame:
    """Stream-stream inner join: pair events from two streams sharing
    ``key`` whose event times fall within ``within`` of each other.

    Both sides are watermarked and the join condition carries the
    event-time bound — that pair is what lets Spark EVICT join state (a
    row can only match partners inside the time band, so state older than
    watermark+band drops). An unbounded-condition stream-stream join would
    buffer both streams forever. Works identically on static frames (the
    batch parity oracle path).

    ``self_join=True`` (default) treats both inputs as the SAME logical
    stream and keeps each unordered event pair once via ``id_a < id_b``;
    pass ``self_join=False`` when correlating two DISTINCT streams — there
    every (left, right) pairing is a match regardless of id order, and the
    dedup term would silently drop half of them."""
    l = left.select(
        F.col(key).alias("__k"), F.col("ts").alias("ts_a"), F.col("event_id").alias("id_a")
    )
    r = right.select(
        F.col(key).alias("__k2"), F.col("ts").alias("ts_b"), F.col("event_id").alias("id_b")
    )
    if left.isStreaming:
        l = l.withWatermark("ts_a", watermark)
    if right.isStreaming:
        r = r.withWatermark("ts_b", watermark)
    cond = (
        (F.col("__k") == F.col("__k2"))
        & (F.col("ts_b") >= F.col("ts_a") - F.expr(f"interval {within}"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"interval {within}"))
    )
    if self_join:
        cond = cond & (F.col("id_a") < F.col("id_b"))
    return (
        l.join(r, cond)
        .select(F.col("__k").alias(key), "id_a", "id_b", "ts_a", "ts_b")
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The :func:`running_user_totals` aggregation on PySpark 4's
    ``transformWithStateInPandas`` — the current-generation stateful API
    (typed named state slots via ``StatefulProcessorHandle``, timers,
    multiple state variables per key; ``applyInPandasWithState`` is its
    single-slot predecessor). Same O(users) two-scalar state, same update
    output; kept alongside the older form so both API generations stay
    covered.

    Runtime requirements: the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the protobuf
    package (TWS's state-server wire format). The test harness container
    lacks protobuf, so the test for this operator import-skips there —
    gate deployments on both being present."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n_events LONG, total_value DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        _Totals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="update",
        timeMode="none",
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-user event count + value total maintained across micro-batches.

    State is two scalars per user — O(users) total, the smallest possible
    footprint; each batch folds its rows into the state and emits the
    updated row (update output mode). This is the pattern for bespoke
    aggregations Structured Streaming lacks natively (decaying counters,
    fraud scores, per-entity model state...).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _fold(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _fold,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n_events long, total_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
    broadcast: bool | None = None,
) -> DataFrame:
    """Stream-static enrichment join: decorate a stream with dimension
    attributes from a batch table. The static side needs NO watermark and
    holds NO streaming state — Spark re-plans it per micro-batch (so a
    dimension refresh is picked up on the next batch) and broadcasts it
    when it fits, which is the 100 TB shape: the fact stream never
    shuffles for the join. Left join keeps unmatched events (late dim
    arrivals enrich as NULL rather than dropping facts). Works identically
    on static frames for the batch-parity oracle.

    ``broadcast``: None (default) lets Spark pick from its size estimate
    and ``autoBroadcastJoinThreshold`` — a tens-of-GB dimension falls back
    to a shuffle join instead of OOMing the driver; True forces the hint
    for a dimension you KNOW fits; False never hints."""
    d = dim
    if dim_cols is not None:
        d = dim.select(on, *dim_cols)
    if broadcast:
        d = F.broadcast(d)
    return events.join(d, on, "left")
