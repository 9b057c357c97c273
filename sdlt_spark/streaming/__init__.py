"""Structured Streaming ingest path (SURVEY.md §2.10)."""

from sdlt_spark.streaming.ingest import (
    event_schema,
    run_stream_once,
    sessionize,
    tumbling_counts,
)

__all__ = ["event_schema", "tumbling_counts", "sessionize", "run_stream_once"]
