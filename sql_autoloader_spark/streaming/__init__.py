"""Structured Streaming surface: streaming auto-load and event-stream
operators (SURVEY §2G event/stream ops)."""

from sql_autoloader_spark.streaming.pipeline import (
    autoload_stream,
    compact_signature_store,
    dedup_stream,
    fuzzy_dedup_stream,
    rocksdb_state,
    sessionized_counts,
    user_activity_state,
    windowed_event_counts,
)

__all__ = [
    "autoload_stream",
    "compact_signature_store",
    "dedup_stream",
    "fuzzy_dedup_stream",
    "rocksdb_state",
    "sessionized_counts",
    "user_activity_state",
    "windowed_event_counts",
]
