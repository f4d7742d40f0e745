"""Structured Streaming operators.

The reference is a batch-only loader; this module is the green-field
streaming extension (SURVEY §2G): the same declarative ``load`` applied
per micro-batch via ``foreachBatch``, plus the standard event-stream
operators (watermarked tumbling/session windows, within-watermark
dedup).

Scale notes:
- ``foreachBatch`` gives the loader exactly-once-per-batch semantics on
  top of the sink's own idempotent insert (left-anti against existing
  keys), so replayed batches are no-ops — end-to-end idempotence.
- Watermarks bound the state store: tumbling windows keep one row per
  (window, keys) until the watermark passes; ``dropDuplicatesWithinWatermark``
  keeps one fingerprint per key within the lateness horizon.
- All aggregations below are keyed on (window/session, low-cardinality
  keys): state and shuffle stay proportional to distinct keys, not to
  event volume.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql.streaming import StreamingQuery

    from sql_autoloader_spark.connectors.base import BaseConnector


def autoload_stream(
    connector: BaseConnector,
    stream: DataFrame,
    *,
    columns: dict[str, str] | None = None,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuously auto-load a stream into the relational schema.

    Each micro-batch runs the full declarative ``load`` lifecycle
    (plan → dedup → idempotent insert → key merge) inside the
    connector's transaction bracket; the sink's natural-key anti-join
    makes replayed batches no-ops, so checkpoint-replay after failure
    is safe (effectively exactly-once table content).

    Validation compare is off per batch — a batch sees only its own
    slice, so reconstructing the full flat frame would false-negative;
    run ``connector.compare`` over the union after the stream stops.
    """

    def load_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        with connector:
            connector.load(batch, columns=columns, compare=False)

    writer = stream.writeStream.foreachBatch(load_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    window_duration: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts + value sums per key.

    Late rows beyond *watermark* are dropped and their window state is
    evicted — bounded state regardless of stream length.
    """
    keys = keys if keys is not None else ["event_type"]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), *keys)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sessionized_counts(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: activity bursts per user separated by *gap*."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), user_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def dedup_stream(
    stream: DataFrame,
    *,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events per *keys* within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    evicts it once the watermark passes — the streaming analogue of the
    loader's global pre-insert dedup, with bounded state.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
