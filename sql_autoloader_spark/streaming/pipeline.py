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


def user_activity_state(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    timeout_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user activity totals (event count, value sum, first/last seen)
    emitted when the user goes quiet for *timeout_ms* of processing time.

    This is the escape hatch for aggregation semantics the built-in
    windows can't express (emit-on-timeout with arbitrary state shape).
    State per key is one small tuple; the state store is bounded by
    |active users|, and timeouts evict.  Arrow-batched like any pandas
    exchange.  The output key column's type follows the stream's actual
    ``user_col`` type (string user ids work), and the summed column is
    configurable via ``value_col``.
    """
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    key_type = stream.schema[user_col].dataType.simpleString()
    output_schema = (
        f"{user_col} {key_type}, n_events bigint, sum_value double,"
        " first_seen timestamp, last_seen timestamp"
    )
    state_schema = (
        "n bigint, total double, first_seen timestamp, last_seen timestamp"
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: PLC0415

        if state.hasTimedOut:
            (n, total, first_seen, last_seen) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [key[0]],
                    "n_events": [n],
                    "sum_value": [total],
                    "first_seen": [first_seen],
                    "last_seen": [last_seen],
                }
            )
            return
        n, total, first_seen, last_seen = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
            batch_min = pdf[ts_col].min()
            batch_max = pdf[ts_col].max()
            first_seen = batch_min if first_seen is None else min(first_seen, batch_min)
            last_seen = batch_max if last_seen is None else max(last_seen, batch_max)
        state.update((n, total, first_seen, last_seen))
        state.setTimeoutDuration(timeout_ms)
        yield from ()  # nothing emitted until timeout

    return (
        stream.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: each *left* row pairs
    with the *right* rows sharing its key whose timestamp lies in
    ``[left_ts, left_ts + max_delay]`` (attribution joins: purchase ←
    preceding clicks, impression ← conversions, ...).

    Both sides carry watermarks and the join condition is time-bounded
    in BOTH directions, which is what lets Structured Streaming evict
    buffered rows: each side's state holds only ``max_delay + watermark``
    worth of events per key — bounded by rate × horizon, not by stream
    length.  At 100 TB/day this is the only join shape that does not
    accumulate unbounded state.

    Column names must be disjoint except for *on* (rename upstream);
    the timestamp columns stay distinct so the caller can compute
    delays downstream.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(
        on, "__rkey"
    )
    cond = (
        (F.col(on) == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return lw.join(rw, on=cond, how="inner").drop("__rkey")
