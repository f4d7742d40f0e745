"""Event-stream batch operators: as-of join, sessionization helpers.

Spark has no native AS OF join; :func:`as_of_join` composes one from a
union + window — the scale-right plan (one shuffle on the join keys,
one sort within partitions) versus the naive range-join which explodes
to |left|×|right| per key before filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` per *on* key (inclusive).

    Plan: tag + union both sides, one window pass per key ordered by
    time carrying the last-seen right payload (``last(..., ignorenulls)``
    over unbounded-preceding), keep left rows.  One shuffle on *on*,
    one in-partition sort — same cost as a keyed aggregation, no
    row-explosion, no range-join cross product.  Skewed keys (one user
    with millions of events) are the hazard: pre-split hot keys by time
    bucket upstream if needed.

    Right rows sort *before* left rows at equal timestamps, making the
    join inclusive (a right event at exactly ``left_ts`` matches).

    Returns all left columns plus ``<payload><suffix>`` columns and
    ``<right_ts><suffix>`` (null where no prior right row exists).
    """
    if right_payload is None:
        right_payload = [
            c for c in right.columns if c not in on and c != right_ts
        ]

    # SQL semantics: a NULL join key never matches (`l.k = r.k` is not
    # true for NULLs) and a NULL right timestamp satisfies no `<=`
    # predicate — such right rows can never be the as-of match, so drop
    # them up front.  Left rows with NULL keys then simply find nothing
    # in their (NULL-keyed) window partition.
    right = right.na.drop(subset=[*on, right_ts])

    # the whole right row travels as ONE struct so every carried payload
    # column comes from the same (latest) right row, even when some of
    # its payload values are null
    struct_fields = [right_ts, *right_payload]

    tagged_left = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__t"),
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(
                f"`{c}`: {right.schema[c].dataType.simpleString()}"
                for c in struct_fields
            )
            + ">"
        )
        .alias("__r"),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c)
          for c in left.columns],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(c) for c in struct_fields]).alias("__r"),
    )

    unioned = tagged_left.unionByName(tagged_right)
    # __r as the final sort key makes ties deterministic: several right
    # rows at the same (key, timestamp) would otherwise resolve by
    # partition-internal order, so re-runs and task retries could carry
    # different payloads.  Left rows all have __r NULL, so the extra key
    # never reorders them; among tied right rows the greatest payload
    # struct deterministically wins.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t"), F.col("__side"), F.col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        F.last("__r", ignorenulls=True).over(w).alias("__r_carried"),
    )
    return (
        carried.where(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.col(f"__r_carried.{c}").alias(f"{c}{suffix}")
                for c in struct_fields
            ],
        )
    )


def sessionize_segmented(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int,
    chunk_seconds: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization WITHOUT a per-user window over the raw
    events — the hot-key-safe decomposition.

    ``Window.partitionBy(user)`` puts every event of a user in ONE
    task; a user owning 20% of a 100 TB stream is a stage-killing
    straggler, and windows can be neither salted nor AQE-split (the
    skew probe in SCALE.md measures the ceiling).  This operator
    decomposes the window:

    1. events are bucketed by ``(user, time-chunk)`` (``chunk_seconds``
       wide, default ``1000 × gap``) and sessionized WITHIN each
       bucket — full parallelism, the hot user's events spread across
       all their chunks;
    2. per-(user, chunk) SUMMARIES (session count, first/last event
       time — one row per present chunk, ~1000× smaller than events)
       decide chunk-boundary merges with a window over summaries:
       chunks whose boundary gap ≤ *gap* fuse their adjacent sessions;
    3. a per-chunk offset pair (sessions before this chunk, merges up
       to and including this chunk) joins back and renumbers local
       ids: ``global = preceding_sessions − merges + local``.  The
       arithmetic chains across any run of merged chunks (a chunk
       whose single session merges both ways collapses exactly), so
       the result is IDENTICAL to the single-window sessionization —
       differential-tested, including ``chunk < gap``.

    Returns *events* plus ``session_id`` (dense, 1-based per user in
    time order) — aggregate to session rollups downstream.
    ``tiebreak_col`` breaks equal-timestamp ordering (required for a
    deterministic result when timestamps collide).
    """
    if chunk_seconds is None:
        chunk_seconds = 1000 * gap_seconds
    gap_us = gap_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    chunked = events.withColumn(
        "__chunk", F.floor(us / (chunk_seconds * 1_000_000))
    )
    in_chunk = Window.partitionBy(user_col, "__chunk").orderBy(*order)
    prev_us = F.lag(us).over(in_chunk)
    new_sess = F.when(
        prev_us.isNull() | (us - prev_us > gap_us), 1
    ).otherwise(0)
    local = chunked.withColumn(
        "__sid",
        F.sum(new_sess).over(
            in_chunk.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )

    # per-chunk summaries: ONE row per (user, present chunk)
    summaries = local.groupBy(user_col, "__chunk").agg(
        F.max("__sid").alias("__n"),
        F.min(us).alias("__first"),
        F.max(us).alias("__last"),
    )
    by_chunk = Window.partitionBy(user_col).orderBy("__chunk")
    merged = summaries.withColumn(
        "__m",
        F.when(
            F.col("__first") - F.lag("__last").over(by_chunk) <= gap_us, 1
        ).otherwise(0),
    )
    cum = by_chunk.rowsBetween(Window.unboundedPreceding, 0)
    offsets = merged.select(
        user_col,
        "__chunk",
        (
            F.coalesce(
                F.sum("__n").over(
                    by_chunk.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            - F.sum("__m").over(cum)
        ).alias("__off"),
    )
    return (
        local.join(offsets, on=[user_col, "__chunk"])
        .withColumn(
            "session_id", (F.col("__off") + F.col("__sid")).cast("bigint")
        )
        .drop("__chunk", "__sid", "__off")
    )
