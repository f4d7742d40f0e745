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
