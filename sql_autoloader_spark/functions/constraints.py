"""Declarative data-quality constraints, verified in ONE aggregate pass.

The ingest-gate companion to the loader's own round-trip validation
(reference parity: the loader proves what landed equals what was sent;
this module lets a pipeline state what the INPUT must look like before
loading — the deequ/dbt-test shape re-expressed as a single Spark
aggregate).

Scale design: every rule compiles to a conditional aggregate over one
scan — no per-rule job, no shuffle beyond the single global aggregate
(map-side partial, 1-row result).  Uniqueness is the one rule needing a
distinct count; it rides the same aggregate via ``count_distinct``.
The report is exploded to one row per rule afterwards (driver-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    *,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list[str]] | None = None,
    patterns: dict[str, str] | None = None,
    min_rows: int | None = None,
) -> DataFrame:
    """Verify declarative constraints over *df* in one aggregate pass.

    Returns one row per rule: ``(rule, violations, passed)`` where
    ``violations`` counts offending rows (for ``min_rows``, the
    shortfall) and ``passed = violations == 0``.

    Rule semantics (NULLs never count against value rules — declare
    ``not_null`` separately, matching SQL CHECK semantics):

    - ``not_null``: rows where the column IS NULL.
    - ``unique``: duplicate rows over the key — ``count(*) -
      count(distinct key)`` among rows with a fully non-null key
      (SQL UNIQUE treats NULLs as distinct, same convention as the
      loader's idempotent insert).
    - ``ranges``: ``{col: (lo, hi)}`` — rows outside ``[lo, hi]``.
    - ``accepted``: ``{col: [values]}`` — rows with a non-null value
      outside the list.
    - ``patterns``: ``{col: regex}`` — non-null rows not fully matching
      (the regex is anchored with ``rlike`` as given; anchor explicitly
      for full-match semantics).
    - ``min_rows``: total row count shortfall below the floor.
    """
    aggs: list = []
    names: list[str] = []

    def add(name: str, expr) -> None:  # noqa: ANN001
        names.append(name)
        aggs.append(expr.cast("bigint").alias(f"__c{len(names) - 1}"))

    zero = F.lit(0)
    for c in not_null or []:
        add(
            f"not_null({c})",
            F.count(F.when(F.col(c).isNull(), 1)),
        )
    for key in unique or []:
        nn = None
        for c in key:
            cond = F.col(c).isNotNull()
            nn = cond if nn is None else (nn & cond)
        keyed = F.when(nn, F.struct(*[F.col(c) for c in key]))
        add(
            f"unique({', '.join(key)})",
            F.count(keyed) - F.count_distinct(keyed),
        )
    for c, (lo, hi) in (ranges or {}).items():
        add(
            f"range({c}, {lo}, {hi})",
            F.count(
                F.when((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)), 1)
            ),
        )
    for c, values in (accepted or {}).items():
        add(
            f"accepted({c})",
            F.count(
                F.when(
                    F.col(c).isNotNull() & ~F.col(c).isin(list(values)), 1
                )
            ),
        )
    for c, rx in (patterns or {}).items():
        add(
            f"pattern({c})",
            F.count(
                F.when(F.col(c).isNotNull() & ~F.col(c).rlike(rx), 1)
            ),
        )
    if min_rows is not None:
        add(
            f"min_rows({min_rows})",
            F.greatest(F.lit(min_rows) - F.count(F.lit(1)), zero),
        )
    if not names:
        msg = "constraint_report: no rules given"
        raise ValueError(msg)

    row = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"),
                F.col(f"__c{i}").alias("violations"),
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        row.select(F.explode(report).alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            F.col("r.violations").alias("violations"),
            (F.col("r.violations") == 0).alias("passed"),
        )
    )


def profile_table(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Per-column data profile in ONE aggregate pass.

    The dataset-understanding companion to :func:`constraint_report` —
    the profiling sweep a new corpus gets before anyone writes rules
    for it.  Returns one row per column:
    ``(column, n_rows, n_nulls, n_distinct, min_num, max_num, avg_num,
    min_str, max_str)`` — numeric stats NULL for non-numeric columns
    and vice versa, every value EXACT (count_distinct, not a sketch;
    approximate profiling at extreme scale belongs to the HLL
    operators).

    Scale shape: every statistic is a conditional aggregate over one
    scan — map-side partial, single 1-row result, exploded to
    driver-sized rows after.  No per-column job, no shuffle beyond the
    one global aggregate.
    """
    numeric = {"int", "bigint", "smallint", "tinyint", "double",
               "float", "decimal"}
    cols = columns if columns is not None else df.columns
    aggs = []
    for i, c in enumerate(cols):
        dtype = dict(df.dtypes)[c].split("(")[0]
        col = F.col(f"`{c}`")
        is_num = dtype in numeric
        aggs += [
            F.count(F.lit(1)).alias(f"__n{i}"),
            F.count(F.when(col.isNull(), 1)).alias(f"__nn{i}"),
            F.count_distinct(col).alias(f"__nd{i}"),
            (F.min(col.cast("double")) if is_num else F.lit(None).cast(
                "double")).alias(f"__mn{i}"),
            (F.max(col.cast("double")) if is_num else F.lit(None).cast(
                "double")).alias(f"__mx{i}"),
            (F.round(F.avg(col.cast("double")), 6) if is_num
             else F.lit(None).cast("double")).alias(f"__av{i}"),
            (F.min(col) if dtype == "string" else F.lit(None).cast(
                "string")).alias(f"__ms{i}"),
            (F.max(col) if dtype == "string" else F.lit(None).cast(
                "string")).alias(f"__xs{i}"),
        ]
    row = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n{i}").cast("bigint").alias("n_rows"),
                F.col(f"__nn{i}").cast("bigint").alias("n_nulls"),
                F.col(f"__nd{i}").cast("bigint").alias("n_distinct"),
                F.col(f"__mn{i}").alias("min_num"),
                F.col(f"__mx{i}").alias("max_num"),
                F.col(f"__av{i}").alias("avg_num"),
                F.col(f"__ms{i}").alias("min_str"),
                F.col(f"__xs{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return row.select(F.explode(report).alias("p")).select("p.*")
