"""Data-plane DataFrame operations, PySpark-native.

Reference semantics: /root/reference/sql_autoloader/dataframe_operations.py
and /root/reference/sql_autoloader/connector.py:26-59 — re-expressed as
declarative DataFrame transforms so Catalyst picks the physical plan
(hash-aggregate dedup with partial/final split, broadcast vs sort-merge
joins, AQE skew handling).  Every function here stays distributed; nothing
collects data to the driver except tiny failure samples for error messages.

Scale notes (100 TB):
- ``dropDuplicates``/``distinct`` compile to partial+final HashAggregate —
  one shuffle on the dedup key, map-side combined.
- ``merge_ids`` uses ``eqNullSafe`` (SQL ``<=>``), which Spark still treats
  as an equi-join key, so broadcast-hash or sort-merge join both apply;
  the retrieved key frame is usually a dimension table and is broadcast
  when below ``spark.sql.autoBroadcastJoinThreshold`` (AQE re-plans at
  runtime otherwise).
- ``compare``/``validate_load_compare`` run all row-set comparison as ONE
  union+group-by aggregate (:func:`_compare_grouped`) — a single shuffle
  replaces the reference's O(n*m) driver-side membership loops
  (dataframe_operations.py:36-37) and the two-``subtract`` formulation's
  double shuffle of each input.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from functools import reduce

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_autoloader_spark.exceptions import (
    CompareMissingRowsError,
    CompareNoExactMatchError,
    MatchDatatypesError,
    MissingKeysAfterMergeError,
)

_SAMPLE = 20  # rows shown in failure messages


def _q(name: str) -> str:
    """Quote a column name for use in string expressions (dots allowed)."""
    escaped = name.replace("`", "``")
    return f"`{escaped}`"


def _col(df: DataFrame, name: str) -> Column:
    """Column reference bound to *df*, safe for dotted names."""
    return df[_q(name)]


def empty_frame(spark, schema) -> DataFrame:  # noqa: ANN001
    """A statically-empty DataFrame with *schema* (DDL string or
    ``StructType``), built so the optimizer can PROVE it is empty.

    ``spark.createDataFrame([], schema)`` yields a ``LogicalRDD`` over a
    pickled Python RDD: its row count is opaque to Catalyst (a union or
    join keeps the empty branch forever) and every task that scans it
    pays a Python-worker round-trip — thread dumps of the loader showed
    whole 33-task stages blocked in ``BasePythonRunner$ReaderInputStream``
    at near-zero CPU.  A ``limit(0)`` over a one-row projection instead
    optimizes to ``LocalRelation <empty>`` (``OptimizeLimitZero``), which
    ``PropagateEmptyRelation`` then folds out of unions and joins
    entirely: the empty-table branch of every freshly-created table
    vanishes from load plans, and nothing ever leaves the JVM.
    """
    if isinstance(schema, str):
        # schema-string parse only — never executed, so the Python-RDD
        # backing of this throwaway frame is irrelevant
        schema = spark.createDataFrame([], schema).schema
    return (
        spark.range(1)
        .select(
            [F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        .limit(0)
    )


def local_frame(spark, rows, schema: str) -> DataFrame:  # noqa: ANN001
    """Driver-local *rows* as a JVM ``LocalRelation``, not a Python RDD.

    ``spark.createDataFrame(list, schema)`` pickles the rows into a
    Python RDD: every later scan of the frame (including broadcast
    builds) round-trips through a Python worker, and the optimizer
    treats the size as unknown.  Routing the same rows through the
    Arrow ``createDataFrame`` path instead lands them as a
    ``LocalRelation`` — JVM-resident, statically sized, and free to
    broadcast without ever spawning a Python task (measured 0.51 s →
    0.20 s on the media-fixture broadcast join).  Spark's built-in
    non-Arrow fallback keeps semantics identical if the conversion
    cannot handle a type.  Callers pass simple exactly-typed rows
    (longs / binary) or an already-built pandas DataFrame; driver-side
    readbacks with richer types keep the classic path deliberately.
    """
    import pandas as pd

    if isinstance(rows, pd.DataFrame):
        if rows.empty:
            return empty_frame(spark, schema)
        pdf = rows
    elif not rows:
        return empty_frame(spark, schema)
    else:
        pdf = pd.DataFrame(rows)
    with arrow_driver_transfer(spark):
        return spark.createDataFrame(pdf, schema)


def preprocess(
    data: DataFrame, columns: dict[str, str] | None, *, dedup: bool = True
) -> DataFrame:
    """Rename columns per ``{old: new}`` and drop duplicate rows.

    Global row dedup is a semantic requirement of the loader (the reference
    enforces it on every entry point, connector.py:26-40).  ``dedup=False``
    is an internal fast path for callers that already hold a deduplicated
    frame (``load`` dedups once up front): renaming cannot introduce
    duplicates, so re-shuffling for a second ``dropDuplicates`` would be
    pure overhead in every downstream job's lineage.
    """
    if columns:
        data = data.withColumnsRenamed(columns)
    return data.dropDuplicates() if dedup else data


def postprocess(data: DataFrame, columns: dict[str, str] | None) -> DataFrame:
    """Undo :func:`preprocess` renaming for columns still present."""
    if columns is not None:
        undo = {v: k for k, v in columns.items() if v in data.columns}
        if undo:
            data = data.withColumnsRenamed(undo)
    return data


def count_and_has_nulls(data: DataFrame) -> tuple[int, bool]:
    """``(row count, any cell is null)`` in a single distributed aggregate.

    Per-column null counts plus a row count: one job, no data movement
    beyond the final reduce.  An *empty* frame counts as has-nulls
    (reference dataframe_operations.py:12-16).
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(_col(data, c).isNull().cast("long")).alias(f"__nulls_{i}")
        for i, c in enumerate(data.columns)
    ]
    row = data.agg(*aggs).first()
    if row is None or row["__n"] == 0:
        return 0, True
    return row["__n"], any(
        row[f"__nulls_{i}"] for i in range(len(data.columns))
    )


def has_nulls(data: DataFrame) -> bool:
    """True when any cell is null; an *empty* frame also counts as nulls."""
    return count_and_has_nulls(data)[1]


def distinct_rows(
    data: DataFrame, columns: list[str], *, already_distinct: bool = False
) -> DataFrame:
    """Distinct projection — the insert payload (reference ``get_rows``,
    dataframe_operations.py:59-76) kept distributed instead of collected.

    ``already_distinct``: the caller asserts the projection cannot hold
    duplicates (it projects *every* column of a deduplicated frame), so
    the dedup shuffle is skipped.
    """
    missing = [c for c in columns if c not in data.columns]
    if missing:
        msg = f"Columns {missing} do not appear in the DataFrame."
        raise AssertionError(msg)
    projected = data.select([_col(data, c) for c in columns])
    return projected if already_distinct else projected.distinct()


def match_dtypes(db_data: DataFrame, like: DataFrame) -> DataFrame:
    """Cast columns of *db_data* to the dtypes *like* uses for shared names.

    Mirrors the reference's ``match_dtypes`` (dataframe_operations.py:79-103):
    values coming back from a database/catalog read are coerced to the user
    frame's types so joins and comparisons line up.
    """
    like_types = {f.name: f.dataType for f in like.schema.fields}
    try:
        return db_data.select(
            [
                _col(db_data, c).cast(like_types[c]).alias(c)
                if c in like_types
                else _col(db_data, c)
                for c in db_data.columns
            ]
        )
    except AnalysisException as e:  # incompatible cast
        msg = f"Matching dtypes failed with the following error:\n{e}"
        raise MatchDatatypesError(msg) from e


def merge_ids(
    data: DataFrame,
    db_fetch: DataFrame,
    alias: str,
    table: str,
    *,
    allow_duplication: bool = False,
    known_count: int | None = None,
) -> DataFrame:
    """Null-safe left equi-join of retrieved keys back onto the data.

    Joins on *all* columns the two frames share, with NULL == NULL
    semantics (``eqNullSafe`` — the Polars equivalent is
    ``nulls_equal=True``, dataframe_operations.py:140).  Enforces the
    reference invariants: no row loss, no duplication (unless allowed),
    and no null ids after the merge.

    ``eqNullSafe`` is an equi-join key for Catalyst, so the physical plan
    is broadcast-hash when ``db_fetch`` is small (the usual case — it is a
    dimension-table key scan) and sort-merge otherwise.

    ``known_count``, when the caller already knows ``data``'s row count
    (``load`` counts once and threads it through every step), elides the
    pre-join count job — the invariants then cost a single aggregate.
    """
    if alias not in db_fetch.columns:
        msg = "Provided alias not found in fetch from database."
        raise AssertionError(msg)

    db_data = match_dtypes(db_fetch, data)
    joined = merge_join(data, db_data)

    check_merge_invariants(
        joined,
        alias,
        table,
        known_count,
        orig_frame=None if known_count is not None else data,
        allow_duplication=allow_duplication,
    )
    return joined


def merge_join(data: DataFrame, db_data: DataFrame) -> DataFrame:
    """The bare null-safe left equi-join of :func:`merge_ids` (no checks)."""
    on_columns = sorted(set(data.columns) & set(db_data.columns))
    renames = {c: f"__r_{i}" for i, c in enumerate(on_columns)}
    right = db_data.withColumnsRenamed(renames)

    condition = reduce(
        Column.__and__,
        [
            _col(data, c).eqNullSafe(_col(right, renames[c]))
            for c in on_columns
        ],
    )
    return data.join(right, on=condition, how="left").drop(
        *[renames[c] for c in on_columns]
    )


def check_merge_invariants(
    frame: DataFrame,
    alias: str,
    table: str,
    orig_len: int | None,
    *,
    orig_frame: DataFrame | None = None,
    allow_duplication: bool = False,
    sample_frame: DataFrame | None = None,
) -> int:
    """Enforce the merge invariants on *frame* in one aggregate job.

    Returns the post-merge row count (so callers can thread it to the
    next step instead of re-counting).  *sample_frame*, when given, is
    used for the failure sample only — callers that check a projection
    can still report the full pre-projection rows.

    When *orig_len* is unknown, pass *orig_frame* (the pre-join input)
    instead: both counts come back from ONE aggregate over a tagged
    union — the pre-join side is a bare projection of the (cached)
    input, so this replaces a standalone ``count()`` job entirely.
    """
    if orig_len is None:
        if orig_frame is None:
            msg = "either orig_len or orig_frame is required"
            raise AssertionError(msg)
        try:
            id_type = frame.schema[alias].dataType
        except KeyError:
            id_type = "bigint"
        tagged = frame.select(
            _col(frame, alias).alias("__id"), F.lit(1).alias("__side")
        ).unionByName(
            orig_frame.select(
                F.lit(None).cast(id_type).alias("__id"),
                F.lit(0).alias("__side"),
            )
        )
        stats = tagged.agg(
            F.count(F.when(F.col("__side") == 1, 1)).alias("__n"),
            F.count(F.when(F.col("__side") == 0, 1)).alias("__orig"),
            F.count(
                F.when((F.col("__side") == 1) & F.col("__id").isNull(), 1)
            ).alias("__null_ids"),
        ).first()
        orig_len = stats["__orig"]
    else:
        stats = frame.agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(_col(frame, alias).isNull(), 1)).alias(
                "__null_ids"
            ),
        ).first()
    new_len = stats["__n"]

    # Null ids are checked FIRST: a row the idempotent insert rejected
    # (uniqueness conflict) surfaces as a null id here, and callers that
    # fold the insert check into this merge translate the error into
    # InsertingDataFailedError — a concurrent duplication anomaly must
    # not mask that root cause.
    if stats["__null_ids"] > 0:
        src = sample_frame if sample_frame is not None else frame
        sample = src.filter(_col(src, alias).isNull()).limit(_SAMPLE).collect()
        rows = "\n".join(str(r.asDict()) for r in sample)
        msg = (
            f"When reading from {table} some ids were returned as NA:\n{rows}\n"
            "Check the uniqueness assumptions in your database schema, or "
            "whether your schema definitions contain a mistake."
        )
        raise MissingKeysAfterMergeError(msg)

    # NOTE: count-based invariants share the reference's theoretical
    # weakness (dataframe_operations.py:143-149): N lost + N duplicated
    # rows would offset.  In practice a LEFT join cannot lose rows, so
    # only duplication is observable — parity by design.
    if new_len < orig_len:
        msg = "Rows were lost when joining on ids."
        raise AssertionError(msg)
    if new_len != orig_len and not allow_duplication:
        msg = "Rows were duplicated when joining on ids."
        raise AssertionError(msg)

    return new_len


def _compare_grouped(data: DataFrame, db_aligned: DataFrame) -> DataFrame:
    """The single-shuffle primitive behind all row-set comparison.

    Union both sides with per-side markers and group by *every* column:
    the output has one row per distinct row value with per-side
    multiplicities ``__n_d`` / ``__n_b``.  GROUP BY treats NULLs as
    equal, matching ``subtract``'s null-safe set semantics — but where
    two ``subtract`` calls shuffle each input twice, this shuffles the
    union exactly once (the 100 TB path: one streaming pass over the
    reconstruction join, map-side combined, no caching needed).
    """
    cols = data.columns
    tagged = data.select(
        *[_col(data, c) for c in cols],
        F.lit(1).alias("__cmp_d"),
        F.lit(0).alias("__cmp_b"),
    ).unionByName(
        db_aligned.select(
            *[_col(db_aligned, c) for c in cols],
            F.lit(0).alias("__cmp_d"),
            F.lit(1).alias("__cmp_b"),
        )
    )
    return tagged.groupBy(*[F.col(_q(c)) for c in cols]).agg(
        F.sum("__cmp_d").alias("__cmp_n_d"), F.sum("__cmp_b").alias("__cmp_n_b")
    )


def _missing() -> Column:
    return (F.col("__cmp_n_d") > 0) & (F.col("__cmp_n_b") == 0)


def _extra() -> Column:
    return (F.col("__cmp_n_b") > 0) & (F.col("__cmp_n_d") == 0)


def _sample_rows(grouped: DataFrame, predicate: Column, cols: list[str]) -> str:
    """Failure-path sample: re-runs the grouped plan filtered to offenders.

    Callers that sample more than once should ``cache()`` *grouped*
    first — the happy path never pays for it, but re-deriving the
    reconstruction join per sample would double the failure cost.
    """
    rows = (
        grouped.where(predicate)
        .select([F.col(_q(c)) for c in cols])
        .limit(_SAMPLE)
        .collect()
    )
    return "\n".join(str(r.asDict()) for r in rows)


def _raise_no_exact_match(grouped: DataFrame, cols: list[str]) -> None:
    # two samples needed: pin the grouped plan so the (expensive)
    # upstream join executes once more, not twice more
    grouped = grouped.cache()
    try:
        missing_txt = _sample_rows(grouped, _missing(), cols)
        extra_txt = _sample_rows(grouped, _extra(), cols)
    finally:
        grouped.unpersist()
    msg = (
        "Datasets do not match exactly.\n"
        f"Rows in data and not in db:\n{missing_txt}\n"
        f"Rows in db and not in data:\n{extra_txt}\n\n"
        "Consider adding a WHERE clause to filter out irrelevant data.\n"
        "Note: if this happens because your data contains missings and "
        "your database does not allow those, set exact=False"
    )
    raise CompareNoExactMatchError(msg)


def compare(
    data: DataFrame,
    db_data: DataFrame,
    *,
    exact: bool = True,
) -> None:
    """Row-*set* comparison of data against a database read.

    ``exact=True``: the distinct row sets must match in both directions,
    else :class:`CompareNoExactMatchError`.  ``exact=False``: rows with any
    null are dropped from the data first, and data must be a subset of the
    database, else :class:`CompareMissingRowsError`.

    Replaces the reference's driver-side O(n*m) membership scan
    (dataframe_operations.py:36-37) with one distributed union+group-by
    pass (:func:`_compare_grouped`): the happy path is a single aggregate
    job with a single shuffle.
    """
    if not exact:
        # unconditional: dropping nulls from null-free data is a no-op,
        # and skipping the has_nulls pre-scan saves a full pass over data
        data = data.na.drop("any")

    aligned = match_dtypes(db_data, data)
    db_aligned = aligned.select([_col(aligned, c) for c in data.columns])
    grouped = _compare_grouped(data, db_aligned)

    if exact:
        stats = grouped.agg(
            F.count(F.when(_missing(), 1)).alias("__missing"),
            F.count(F.when(_extra(), 1)).alias("__extra"),
        ).first()
        if stats["__missing"] or stats["__extra"]:
            _raise_no_exact_match(grouped, data.columns)
        return

    n_missing = grouped.agg(
        F.count(F.when(_missing(), 1)).alias("__missing")
    ).first()["__missing"]
    if n_missing:
        missing_txt = _sample_rows(grouped, _missing(), data.columns)
        msg = f"Some rows from data were not found in the database:\n{missing_txt}"
        raise CompareMissingRowsError(msg)


#: sentinel: the checksum fast path proved the two row sets equal, so the
#: reconstruction is (content-)identical to the distinct data frame and no
#: grouped frame was ever materialized.
FAST_VERIFIED = object()


def _row_hash_channels(frame: DataFrame, cols: list[str]) -> tuple[Column, Column]:
    """Two per-row 64-bit hashes suitable for order-independent combining.

    ``xxhash64`` skips NULL inputs entirely, so ``(NULL, 'x')`` and
    ``('x', NULL)`` would collide — interleaving each value with its
    null flag disambiguates null *positions*.  The second channel
    hashes the ROW CONTENTS again under a distinct leading literal
    (xxhash64 folds each input into the running state, so a different
    prefix is a different hash function of the same row) — it is NOT
    derived from ``h1``, because any ``h2 = f(h1)`` would collide
    whenever ``h1`` does, silently halving the bound.  A collision
    must defeat two independent 64-bit channels across both the sum
    and xor combiners: ~2^-128 per compare, far below any hardware
    error rate.
    """
    interleaved: list[Column] = []
    for c in cols:
        interleaved.append(_col(frame, c).isNull().cast("int"))
        interleaved.append(_col(frame, c))
    h1 = F.xxhash64(*interleaved)
    h2 = F.xxhash64(F.lit(-7046029254386353131), *interleaved)
    return h1, h2


#: inputs at or below this bound run the checksum aggregate with AQE
#: off: the data work is trivial there, and AQE otherwise splits the
#: single action into one sequential driver-scheduled job per query
#: stage (measured 5 jobs ≈ 0.5 s of pure scheduling at sf0.1 — larger
#: than the aggregate itself).  Above the bound AQE stays on: runtime
#: join re-selection and skew handling matter at fact scale, and the
#: per-stage jobs amortize over real work.  Bounded tight (10k): at
#: 100k+ rows AQE's runtime SMJ→SHJ conversion of the dim-preserving
#: reconstruction join is already worth more than the saved job
#: scheduling (measured at sf0.1).
SMALL_COMPARE_ROWS = 10_000


#: serializes session-conf toggles: the conf is SESSION-global, so two
#: threads toggling concurrently (multi-threaded connectors on one
#: session are supported) could restore each other's transient value
#: and leave AQE off / 4 shuffle partitions for unrelated queries.
#: Only tiny-input actions ever hold this across execution.
_CONF_LOCK = threading.RLock()


@contextmanager
def _aqe_disabled(spark):  # noqa: ANN001, ANN202
    """AQE off + few shuffle partitions, for one small-input action.

    Without AQE nothing coalesces the aggregate's exchange at runtime,
    so also drop ``shuffle.partitions`` to a handful — the input is
    bounded small by the caller, and 4 reduce tasks beat scheduling the
    session default on near-empty partitions.
    """
    conf = spark.conf
    keys = ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    with _CONF_LOCK:
        prev = [conf.get(k) for k in keys]
        conf.set(keys[0], "false")
        conf.set(keys[1], "4")
        try:
            yield
        finally:
            for k, p in zip(keys, prev):
                conf.set(k, p)


@contextmanager
def arrow_driver_transfer(spark):  # noqa: ANN001, ANN202
    """``spark.sql.execution.arrow.pyspark.enabled=true`` for one
    bounded driver transfer (``createDataFrame(pandas)`` / ``toPandas``
    — guide §6: orders of magnitude faster than the pickled-row path).
    Shared by :func:`local_frame` and the dedup driver fast path so the
    toggle/restore logic lives once; serialized on the session-conf
    lock like every other toggle.
    """
    conf = spark.conf
    key = "spark.sql.execution.arrow.pyspark.enabled"
    with _CONF_LOCK:
        prev = conf.get(key)
        conf.set(key, "true")
        try:
            yield
        finally:
            conf.set(key, prev)


@contextmanager
def utc_session(spark):  # noqa: ANN001, ANN202
    """``spark.sql.session.timeZone=UTC`` for one bounded driver-side
    conversion (a ``collect`` or ``createDataFrame``).

    ``TimestampType`` crosses the Python boundary as a NAIVE datetime
    rendered in the session timezone; database sinks that normalize
    wall-clock values to UTC-naive on their side (the Postgres wire
    decode) need the Spark side converted under UTC too, or the
    idempotency pre-filter misses identical rows in any non-UTC session.
    Serialized on the same lock as every other session-conf toggle; hold
    it only across small bounded actions (the sinks' driver paths are
    size-capped by construction).
    """
    conf = spark.conf
    key = "spark.sql.session.timeZone"
    with _CONF_LOCK:
        prev = conf.get(key)
        conf.set(key, "UTC")
        try:
            yield
        finally:
            conf.set(key, prev)


def fast_set_equal(
    data: DataFrame, db_aligned: DataFrame, *, small: bool = False
) -> bool:
    """Multiset-checksum equality of two aligned frames in ONE aggregate.

    The scale-critical validation primitive: both sides stream into a
    single aggregate computing per-side row counts plus order-independent
    checksums (sum and xor of two independent row-hash channels) — NO
    shuffle of the data itself, ever.  Where :func:`_compare_grouped`
    shuffles the whole union by every column (at 100 TB: a fact-sized
    exchange), this reduces each partition to eleven numbers map-side and
    moves nothing else.

    Equal counts + equal checksums ⇒ the multisets are equal (up to the
    ~2^-128 collision bound) ⇒ the row *sets* are equal.  ``False``
    proves nothing by itself — callers fall back to the exact grouped
    compare for classification and error samples.  An empty db side
    returns ``False`` (callers treat "no results" as a failure).

    The sum channel folds each hash as four 16-bit quarters summed as
    BIGINTs rather than one ``decimal(38,0)`` sum: the quarter sums are
    carry-free, so together they reconstruct the exact integer sum
    (equal quarter sums ⟺ equal true sums — the collision bound is
    unchanged), they cannot overflow below ~1.4e14 rows per side
    (``(2^63-1)/65535`` — ANSI mode would fail loudly far beyond any
    real compare), and they keep the aggregate in primitive-long
    codegen instead of per-row Decimal128 adds — measured 1.6 s → 1.0 s
    on a 20M-row-per-side compare, with the gap growing with rows.
    Aggregating ``groupBy(__side)`` (two result rows) instead of one
    conditional ``agg`` row also drops the per-row ``when(side=..)``
    from every channel.
    """
    cols = data.columns
    h1_d, h2_d = _row_hash_channels(data, cols)
    h1_b, h2_b = _row_hash_channels(db_aligned, cols)
    tagged = data.select(
        h1_d.alias("__h1"), h2_d.alias("__h2"), F.lit(1).alias("__side")
    ).unionByName(
        db_aligned.select(
            h1_b.alias("__h1"), h2_b.alias("__h2"), F.lit(0).alias("__side")
        )
    )

    def quarters(col: Column, tag: str) -> list[Column]:
        return [
            F.sum(
                F.shiftrightunsigned(col, s).bitwiseAND(F.lit(0xFFFF))
            ).alias(f"__{tag}q{s}")
            for s in (0, 16, 32, 48)
        ]

    agg = tagged.groupBy("__side").agg(
        F.count(F.lit(1)).alias("__n"),
        *quarters(F.col("__h1"), "s1"),
        F.bit_xor(F.col("__h1")).alias("__x1"),
        *quarters(F.col("__h2"), "s2"),
        F.bit_xor(F.col("__h2")).alias("__x2"),
    )
    if small:
        # plan AND run the one action with AQE off (a single job
        # instead of one per query stage; see SMALL_COMPARE_ROWS)
        with _aqe_disabled(data.sparkSession):
            rows = agg.collect()
    else:
        rows = agg.collect()
    by_side = {r["__side"]: r for r in rows}
    row_d, row_b = by_side.get(1), by_side.get(0)
    if row_b is None:  # empty db side (an empty side groups to no row)
        return False
    if row_d is None:  # data empty, db not: counts differ
        return False
    return all(
        row_d[f] == row_b[f]
        for f in agg.columns
        if f != "__side"
    )


def validate_load_compare(
    data: DataFrame,
    db_data: DataFrame,
    *,
    exact: bool = True,
    missing_first: bool = False,
    keep_grouped: bool = False,
    fast: bool = False,
    small: bool = False,
    on_mismatch=None,
) -> DataFrame | None | object:
    """The full post-load validation in ONE aggregate job.

    Fuses what the reference runs as four separate passes
    (connector.py:326-374: db count, data count, null scan, two
    membership scans) over the generated reconstruction join into a
    single union+group-by aggregate: raw per-side counts, a data-side
    null flag, and both set differences all come back in one row.
    Failure paths re-run the grouped plan to sample offending rows.

    ``missing_first``: report non-null data-side missing rows as
    :class:`CompareMissingRowsError` even under ``exact=True`` —
    ``load`` sets this when the per-insert subset checks were delegated
    to this compare, so a row that never landed keeps its insert-failure
    identity instead of folding into the generic exact-mismatch error.

    ``keep_grouped``: materialize the grouped frame once
    (``localCheckpoint`` — ``MEMORY_AND_DISK`` partitions, lineage
    truncated to the materialized result) and return it, so callers
    that want the validated reconstruction afterwards reuse the shuffle
    this aggregate already paid for instead of re-running the multi-way
    reconstruction join.  A ``persist`` would keep the same partitions
    but NOT the flat lineage — the reconstruction plan underneath is
    the whole load (multi-way join over union chains), and every later
    action on a persisted frame re-analyzes that full logical plan on
    the driver before hitting the cache (measured ~1 s per action at
    sf0.1 vs ~0.07 s checkpointed).  The trade is the standard
    localCheckpoint one, accepted across this codebase: partitions live
    in executor storage and are not recomputable after an executor
    loss — acceptable for a kept validation artifact, which the caller
    can always rebuild by re-running the compare.

    ``fast`` (``exact=True`` only): try :func:`fast_set_equal` first —
    one streaming aggregate, no all-columns shuffle, no checkpoint.  On
    success return :data:`FAST_VERIFIED` (the validated reconstruction
    is then content-identical to the distinct ``data``, so callers
    expose *data* instead of a grouped artifact).  On mismatch, first
    invoke *on_mismatch* (``load`` re-runs its deferred per-step merge
    invariants there so failures keep their precise per-table
    identity), then fall through to the grouped compare for exact
    classification and error samples — failure semantics are identical
    to the slow path, at the cost of re-executing the reconstruction
    join once (failures are the rare path by construction).
    """
    aligned = match_dtypes(db_data, data)
    db_aligned = aligned.select([_col(aligned, c) for c in data.columns])
    if fast and exact:
        if fast_set_equal(data, db_aligned, small=small):
            return FAST_VERIFIED
        if on_mismatch is not None:
            on_mismatch()
    elif on_mismatch is not None:
        # deferred invariants without a fast path (shouldn't happen —
        # load only defers when it fast-validates) — run them up front
        on_mismatch()
    grouped = _compare_grouped(data, db_aligned)
    if keep_grouped:
        # one execution of the reconstruction join + aggregate: the
        # LAZY checkpoint materializes (and pins) during the stats
        # action below — a single job — and every caller reuse then
        # plans against the flat checkpoint
        grouped = grouped.localCheckpoint(eager=False)
        _validate_grouped(
            grouped, data, exact=exact, missing_first=missing_first
        )
        return grouped
    _validate_grouped(grouped, data, exact=exact, missing_first=missing_first)
    return None


def reconstruction_from_grouped(
    grouped: DataFrame, columns: list[str]
) -> DataFrame:
    """The distinct reconstruction rows out of a kept compare aggregate:
    every distinct tuple the database side produced (``__cmp_n_b > 0``),
    projected back to the data columns."""
    return grouped.where(F.col("__cmp_n_b") > 0).select(
        [F.col(_q(c)) for c in columns]
    )


def _validate_grouped(
    grouped: DataFrame,
    data: DataFrame,
    *,
    exact: bool,
    missing_first: bool,
) -> None:
    null_row = reduce(
        Column.__or__, [F.col(_q(c)).isNull() for c in data.columns]
    )
    stats = grouped.agg(
        F.sum("__cmp_n_d").alias("__n_data"),
        F.sum("__cmp_n_b").alias("__n_db"),
        F.max(
            F.when(null_row & (F.col("__cmp_n_d") > 0), 1).otherwise(0)
        ).alias("__has_nulls"),
        F.count(F.when(_missing(), 1)).alias("__missing"),
        F.count(F.when(_extra(), 1)).alias("__extra"),
        F.count(F.when(_missing() & ~null_row, 1)).alias("__missing_nonnull"),
    ).first()

    n_data = stats["__n_data"] or 0
    n_db = stats["__n_db"] or 0
    has_nulls = bool(stats["__has_nulls"]) or n_data == 0
    # Delegated insert checks report before the row-count sanity gates:
    # a conflict-dropped insert row makes the reconstruction smaller than
    # data, and must surface as the insert failure it is, not as the
    # generic count assertion.
    if missing_first and stats["__missing_nonnull"]:
        missing_txt = _sample_rows(grouped, _missing() & ~null_row, data.columns)
        msg = f"Some rows from data were not found in the database:\n{missing_txt}"
        raise CompareMissingRowsError(msg)
    if n_db == 0:
        msg = "Compare query yielded no results."
        raise AssertionError(msg)
    if not has_nulls and n_db < n_data:
        msg = f"Compare query yielded fewer rows ({n_db}) than data ({n_data})."
        raise AssertionError(msg)

    if exact:
        if stats["__missing"] or stats["__extra"]:
            _raise_no_exact_match(grouped, data.columns)
    elif stats["__missing_nonnull"]:
        missing_txt = _sample_rows(grouped, _missing() & ~null_row, data.columns)
        msg = f"Some rows from data were not found in the database:\n{missing_txt}"
        raise CompareMissingRowsError(msg)
