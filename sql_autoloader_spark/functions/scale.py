"""Cluster-scale join utilities: bucketed co-location and skew salting.

Neither has a reference counterpart (the reference delegates all joins
to the target RDBMS); these are the Spark-side mechanics that keep the
engine's join-heavy paths (key retrieval, compare reconstruction,
candidate-pair self-joins) viable at 100 TB:

- **Bucketing** pre-shuffles a table once at write time
  (``bucketBy`` + ``sortBy``).  Two tables bucketed on the same key
  with the same bucket count join with ZERO runtime exchange — the
  shuffle was paid once, amortized over every subsequent join.  The
  plan proof lives in tests/test_plans.py
  (``test_bucketed_join_has_no_exchange``).
- **Salting** splits a skewed hot key across *n* sub-keys: the fact
  side appends a deterministic salt in ``[0, n)``, the dimension side
  is replicated *n* times (dimension-sized — cheap), and the join key
  becomes ``(key, salt)``.  A key holding 1/k of all rows then spreads
  over n tasks instead of one straggler.  AQE's skew-join splitting
  handles moderate skew automatically; salting is for the pathological
  keys AQE cannot split (single giant hash bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "histogram_quantile",
    "merge_rollup",
    "mixture_sample",
    "prefix_sum",
    "range_bucket",
    "shuffle_partitions",
    "write_bucketed",
    "salted_join",
]


def shuffle_partitions(df: DataFrame, default: int = 200) -> int:
    """The session's shuffle-partition count, robust to non-numeric
    values: platforms with auto-tuned AQE (e.g. Databricks) set
    ``spark.sql.shuffle.partitions`` to ``"auto"``, which a bare
    ``int()`` would crash on — fall back to the session's default
    parallelism, then to *default*."""
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions", str(default))
    try:
        return int(raw)
    except ValueError:
        try:
            return int(df.sparkSession.sparkContext.defaultParallelism)
        except Exception:  # noqa: BLE001 — conf-less connect sessions
            return default


def write_bucketed(
    df: DataFrame,
    name: str,
    *,
    keys: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist *df* as a bucketed+sorted catalog table on *keys*.

    Join/groupBy on *keys* against another table bucketed identically
    requires no exchange (and no sort, thanks to ``sortBy``) — Spark's
    equivalent of co-located storage.  Bucket count is part of the
    contract: both sides must match.
    """
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(name)
    )


#: join types whose semantics survive dimension-side replication: the
#: fact side keeps one salt per row, so fact-preserving and matched-only
#: joins are unchanged — but right/full outer would emit one null-padded
#: row per *replica* of an unmatched dimension row (n copies, not 1).
_SALT_SAFE_JOINS = {"inner", "left", "left_outer", "left_semi", "left_anti"}


#: cap on data-derived range buckets: the unit of global-ordering
#: parallelism AND the per-row probe cost (one vectorized array filter
#: of this many struct comparisons).  Ranked/packed inputs are key
#: projections (dimension-scale), so a few hundred buckets saturate
#: real clusters without deep plans or per-row blowup.
_MAX_RANGE_BUCKETS = 256


def range_bucket(
    df: DataFrame,
    order_by: list[str],
    n_parts: int,
    *,
    sample_from: DataFrame | None = None,
) -> "F.Column":
    """Deterministic order-preserving bucket id as a PURE FUNCTION OF
    THE DATA: sample boundary keys once on the driver, embed them as
    literals, and assign each row the count of boundaries ≤ its key
    (struct comparison = lexicographic over *order_by*).

    This replaces ``repartitionByRange + spark_partition_id()`` in the
    two-phase global-ordering schemes (:func:`prefix_sum`, the
    loader's surrogate ranking).  The physical-placement form has a
    SPLIT-BRAIN hazard: it is only correct when Catalyst reuses the
    range exchange across the totals branch and the window branch, and
    when reuse does NOT fire (observed: AQE-compiled composition over
    an upstream aggregate — two independent ``Exchange
    rangepartitioning`` nodes, zero ``ReusedExchange``) each branch
    re-executes the range sampling over a shuffle-nondeterministic
    input and the ``spark_partition_id`` tags disagree, silently
    corrupting every offset.  A literal-embedded bucket expression is
    recompute-safe by construction: re-evaluating it anywhere always
    yields the same id for the same row.

    Monotone by construction (``Σ 1[key ≥ bᵢ]`` is non-decreasing in
    the key, whatever order the boundaries were picked in), so bucket
    ids are contiguous key ranges; NULL keys compare NULL → bucket 0,
    matching the window's nulls-first ascending order.  Boundary
    QUALITY only affects balance, never correctness.

    Mechanics chosen for scale and compatibility (review round 10;
    sampling fixed round 11): the bucket expression is ONE array
    literal probed with a higher-order ``filter`` — constant plan
    depth at any bucket count (a chained ``WHEN`` sum would nest
    n_parts deep and overflow Catalyst's tree recursion at production
    partition counts).  The boundary sample is a GLOBAL hash-ordered
    take: ``sample(0.05).orderBy(xxhash64(keys)).limit(want)``
    compiles to TakeOrdered, so every partition contributes its
    locally-smallest hashes and the take is a uniform draw over the
    whole key space.  A bare ``limit(want)`` — the round-10 form —
    short-circuits on the first partitions scanned, and for
    key-CLUSTERED inputs (time/id-ordered ingest, the common case)
    covered only the low end of the key space, collapsing nearly all
    rows into the last bucket and the downstream ranking into the
    single hot task this scheme exists to avoid.  Still
    DataFrame-only (``.rdd.takeSample`` would run an extra count job
    and is unsupported under Spark Connect — Connect itself is not
    smoke-testable in this container: grpcio is absent).  Bucket
    count is capped at ``_MAX_RANGE_BUCKETS``: per-row cost is one
    O(buckets) vectorized array probe, and the ranked/packed inputs
    are key projections, so a few hundred buckets of parallelism is
    the right trade.

    COST CONTRACT: the boundary sample is an EAGER driver job at
    expression-construction time, and it executes the full upstream
    lineage of the sampled frame (the main query later recomputes
    it).  When *df* sits downstream of expensive stages (a dedup
    shuffle, a regex scrub), pass ``sample_from=`` a CHEAP frame with
    the same ``order_by`` columns (typically the raw base-table key
    projection): boundary QUALITY only affects bucket balance, never
    correctness, so sampling from a superset of the keys is safe —
    the literals are still embedded, still recompute-safe.
    """
    n_buckets = max(min(n_parts, _MAX_RANGE_BUCKETS), 1)
    cols = [F.col(f"`{c}`") for c in order_by]
    want = max(n_buckets, 2) * 16
    src = df if sample_from is None else sample_from
    keys = src.select(*cols)
    # hash-ordered global take: TakeOrdered reads every partition's
    # local top-`want` by a pseudo-random key, so clustered physical
    # layouts cannot bias the boundary set toward early partitions
    spread = F.xxhash64(*cols)
    rows = (
        keys.sample(withReplacement=False, fraction=0.05, seed=29)
        .orderBy(spread)
        .limit(want)
        .collect()
    )
    if len(rows) < want:
        # small frame (or unlucky sample): take over the full frame —
        # it holds < ~20x `want` rows, so the ordered take is cheap
        rows = keys.orderBy(spread).limit(want).collect()
    if len(rows) > 1:
        # python-side sort only picks evenly-strided boundaries; its
        # None handling need not match Spark's ordering exactly
        rows.sort(
            key=lambda r: tuple(
                (v is not None, v) for v in r
            )
        )
    stride = max(len(rows) // n_buckets, 1)
    seen: set = set()
    boundaries = []
    for i in range(stride, len(rows), stride):
        t = tuple(rows[i])
        if t not in seen:
            seen.add(t)
            boundaries.append(rows[i])
    boundaries = boundaries[: n_buckets - 1]
    if not boundaries:
        return F.lit(0)
    key = F.struct(*cols)
    arr = F.array(
        *[
            F.struct(
                *[
                    F.lit(v).cast(df.schema[c].dataType).alias(c)
                    for c, v in zip(order_by, b)
                ]
            )
            for b in boundaries
        ]
    )
    return F.size(F.filter(arr, lambda b: key >= b))


def prefix_sum(
    df: DataFrame,
    *,
    order_by: list[str],
    value_col: str,
    out_col: str = "cumsum",
    boundary_hint: DataFrame | None = None,
) -> DataFrame:
    """Exact running sum of *value_col* in *order_by* order — WITHOUT a
    single-partition window.

    ``F.sum().over(Window.orderBy(...))`` with no ``partitionBy``
    collapses the whole input onto one task; this is the distributed
    restatement (the same two-phase scheme as the loader's surrogate
    ranking): bucket rows by data-derived range boundaries
    (:func:`range_bucket` — deterministic literals, recompute-safe,
    capped at ``_MAX_RANGE_BUCKETS``), sum within each bucket's
    window, and add the running total of preceding buckets — one row
    per bucket, broadcast back.

    Shuffle accounting, honestly: the input moves through ONE hash
    exchange on the bucket id (the within-bucket window's clustering
    requirement); the totals branch exchanges only map-side partial
    sums (n_buckets rows).  The literal boundaries remove the old
    ``repartitionByRange`` form's exchange-reuse correctness
    dependence (see :func:`range_bucket`).  The alternatives are
    worse: a single-partition window serializes the cluster, and a
    ``mapInPandas`` cumsum would trade the exchange for an Arrow
    round-trip of every row through Python.

    COST CONTRACT: calling this function runs ONE EAGER boundary-
    sampling job on the driver before the returned frame's own (lazy)
    plan ever executes, and that job evaluates the full lineage of the
    sampled frame.  By default it samples *df* itself — fine when *df*
    is a scan or a cheap map, wasteful when it sits downstream of a
    shuffle.  Pass ``boundary_hint=`` a cheap frame carrying the same
    ``order_by`` columns (e.g. the raw base-table key projection) to
    decouple the sampling cost from the pipeline: boundaries from a
    superset of the keys are still correct (balance-only effect), and
    the main plan stays untouched.  (``localCheckpoint(eager=False)``
    is NOT a remedy here: under AQE its ``toRdd`` executes every
    upstream shuffle synchronously at call time.)

    The order key must be unique per row for a deterministic result
    (ties would make "preceding rows" ambiguous); rows with NULL in
    the value column contribute 0.
    """
    sort_cols = [F.col(c) for c in order_by]
    n_parts = shuffle_partitions(df)
    val = F.coalesce(F.col(value_col), F.lit(0))
    keyed = df.withColumn(
        "__pid",
        range_bucket(df, order_by, n_parts, sample_from=boundary_hint),
    )
    totals = keyed.groupBy("__pid").agg(F.sum(val).alias("__tot"))
    offsets = totals.withColumn(
        "__off",
        F.coalesce(
            F.sum("__tot").over(
                Window.orderBy("__pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__pid", "__off")
    within = F.sum(val).over(
        Window.partitionBy("__pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        keyed.withColumn("__w", within)
        .join(F.broadcast(offsets), on="__pid")
        .withColumn(out_col, F.col("__w") + F.col("__off"))
        .drop("__pid", "__w", "__off")
    )


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    *,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of a fact frame against a dimension frame.

    The fact side derives a deterministic salt from the row's own
    content (``xxhash64`` over all columns, mod *n_salts*) — no RNG, so
    the plan is reproducible and retry-safe.  The dimension side is
    exploded ×*n_salts* (dimension-sized, broadcastable).  Result
    columns match ``facts.join(dims, on, how)`` for the supported
    (fact-preserving) join types; right/full outer joins would
    duplicate unmatched dimension rows per salt replica and are
    rejected.
    """
    if how not in _SALT_SAFE_JOINS:
        msg = (
            f"salted_join supports {sorted(_SALT_SAFE_JOINS)} joins; "
            f"'{how}' would emit one row per salt replica of an "
            "unmatched dimension row"
        )
        raise ValueError(msg)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts)
    ).cast("int")
    salted_facts = facts.withColumn("__salt", salt)
    salted_dims = dims.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_facts.join(salted_dims, on=[on, "__salt"], how=how).drop(
        "__salt"
    )


def zorder_value(
    df: DataFrame, cols: list[str], *, bits: int = 8
) -> "F.Column":
    """Z-order (Morton) key expression over *cols* for data-skipping
    clustering — the multi-dimensional generalization of a 1-D range
    sort (Delta ``OPTIMIZE ZORDER BY`` shape).

    Each column is quantized to ``2**bits`` buckets, and the bucket
    bits are interleaved so that sorting by the resulting key makes
    every output file cover a NARROW range of *every* column — parquet
    footer min/max statistics then skip files for predicates on any
    clustered column, not just the leading sort key.

    Quantization is one tiny driver-side min/max aggregate per call
    (a single job over *df*), then pure JVM arithmetic per row:

    - numeric / date / timestamp columns: linear min-max scaling
      (monotone ⇒ range predicates prune; heavy skew concentrates
      buckets — pre-transform a skewed column or use fewer bits);
    - other types (strings, binary): ``xxhash64`` folded into the
      bucket range — equality predicates still cluster and prune,
      range predicates do not (hashing is not monotone).

    NULL quantizes to bucket 0.  Returns a bigint Column; typical use
    is ``df.repartitionByRange(n, z).sortWithinPartitions(z)`` — which
    is exactly what ``SparkConnector.compact_table(zorder_by=[...])``
    does.
    """
    if not cols:
        msg = "zorder_value needs at least one column."
        raise ValueError(msg)
    if bits * len(cols) > 63:
        msg = (
            f"bits={bits} × {len(cols)} columns exceeds the 63 usable "
            "bits of a bigint z-value; lower bits or cluster fewer "
            "columns."
        )
        raise ValueError(msg)
    n_buckets = 1 << bits
    numeric_like = {
        "byte", "short", "int", "bigint", "float", "double", "date",
        "timestamp", "timestamp_ntz",
    }
    def as_double(c: str, dt: str) -> F.Column:
        # DateType and TIMESTAMP_NTZ have no direct double cast
        # (Spark rejects both); route through timestamp (epoch
        # seconds — monotone, which is all the quantizer needs)
        if dt in ("date", "timestamp_ntz"):
            return F.col(c).cast("timestamp").cast("double")
        return F.col(c).cast("double")

    stats_cols = []
    kinds: dict[str, str] = {}
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        if dt in numeric_like or dt.startswith("decimal"):
            kinds[c] = dt
            v = as_double(c, dt)
            stats_cols += [
                F.min(v).alias(f"__min_{c}"),
                F.max(v).alias(f"__max_{c}"),
            ]
        else:
            kinds[c] = "hashed"
    bounds = df.agg(*stats_cols).first() if stats_cols else None

    def bucket(c: str) -> F.Column:
        if kinds[c] == "hashed":
            # xxhash64 of a NULL input returns the SEED, not 0 —
            # pin NULLs to bucket 0 so the documented placement holds
            # for hashed columns too
            return F.when(
                F.col(c).isNull(), F.lit(0).cast("bigint")
            ).otherwise(F.pmod(F.xxhash64(F.col(c)), F.lit(n_buckets)))
        lo = bounds[f"__min_{c}"]
        hi = bounds[f"__max_{c}"]
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("bigint")
        v = as_double(c, kinds[c])
        scaled = F.floor(
            (v - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
            * F.lit(n_buckets - 1)
        )
        # explicit NULL branch: least/greatest SKIP null operands
        # (least(255, NULL) = 255), so a coalesce around the clamp
        # would never fire and NULLs would land in the TOP bucket
        return F.when(v.isNull(), F.lit(0).cast("bigint")).otherwise(
            F.greatest(
                F.lit(0).cast("bigint"),
                F.least(F.lit(n_buckets - 1).cast("bigint"), scaled),
            )
        )

    n = len(cols)
    z = F.lit(0).cast("bigint")
    for i, c in enumerate(cols):
        b = bucket(c)
        for j in range(bits):
            # bit j of this column's bucket → global position j*n + i
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, j).bitwiseAND(F.lit(1)),
                    j * n + i,
                )
            )
    return z


def mixture_sample(
    df: DataFrame,
    *,
    group_col: str,
    weight_col: str,
    token_col: str,
    order_cols: list[str],
    target_total: float | None = None,
) -> DataFrame:
    """Sample *df* down to an exact target MIXTURE of groups by token
    mass — the domain-reweighting primitive of a training-data
    pipeline (web:books:code at 5:3:2, say), as opposed to
    ``q_docs_token_budget_sample``'s per-group fraction.

    Given relative *weight_col* (constant within each *group_col*
    value), the total is water-filled: ``T = min_g(mass_g / w_g)`` —
    the largest total for which every group can supply its share —
    and each group keeps documents in *order_cols* order while its
    running ``token_col`` sum stays within ``w_g * T``.  Pass a
    deterministic draw (an md5 slice) as the first order column for a
    reproducible, RNG-free sample on any engine.

    *target_total* asks for a SPECIFIC total instead ("2 B tokens at
    5:3:2"): the budgets become ``w_g * target_total``, and a target
    above the water-fill maximum errors at execution, naming the
    binding group (the one that cannot supply its share) — never a
    silent under-delivery.

    Malformed weights fail LOUDLY on every engine: a NULL or
    non-positive weight raises at execution (pre-r14 a NULL budget
    silently dropped the whole group).

    Plan shape (the 100 TB contract): ONE exchange on *group_col*
    feeds the running-sum window; the per-group masses are a tiny
    (#groups-row) aggregate whose water-filled budgets broadcast back
    — the corpus is never shuffled a second time and nothing
    data-sized ever sits on one node.  The validity checks ride the
    budget expressions (``raise_error`` branches), costing zero extra
    scans.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    cum = F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    # group by group_col ALONE (weight is documented constant within a
    # group): grouping by (group, weight) would emit one budget row per
    # distinct weight of a malformed group and silently DUPLICATE its
    # docs through the budgets join — max() keeps the mass exact and
    # the join keyed uniquely whatever the input does
    masses = df.groupBy(group_col).agg(
        F.max(weight_col).alias(weight_col),
        F.sum(token_col).alias("__mass"),
    )
    # try_divide: a zero weight must reach the NAMED bad-weight error
    # below, not die earlier as ANSI DIVIDE_BY_ZERO inside the cap
    cap = F.try_divide(F.col("__mass").cast("double"), F.col(weight_col))
    # one row: the water-fill max AND which group binds it (for the
    # infeasibility message); NULL caps (malformed weights) sort first
    # but the bad-weight branch below fires before __t is ever used
    feasible = (
        masses.select(
            F.col(group_col).alias("__binding"), cap.alias("__t")
        )
        .orderBy("__t")
        .limit(1)
    )
    bad_weight = F.col(weight_col).isNull() | (F.col(weight_col) <= 0)
    budget = F.when(
        bad_weight,
        F.raise_error(
            F.concat(
                F.lit("mixture_sample: NULL or non-positive weight for "
                      "group '"),
                F.col(group_col).cast("string"),
                F.lit("'"),
            )
        ).cast("double"),
    )
    if target_total is not None:
        budget = budget.when(
            F.lit(float(target_total)) > F.col("__t"),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"mixture_sample: target_total {target_total} "
                        "exceeds the water-fill maximum "
                    ),
                    F.col("__t").cast("string"),
                    F.lit(" — binding group '"),
                    F.col("__binding").cast("string"),
                    F.lit("' cannot supply its share"),
                )
            ).cast("double"),
        )
        total = F.lit(float(target_total))
    else:
        total = F.col("__t")
    budgets = (
        masses.crossJoin(F.broadcast(feasible))
        .select(
            group_col,
            budget.otherwise(
                F.col(weight_col) * total
            ).alias("__budget"),
        )
    )
    return (
        df.withColumn("__cum", cum)
        .join(F.broadcast(budgets), group_col)
        .where(F.col("__cum").cast("double") <= F.col("__budget"))
        .withColumnRenamed("__cum", "cum_tokens")
        .drop("__budget")
    )


def histogram_quantile(hist: str | F.Column, q: float) -> F.Column:
    """The BIN INDEX holding quantile *q* of a fixed-bin histogram
    column (``array<bigint>`` of counts, the ``"vector_sum"`` rollup
    measure) — the read-side half of incremental quantiles: quantiles
    come off the maintained counts with no scan of the underlying
    data.  Rank semantics: the smallest bin whose cumulative count
    reaches ``ceil(q * total)`` (inclusive-rank, matching a sorted
    walk); NULL for an empty/all-zero histogram.  Pure expression —
    whole-stage-codegen'd per row, no UDF, no shuffle."""
    if not 0.0 < q <= 1.0:
        msg = f"quantile must be in (0, 1], got {q}"
        raise ValueError(msg)
    col = hist if isinstance(hist, F.Column) else F.col(hist)
    h, qs = col.cast("array<bigint>"), float(q)
    total = F.aggregate(h, F.lit(0).cast("bigint"), lambda a, x: a + x)
    target = F.ceil(F.lit(qs) * total.cast("double")).cast("bigint")
    # first index whose cumulative count reaches the target rank:
    # bins are few by construction (fixed boundaries), so the O(bins²)
    # slice-and-sum stays trivial and entirely expression-side
    walk = F.filter(
        F.transform(
            h,
            lambda _x, i: F.struct(
                i.alias("i"),
                F.aggregate(
                    F.slice(h, F.lit(1), i + 1),
                    F.lit(0).cast("bigint"),
                    lambda a, x: a + x,
                ).alias("c"),
            ),
        ),
        lambda s: s["c"] >= target,
    )
    return F.when(target > 0, walk[0]["i"].cast("int"))


def _vector_sum(c: str) -> F.Column:
    """Element-wise sum over ``array<bigint>`` measure columns — the
    mergeable form of a fixed-bin HISTOGRAM (and any other count
    vector): each partial carries one array per key, the merge is
    ``zip_with(+)`` folded over the collected partials.  Quantiles
    then read off the merged histogram at no extra scan — the
    fixed-boundary answer to "percentiles can't ride a rollup".

    Contract: every partial is a NON-NULL array of ONE fixed length
    per measure — and the merge fails LOUDLY on violations instead of
    corrupting.  Without the guards, ``zip_with`` pads a shorter array
    with nulls and ``x + null`` nulls those elements, and a NULL
    partial is silently DROPPED by ``collect_list`` (undercount) —
    both would poison the rollup without a trace."""
    err = (
        f"vector_sum measure `{c}`: partials must be non-null "
        "arrays of one fixed length; "
    )
    return F.expr(
        f"CASE WHEN count(*) != count(`{c}`) THEN"
        f" cast(raise_error('{err}got a NULL partial') as array<bigint>)"
        f" ELSE aggregate(collect_list(`{c}`),"
        " cast(array() as array<bigint>),"
        " (acc, x) -> CASE WHEN size(acc) = 0 THEN x"
        " WHEN size(acc) != size(x) THEN"
        f" cast(raise_error(concat('{err}got lengths ', size(acc),"
        " ' and ', size(x))) as array<bigint>)"
        " ELSE zip_with(acc, x, (a, b) -> a + b) END) END"
    )


def _topk_merge(c: str, k: int) -> F.Column:
    """Mergeable heavy-hitters over ``map<string,bigint>`` measure
    columns — the Misra-Gries summary merge (Agarwal et al.,
    "Mergeable Summaries", PODS'12): sum the two maps key-wise,
    subtract the (k+1)-th largest count from every key, drop
    non-positive — the result keeps ≤ *k* keys and the classic MG
    guarantees survive arbitrary merge trees:

    - estimates never OVERcount (``est(x) <= true(x)``),
    - undercount is bounded: ``true(x) - est(x) <= N/(k+1)`` for the
      group's total count N,
    - any key with ``true(x) > N/(k+1)`` is retained.

    This is how a TOP-K / heavy-hitters measure rides an incremental
    rollup: each refresh's partial is the delta's exact count map
    (exact = MG with zero error), the summary stays k-sized per group,
    and no refresh ever rescans the table.  Same fail-loud discipline
    as ``vector_sum``: a NULL partial (silently dropped by
    collect_list — an undercount) raises a named error.  Pure
    expression — no UDF, no extra shuffle beyond the keyed merge."""
    zero = "cast(0 as bigint)"
    merged = (
        f"map_zip_with(acc, x, (mk, v1, v2) ->"
        f" coalesce(v1, {zero}) + coalesce(v2, {zero}))"
    )
    # the (k+1)-th largest merged count (0 when <= k keys): SQL lambdas
    # have no let-binding, so the merged map is restated where needed
    threshold = (
        f"IF(size({merged}) > {k},"
        f" sort_array(map_values({merged}), false)[{k}], {zero})"
    )
    step = (
        f"map_filter(transform_values({merged}, (mk, v) -> v - {threshold}),"
        " (mk, v) -> v > 0)"
    )
    err = (
        f"topk measure `{c}`: partials must be non-null"
        " map<string,bigint> summaries"
    )
    return F.expr(
        f"CASE WHEN count(*) != count(`{c}`) THEN"
        f" cast(raise_error('{err}; got a NULL partial')"
        " as map<string,bigint>)"
        f" ELSE aggregate(collect_list(`{c}`),"
        " cast(map() as map<string,bigint>),"
        f" (acc, x) -> {step}) END"
    )


_MERGE_COMBINATORS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    # Datasketches HLL union over BINARY sketch columns
    # (F.hll_sketch_agg output): the mergeable-sketch form of
    # COUNT(DISTINCT ...) — the only way a distinct-count measure can
    # ride an incremental rollup, since raw distinct counts are not
    # partial-aggregatable.  Estimate at read time with
    # F.hll_sketch_estimate.
    "hll_union": F.hll_union_agg,
    # element-wise array<bigint> sum: fixed-bin histograms (mergeable
    # quantiles), per-key count vectors
    "vector_sum": _vector_sum,
}


def merge_rollup(
    old: DataFrame,
    delta: DataFrame,
    *,
    keys: list[str],
    combine: dict[str, str] | None = None,
) -> DataFrame:
    """Merge two PARTIAL aggregates of the same shape — the incremental
    view-maintenance step: ``refresh(summary, agg(table_changes(...)))``
    instead of re-aggregating the full table.

    Both frames must carry *keys* plus MERGEABLE measure columns.
    *combine* names each measure's combinator (``"sum"`` — counts and
    sums, the default for unlisted columns — plus ``"min"``/``"max"``,
    ``"hll_union"`` for Datasketches HLL sketch columns built with
    ``F.hll_sketch_agg`` — the mergeable form of a distinct count —
    ``"vector_sum"`` for ``array<bigint>`` count vectors — the
    mergeable form of a fixed-bin histogram, hence of quantiles —
    and ``"topk<k>"`` for ``map<string,bigint>`` count maps — the
    Misra-Gries mergeable form of heavy hitters / top-k, see
    :func:`_topk_merge` for the retained guarantees);
    keep averages as (sum, count) pairs and divide at read time, and
    EXACT distincts as their own keyed rollup — the standard
    partial-aggregate discipline.  The merge is ``unionByName`` + one
    keyed aggregate over ``|summary| + |delta|`` rows — O(groups +
    new data), never O(table).  At 100 TB this is the difference
    between touching the day's 100 GB of commits and re-scanning the
    warehouse.
    """
    measures = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(delta.columns):
        msg = (
            f"summary columns {sorted(old.columns)} != delta columns "
            f"{sorted(delta.columns)}"
        )
        raise ValueError(msg)
    combine = combine or {}
    unknown = set(combine) - set(measures)
    if unknown:
        msg = f"combine names non-measure columns: {sorted(unknown)}"
        raise ValueError(msg)
    aggs = []
    for c in measures:
        how = combine.get(c, "sum")
        if how.startswith("topk"):
            # parameterized heavy-hitters combinator: "topk<k>", e.g.
            # "topk8" keeps the 8 heaviest keys per group (Misra-Gries
            # mergeable summary — see _topk_merge for the guarantees)
            try:
                k = int(how[len("topk") :])
                if k <= 0:
                    raise ValueError(how)
            except ValueError:
                msg = (
                    f"malformed topk combinator {how!r} for {c!r}; "
                    "use 'topk<k>' with a positive k, e.g. 'topk8'"
                )
                raise ValueError(msg) from None
            aggs.append(_topk_merge(c, k).alias(c))
            continue
        if how not in _MERGE_COMBINATORS:
            msg = (
                f"unsupported combinator {how!r} for {c!r}; "
                f"supported: {sorted(_MERGE_COMBINATORS)} or 'topk<k>'"
            )
            raise ValueError(msg)
        aggs.append(_MERGE_COMBINATORS[how](c).alias(c))
    return old.unionByName(delta).groupBy(*keys).agg(*aggs)
