"""Skew stress for the events path: measured effect of a hot key.

Builds a deliberately skewed copy of the sf0.1 events table (ONE user
owns ~20% of all rows — the VERDICT-prescribed pathological shape) and
measures, skewed vs. uniform:

- ``events_sessionize``'s window stage (``Window.partitionBy(user_id)``)
  — windows CANNOT be salted or AQE-split (ordering needs the whole key
  in one partition), so this measures the inherent hot-key ceiling;
- ``as_of_join`` on ``user_id`` — same single-shuffle window plan;
- an enrichment join events⨝users on ``user_id`` three ways: plain
  (AQE skew-join splitting), ``salted_join``, and plain with AQE off
  (the unmitigated baseline a naive plan would hit).

Prints a table for SCALE.md.  Writes under /tmp; run:
``python tools/skew_probe.py``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_skewprobe"
HOT_SHARE = 5  # 1/5 = 20% of rows on one user
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def build_fixture() -> None:
    """Replicate events ×REPLICAS with disjoint ids (sf0.1 alone is too
    small for skew to beat fixed task overhead — measured flat at ×1).
    uniform.parquet keeps per-user shares; skewed.parquet remaps every
    5th row's user_id to a single hot user (0) = 20% of ALL rows."""
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    src = f"{BASE}/events.parquet"
    span_e, span_u = con.sql(
        f"SELECT MAX(event_id) + 1, MAX(user_id) + 1 FROM '{src}'"
    ).fetchone()
    base = (
        f"SELECT * REPLACE (CAST(event_id + i * {span_e} AS BIGINT) AS "
        f"event_id, CAST(user_id + i * {span_u} AS BIGINT) AS user_id) "
        f"FROM '{src}', range({REPLICAS}) t(i)"
    )
    for name, expr in [
        ("uniform", "user_id"),
        (
            "skewed",
            f"CASE WHEN event_id % {HOT_SHARE} = 0 THEN 0 ELSE user_id END",
        ),
    ]:
        dst = f"{OUT}/{name}.parquet"
        if not os.path.exists(dst):
            con.sql(
                f"COPY (SELECT * REPLACE (CAST({expr} AS BIGINT) AS user_id)"
                f" FROM ({base})) TO '{dst}' (FORMAT PARQUET)"
            )


def build_fact_fixture() -> None:
    """orders ⨝ lineitem is the fact-fact risk surface: replicate both
    ×REPLICAS with disjoint orderkeys, then remap every 5th lineitem
    row's orderkey to ONE existing hot order (20% of all line items on
    a single join key)."""
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    li, od = f"{BASE}/lineitem.parquet", f"{BASE}/orders.parquet"
    (span,) = con.sql(f"SELECT MAX(o_orderkey) + 1 FROM '{od}'").fetchone()
    if not os.path.exists(f"{OUT}/orders_big.parquet"):
        con.sql(
            f"COPY (SELECT * REPLACE (CAST(o_orderkey + i * {span} AS "
            f"BIGINT) AS o_orderkey) FROM '{od}', range({REPLICAS}) t(i)) "
            f"TO '{OUT}/orders_big.parquet' (FORMAT PARQUET)"
        )
    for name, expr in [
        ("lineitem_uniform", f"CAST(l_orderkey + i * {span} AS BIGINT)"),
        (
            "lineitem_skewed",
            "CASE WHEN (l_linenumber + l_orderkey) % 5 = 0 THEN 1 "
            f"ELSE CAST(l_orderkey + i * {span} AS BIGINT) END",
        ),
    ]:
        dst = f"{OUT}/{name}.parquet"
        if not os.path.exists(dst):
            con.sql(
                f"COPY (SELECT * REPLACE ({expr} AS l_orderkey) "
                f"FROM '{li}', range({REPLICAS}) t(i)) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )


def main() -> None:
    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from sql_autoloader_spark.functions.events import as_of_join
    from sql_autoloader_spark.functions.scale import salted_join

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sql_autoloader_spark.logutil import silence_benign_scheduler_spam
    silence_benign_scheduler_spam(spark)
    build_fixture()

    def events(which: str):
        # DuckDB writes TIMESTAMP_NTZ; normalize for unix_micros
        return spark.read.parquet(f"{OUT}/{which}.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    def sessionize(ev):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        new_sess = F.when(
            gap_us.isNull() | (gap_us > 6 * 3600 * 1_000_000), 1
        ).otherwise(0)
        cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return (
            ev.withColumn("sid", F.sum(new_sess).over(cum))
            .groupBy("user_id", "sid")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def asof(ev):
        # attribute each event to the latest prior 'purchase' of the user
        marks = ev.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("purchase_id")
        )
        return as_of_join(
            ev.select("user_id", "ts", "event_id"),
            marks,
            on=["user_id"],
            right_payload=["purchase_id"],
        )

    def users_dim(ev):
        return (
            ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_total"))
            .localCheckpoint(eager=True)
        )

    def bench(label: str, run) -> float:
        """run() must BUILD AND EXECUTE the query (AQE enablement is
        read at execution time, so conf-toggling probes must hold their
        toggle across the action, not just construction)."""
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        print(f"  {label:44s} {best:7.2f}s")
        return best

    frames = {}
    for which in ("uniform", "skewed"):
        ev = events(which).localCheckpoint(eager=True)
        dim = users_dim(ev).withColumn("pad", F.lit("x" * 64))
        n = ev.count()
        hot = ev.where(F.col("user_id") == 0).count()
        print(f"{which}: {n} rows, hot-user share {hot / n:.1%}")
        frames[which] = (ev, dim)

    def probes(which):
        ev, dim_big = frames[which]

        def plain():
            ev.hint("shuffle_merge").join(dim_big, on="user_id").count()

        def salted():
            salted_join(ev, dim_big, on="user_id", n_salts=int(cpus)).count()

        def no_aqe():
            # the toggle must span the COUNT, not just construction
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                ev.hint("shuffle_merge").join(dim_big, on="user_id").count()
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")

        return {
            "sessionize": lambda: sessionize(ev).count(),
            "as_of_join": lambda: asof(ev).count(),
            "join_aqe": plain,
            "join_salted": salted,
            "join_noaqe": no_aqe,
        }

    # interleave u/s per probe (kills warm-up order bias)
    results: dict[str, dict[str, float]] = {"uniform": {}, "skewed": {}}
    for key in probes("uniform"):
        for which in ("uniform", "skewed"):
            results[which][key] = bench(
                f"{key} [{which}]", probes(which)[key]
            )

    print("\nratios skewed/uniform:")
    for k in results["uniform"]:
        print(f"  {k:20s} {results['skewed'][k] / results['uniform'][k]:5.2f}x")

    # ---- fact-fact: orders ⨝ lineitem with one hot orderkey ---------------
    build_fact_fixture()
    orders_big = spark.read.parquet(f"{OUT}/orders_big.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li_frames = {
        which: spark.read.parquet(
            f"{OUT}/lineitem_{which}.parquet"
        ).select("l_orderkey", "l_partkey", "l_extendedprice")
        for which in ("uniform", "skewed")
    }
    n_li = li_frames["uniform"].count()
    hot = li_frames["skewed"].where(F.col("l_orderkey") == 1).count()
    print(f"\nfact-fact: {n_li} lineitems, hot-order share {hot / n_li:.1%}")

    #: at this scale the hot partition is tens of MB, under the 256 MB
    #: default split threshold — scale the knobs down the way the data
    #: is scaled down, so the probe exercises the same mechanism a
    #: multi-GB hot partition triggers with defaults at cluster scale
    _SPLIT_KNOBS = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    }

    def ff_probes(which):
        li = li_frames[which]

        def join_count() -> None:
            li.hint("shuffle_merge").join(
                orders_big, li["l_orderkey"] == orders_big["o_orderkey"]
            ).groupBy().agg(F.count(F.lit(1))).collect()

        def aqe_split():
            prev = {k: spark.conf.get(k, None) for k in _SPLIT_KNOBS}
            for k, v in _SPLIT_KNOBS.items():
                spark.conf.set(k, v)
            try:
                join_count()
            finally:
                for k, p in prev.items():
                    spark.conf.set(k, p) if p else spark.conf.unset(k)

        def no_aqe():
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                join_count()
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")

        return {
            "ff_join_aqe_split": aqe_split,
            "ff_join_aqe_default": join_count,
            "ff_join_noaqe": no_aqe,
        }

    ff_results: dict[str, dict[str, float]] = {"uniform": {}, "skewed": {}}
    for key in ff_probes("uniform"):
        for which in ("uniform", "skewed"):
            ff_results[which][key] = bench(
                f"{key} [{which}]", ff_probes(which)[key]
            )
    print("\nfact-fact ratios skewed/uniform:")
    for k in ff_results["uniform"]:
        print(
            f"  {k:20s} "
            f"{ff_results['skewed'][k] / ff_results['uniform'][k]:5.2f}x"
        )


if __name__ == "__main__":
    main()
