"""Spark-vs-DuckDB ratio, measured at sf0.1 AND at a replicated ×N
blow-up (default ×10, reusing tools/scale_probe.py's builder).

The judge's 2×-throughput gate uses DuckDB running the oracle SQL as a
single-node stand-in baseline (the reference publishes no numbers).
At sf0.1 the comparison is dominated by Spark's fixed ~0.1-0.6 s/job
driver+AQE overhead; this tool measures how the ratio moves with size —
the claim to verify is that Spark's per-row cost is competitive and the
sf0.1 gap is overhead, not plan quality.

Usage: python tools/duckdb_ratio.py [replicas] [query ...]
Prints a per-query table (spark/duck best-of-3 at both scales) plus a
JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# argv[1] (replicas) is optional per the usage string: a non-numeric
# first arg is a query name — normalize BEFORE importing scale_probe,
# which derives its OUT/REPLICAS from sys.argv at import time
if len(sys.argv) > 1 and not sys.argv[1].isdigit():
    sys.argv.insert(1, "10")

import scale_probe  # noqa: E402 — shares argv convention: argv[1] = replicas

BASE = scale_probe.BASE
OUT = scale_probe.OUT
REPLICAS = scale_probe.REPLICAS
ONLY = set(sys.argv[2:])

#: the 15 oracle-able headline queries (bench.py HEADLINE minus the
#: load_* lifecycle queries — their DuckDB "oracle" is a read-only
#: SELECT vs Spark's full write-validate lifecycle — and the two
#: rows-only hash queries), grouped by operator family
FAMILIES = {
    "q1_pricing_summary": "scan+agg",
    "q3_shipping_priority": "join+agg",
    "q5_region_revenue": "star join",
    "q6_revenue_forecast": "scan+agg",
    "q18_large_orders": "join+having",
    "top_customers_per_nation": "window",
    "orders_monthly": "time agg",
    "docs_fingerprint_dedup": "dedup",
    "docs_token_stats": "text",
    "docs_quality": "text",
    "emb_cosine_topk": "ann",
    "events_hourly": "time agg",
    "events_dedup_first": "dedup",
    "events_sessionize": "window",
    "media_byte_stats": "multimodal",
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def best_of(fn, reps: int = 3) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("duckdb-ratio")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sql_autoloader_spark.logutil import silence_benign_scheduler_spam

    silence_benign_scheduler_spam(spark)

    os.makedirs(OUT, exist_ok=True)
    scale_probe.build_blowup(spark)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = [
        n for n in FAMILIES if not ONLY or n in ONLY
    ]

    # one DuckDB connection per scale, all tables as views
    cons = {}
    for label, path in (("sf0.1", BASE), (f"x{REPLICAS}", OUT)):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{path}/{t}.parquet')"
            )
        cons[label] = con

    # JVM warmup (same rationale as bench.py)
    for t in TABLES:
        entry_mod._t(spark, BASE, t).limit(1).count()
        entry_mod._t(spark, OUT, t).limit(1).count()

    rows = []
    hdr = (
        f"{'query':26s} {'family':>10s} "
        f"{'spark@0.1':>10s} {'duck@0.1':>9s} {'r@0.1':>6s} "
        f"{'spark@x' + str(REPLICAS):>10s} {'duck@x' + str(REPLICAS):>9s} "
        f"{'r@x' + str(REPLICAS):>6s}"
    )
    print(hdr)
    totals = {"s0": 0.0, "d0": 0.0, "s1": 0.0, "d1": 0.0}
    for name in names:
        q = queries[name]
        o = oracles[name]
        s0 = best_of(lambda: q(spark, BASE).count())
        d0 = best_of(lambda: cons["sf0.1"].sql(o).fetchall())
        s1 = best_of(lambda: q(spark, OUT).count())
        d1 = best_of(lambda: cons[f"x{REPLICAS}"].sql(o).fetchall())
        totals["s0"] += s0
        totals["d0"] += d0
        totals["s1"] += s1
        totals["d1"] += d1
        rows.append(
            {
                "query": name,
                "family": FAMILIES[name],
                "spark_base": round(s0, 3),
                "duck_base": round(d0, 3),
                "spark_blowup": round(s1, 3),
                "duck_blowup": round(d1, 3),
            }
        )
        print(
            f"{name:26s} {FAMILIES[name]:>10s} "
            f"{s0:10.3f} {d0:9.3f} {s0 / max(d0, 1e-9):6.2f} "
            f"{s1:10.3f} {d1:9.3f} {s1 / max(d1, 1e-9):6.2f}"
        )
    print("-" * len(hdr))
    print(
        f"{'TOTAL':26s} {'':>10s} "
        f"{totals['s0']:10.3f} {totals['d0']:9.3f} "
        f"{totals['s0'] / max(totals['d0'], 1e-9):6.2f} "
        f"{totals['s1']:10.3f} {totals['d1']:9.3f} "
        f"{totals['s1'] / max(totals['d1'], 1e-9):6.2f}"
    )
    print(
        json.dumps(
            {
                "metric": "duckdb_ratio",
                "replicas": REPLICAS,
                "ratio_base": round(
                    totals["s0"] / max(totals["d0"], 1e-9), 3
                ),
                "ratio_blowup": round(
                    totals["s1"] / max(totals["d1"], 1e-9), 3
                ),
                "queries": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
