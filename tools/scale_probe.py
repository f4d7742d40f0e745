"""Measured-scaling probe: run representative operators at sf0.1 and at
a synthetic 10× blow-up, print the runtime ratio per query.

Evidence for SCALE.md's claims: an operator whose plan is scale-safe
(keyed shuffles, partial aggregation, no all-pairs, no driver loops)
should scale ~linearly in input size on fixed cores — a superlinear
ratio flags a quadratic candidate-pair explosion or a collapsed
single-partition stage.

The blow-up replicates each table 10× with key offsets (ids stay
unique, so join fan-outs and distinct counts scale honestly rather
than collapsing onto duplicate keys).  Writes under /tmp; run with
``python tools/scale_probe.py [replicas]``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
#: ``python tools/scale_probe.py rates [seconds_per_rate]`` switches to
#: the sustained-rate streaming latency probe (see main_rates below)
RATES_MODE = len(sys.argv) > 1 and sys.argv[1] == "rates"
_FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 and not RATES_MODE else 10
OUT = f"/tmp/spark_graft_scaleprobe_x{_FACTOR}"
REPLICAS = _FACTOR
ONLY = set(sys.argv[2:]) if not RATES_MODE else set()

#: queries whose plans SCALE.md argues about, one per operator family
PROBES = [
    "q1_pricing_summary",      # scan + aggregate
    "q5_region_revenue",       # multi-way star join
    "q18_large_orders",        # join + having + semi shape
    "docs_fingerprint_dedup",  # keyed dedup shuffle
    "docs_minhash_pairs",      # LSH banding (the sub-quadratic claim)
    "docs_simhash_pairs",      # pigeonhole bucketing (capped scale path)
    "docs_dupspan_coverage",   # span-level dedup (the never-f² claim)
    "media_neardup",           # two-level media dedup (r12: exact-compress → LSH)
    "events_sessionize",       # window functions
    "emb_lsh_topk",            # hyperplane LSH top-k
    "docs_hash_split",         # map-side split + tiny aggregate
    "events_hourly",           # time-bucket aggregate
    "load_events_star",        # connector load, fact path (scales 10x)
    "load_star3_roundtrip",    # connector load, dedup-heavy dim path
    "events_stream_dedup",     # streaming dedup state (bounded per key)
    "docs_stream_fuzzy_dedup", # streaming near-dup admission (LSH store)
    "docs_semantic_clusters_lsh",  # LSH pairs -> CC -> keep policy (r13)
    "docs_pack_sequences",     # distributed prefix sum (range_bucket)
    "docs_training_pipeline",  # composed flagship: gate→dedup→scrub→pack
    "docs_mixture_weights",    # water-filled mixture sampling (r13)
    "docs_orc_roundtrip",      # ORC write+read interchange (r13)
    "load_snapshot_diff",      # CDC changes feed over two commits (r13)
    "events_stream_cdc",       # streaming CDC source drain (r14)
    "load_incremental_histogram",  # vector_sum IVM refreshes (r14)
]

#: global-ordering probes additionally assert DETERMINISM at the blown-
#: up scale: the packed output must be bit-identical across two
#: INDEPENDENTLY-PLANNED executions (fresh frame each time).  The
#: round-10 split-brain class (repartitionByRange + spark_partition_id
#: branches disagreeing when AQE declines to reuse the range exchange)
#: only manifests when AQE compiles the branches differently — exactly
#: what big inputs provoke — so the test_plans.py:425 assertion is
#: re-run here at probe scale.
DETERMINISTIC = {"docs_pack_sequences", "docs_training_pipeline"}

# key columns to offset per table so replicas stay disjoint
OFFSETS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build_blowup(spark) -> None:
    """Replicate each table with disjoint key offsets into SINGLE parquet
    files (DuckDB COPY): streaming probes glob ``events.parquet`` as a
    file, so a Spark-written directory would silently stream 0 rows."""
    import duckdb

    con = duckdb.connect()
    for table, keys in OFFSETS.items():
        dst = f"{OUT}/{table}.parquet"
        if os.path.exists(dst):
            continue
        src = f"{BASE}/{table}.parquet"
        if not keys:  # fixed-cardinality dims replicate as-is (dedup'd)
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            continue
        spans = {
            k: con.sql(
                f"SELECT COALESCE(MAX({k}), 0) + 1 FROM '{src}'"
            ).fetchone()[0]
            for k in keys
        }
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        select = ", ".join(
            f"CAST({c} + i * {spans[c]} AS BIGINT) AS {c}" if c in spans else c
            for c in cols
        )
        con.sql(
            f"COPY (SELECT {select} FROM '{src}', range({REPLICAS}) t(i)) "
            f"TO '{dst}' (FORMAT PARQUET)"
        )


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sql_autoloader_spark.logutil import silence_benign_scheduler_spam
    silence_benign_scheduler_spam(spark)

    os.makedirs(OUT, exist_ok=True)
    build_blowup(spark)

    # overlay: time the pure LSH scale paths, not the registered
    # recall certificates (which embed quadratic exact twins)
    queries = {**entry_mod.queries(), **entry_mod.scale_path_queries()}
    print(f"{'query':28s} {'sf0.1':>8s} {'x' + str(REPLICAS):>8s} {'ratio':>7s}")
    for name in PROBES:
        if ONLY and name not in ONLY:
            continue
        fn = queries[name]
        times = {}
        for label, sf_dir in [("small", BASE), ("big", OUT)]:
            best = float("inf")
            # best-of-3: the container shares a noisy host — identical
            # code measures up to 4x apart across runs; the minimum
            # measures the code, the rest measure the neighbors
            for _ in range(3):
                t0 = time.time()
                fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            times[label] = best
        ratio = times["big"] / times["small"]
        print(
            f"{name:28s} {times['small']:8.2f} {times['big']:8.2f} "
            f"{ratio:6.1f}x"
        )
        if name in DETERMINISTIC:
            from pyspark.sql import functions as F

            def content_hash():
                # fresh construction → independent plan (AQE compiles
                # it from scratch, including boundary sampling)
                df = fn(spark, OUT)
                row = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.bit_xor(
                        F.xxhash64(*[F.col(c) for c in df.columns])
                    ).alias("h"),
                ).collect()[0]
                return row["n"], row["h"]

            a, b = content_hash(), content_hash()
            if a != b:
                msg = (
                    f"{name}: NONDETERMINISTIC at x{REPLICAS}: "
                    f"{a} != {b} — global-ordering corruption"
                )
                raise AssertionError(msg)
            print(
                f"{'':28s} determinism OK at x{REPLICAS}: "
                f"rows={a[0]} xxhash-xor={a[1] & 0xFFFFFFFFFFFFFFFF:016x}"
            )


# --------------------------------------------------------------------------
# Sustained-rate streaming latency probe (round 13)
# --------------------------------------------------------------------------
#
# SCALE.md's streaming rows measure batch-replay WALL time; a
# 100 TB/day pipeline cares about MICRO-BATCH latency under sustained
# input.  This mode drives Spark's `rate` source (rowsPerSecond) through
# the two stateful ingest entry points with NO trigger (back-to-back
# micro-batches, the self-pacing production shape) and reports, per
# input rate, the p50/p95 of `durationMs.triggerExecution` from the
# streaming-query progress JSON plus the achieved processing rate.  The
# knee is the rate where processedRowsPerSecond stops tracking the
# input rate (batches grow instead of the backlog draining).

#: synthetic document text, pure JVM expressions (~30 words/doc); every
#: 5 consecutive ids share a text base, so ~80% of arrivals are
#: near-dups of an admitted doc — real admission pressure on the store
def _synth_docs(stream):  # noqa: ANN001, ANN202
    from pyspark.sql import functions as F

    base = F.col("value") - (F.col("value") % 5)
    words = [
        F.concat(
            F.lit(f"w{i}x"),
            ((base * F.lit(2654435761) + F.lit(i * 97)) % F.lit(9973)).cast(
                "string"
            ),
        )
        for i in range(30)
    ]
    return stream.select(
        F.col("value").alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    )


def _run_rated(spark, make_query, rate: int, seconds: int) -> dict | None:  # noqa: ANN001
    """Start the stream at *rate* rows/s, run *seconds*, return latency
    stats from the progress log (None if fewer than 3 useful batches)."""
    import statistics

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        # one partition per rate-source task is plenty; the stateful
        # work repartitions on its own keys anyway
        .option("numPartitions", 4)
        .load()
    )
    query = make_query(stream)
    time.sleep(seconds)
    try:
        progresses = [p for p in query.recentProgress if p]
    finally:
        query.stop()
        query.awaitTermination(60)
    rows = []
    for p in progresses:
        n = p.get("numInputRows", 0)
        dur = (p.get("durationMs") or {}).get("triggerExecution")
        if n and dur:
            rows.append((n, dur / 1000.0, p.get("processedRowsPerSecond", 0.0)))
    if len(rows) < 4:
        return None
    rows = rows[1:]  # drop the first counted batch: JIT + state warmup
    durs = sorted(r[1] for r in rows)
    total_rows = sum(r[0] for r in rows)
    total_time = sum(r[1] for r in rows)
    return {
        "rate": rate,
        "batches": len(rows),
        "p50_s": statistics.median(durs),
        "p95_s": durs[max(0, int(round(0.95 * len(durs))) - 1)],
        "rows_per_batch": total_rows // len(rows),
        "achieved_rows_s": total_rows / total_time if total_time else 0.0,
    }


def main_rates() -> None:
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import SparkSession

    from sql_autoloader_spark.streaming import pipeline as streaming

    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 45
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stream-rate-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sql_autoloader_spark.logutil import silence_benign_scheduler_spam

    silence_benign_scheduler_spam(spark)

    header = (
        f"{'stream':10s} {'rate/s':>9s} {'batches':>7s} {'p50 s':>7s} "
        f"{'p95 s':>7s} {'rows/batch':>10s} {'achieved/s':>10s} {'keeps up':>8s}"
    )

    def report(tag: str, stats: dict | None, rate: int) -> None:
        if stats is None:
            print(f"{tag:10s} {rate:9d}  (too few batches in {seconds}s)")
            return
        # keeping up = the achieved processing rate covers the input
        # rate (5% slack for measurement noise at batch boundaries)
        ok = stats["achieved_rows_s"] >= 0.95 * rate
        print(
            f"{tag:10s} {stats['rate']:9d} {stats['batches']:7d} "
            f"{stats['p50_s']:7.2f} {stats['p95_s']:7.2f} "
            f"{stats['rows_per_batch']:10d} "
            f"{stats['achieved_rows_s']:10.0f} {'yes' if ok else 'NO':>8s}"
        )

    print(header)
    # --- fuzzy near-dup admission (unbounded signature-store state) ---
    for rate in (1_000, 5_000, 20_000, 50_000, 100_000):
        base = tempfile.mkdtemp(prefix=f"rateprobe_{uuid.uuid4().hex[:6]}_")

        def make_fuzzy(stream):  # noqa: ANN001, ANN202
            return streaming.fuzzy_dedup_stream(
                _synth_docs(stream),
                id_col="doc_id",
                text_col="text",
                store_path=f"{base}/store",
                out_path=f"{base}/admitted",
                checkpoint_dir=f"{base}/ckpt",
                trigger_available_now=False,
            )

        report("fuzzy", _run_rated(spark, make_fuzzy, rate, seconds), rate)
        shutil.rmtree(base, ignore_errors=True)

    # --- relational autoload (full load lifecycle per micro-batch) ---
    from pyspark.sql import functions as F

    from sql_autoloader_spark.connectors.spark_catalog import SparkConnector

    for rate in (500, 2_000, 10_000, 50_000):
        tag = uuid.uuid4().hex[:8]
        dbdir = tempfile.mkdtemp(prefix=f"ratedb_{tag}_")
        spark.sql(f"CREATE DATABASE rate_{tag} LOCATION '{dbdir}/db'")
        db = SparkConnector(spark, database=f"rate_{tag}")
        db.execute_ddl(
            """
            CREATE TABLE rp_brand (id INTEGER PRIMARY KEY, brand TEXT UNIQUE);
            CREATE TABLE rp_car (
                id INTEGER PRIMARY KEY,
                model TEXT UNIQUE,
                brand_id INTEGER REFERENCES rp_brand (id));
            """
        )

        def make_autoload(stream):  # noqa: ANN001, ANN202
            flat = stream.select(
                F.concat(F.lit("brand"), (F.col("value") % 50).cast("string"))
                .alias("brand"),
                F.concat(F.lit("model"), F.col("value").cast("string"))
                .alias("model"),
            )
            return streaming.autoload_stream(
                db,
                flat,
                checkpoint_dir=f"{dbdir}/ckpt",
                trigger_available_now=False,
            )

        report(
            "autoload", _run_rated(spark, make_autoload, rate, seconds), rate
        )
        spark.sql(f"DROP DATABASE rate_{tag} CASCADE")
        shutil.rmtree(dbdir, ignore_errors=True)


if __name__ == "__main__":
    main_rates() if RATES_MODE else main()
