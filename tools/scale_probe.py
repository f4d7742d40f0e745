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
OUT = "/tmp/spark_graft_scaleprobe"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10

#: queries whose plans SCALE.md argues about, one per operator family
PROBES = [
    "q1_pricing_summary",      # scan + aggregate
    "q5_region_revenue",       # multi-way star join
    "q18_large_orders",        # join + having + semi shape
    "docs_fingerprint_dedup",  # keyed dedup shuffle
    "docs_minhash_pairs",      # LSH banding (the sub-quadratic claim)
    "events_sessionize",       # window functions
    "emb_lsh_topk",            # hyperplane LSH top-k
    "docs_hash_split",         # map-side split + tiny aggregate
]

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
    from pyspark.sql import functions as F

    for table, keys in OFFSETS.items():
        dst = f"{OUT}/{table}.parquet"
        if os.path.exists(dst):
            continue
        if table == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{BASE}/{table}.parquet")
        if not keys:  # fixed-cardinality dims replicate as-is (dedup'd)
            df.write.mode("overwrite").parquet(dst)
            continue
        span = {
            k: (df.agg(F.max(k)).first()[0] or 0) + 1 for k in keys
        }
        parts = []
        for i in range(REPLICAS):
            part = df
            for k in keys:
                part = part.withColumn(
                    k, (F.col(k) + F.lit(i * span[k])).cast(df.schema[k].dataType)
                )
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dst)


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

    os.makedirs(OUT, exist_ok=True)
    build_blowup(spark)

    queries = entry_mod.queries()
    print(f"{'query':28s} {'sf0.1':>8s} {'x' + str(REPLICAS):>8s} {'ratio':>7s}")
    for name in PROBES:
        fn = queries[name]
        times = {}
        for label, sf_dir in [("small", BASE), ("big", OUT)]:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fn(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            times[label] = best
        ratio = times["big"] / times["small"]
        print(
            f"{name:28s} {times['small']:8.2f} {times['big']:8.2f} "
            f"{ratio:6.1f}x"
        )


if __name__ == "__main__":
    main()
