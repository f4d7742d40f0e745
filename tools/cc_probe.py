"""Isolate connected_components cost on the real LSH pair list.

Usage: python tools/cc_probe.py <sf_dir> [reps]

Builds the embedding_neardup_pairs edge list once, pins it
(localCheckpoint) so pair generation is OUT of the timed region, then
times `dedup.connected_components(pairs)` to the noop sink (guide
S1.4), labeling each rep with a job group so the job count per rep is
exact.  Prints per-rep seconds + driver-job counts.
"""
from __future__ import annotations

import sys
import time

import os

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_autoloader_spark.functions import dedup, similarity  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("cc_probe")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = (
        similarity.embedding_neardup_pairs(
            emb,
            id_col="vec_id",
            vec_col="embedding",
            dim=64,
            threshold=0.45,
            planes=4,
            tables=32,
            max_bucket_size=512,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_edges = pairs.count()
    print(f"edges(pairs)={n_edges}")
    sc = spark.sparkContext
    for i in range(reps):
        group = f"cc_rep_{i}"
        sc.setJobGroup(group, f"cc rep {i}")
        t0 = time.perf_counter()
        comp = dedup.connected_components(pairs)
        comp.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"rep {i}: {dt:.3f}s  jobs={len(jobs)}")
        sc.setJobGroup("", "")
    spark.stop()


if __name__ == "__main__":
    main()
