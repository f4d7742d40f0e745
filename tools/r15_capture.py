"""Round-15 optimization harness: capture plans and (optionally) time
headline queries in isolation.

``python tools/r15_capture.py plans`` — write
``plans/r15/<query>_<tag>.txt`` with ``explain("formatted")`` for every
headline query whose returned frame has a meaningful plan (the loader
lifecycle queries execute on build; their phase profile comes from
``tools/profile_load.py`` instead).

``python tools/r15_capture.py time [names...]`` — per-query timing at
$SPARK_GRAFT_SF_DIR: warm-up rep then best-of-5 of the bench's
``df.count()`` action, plus a job count per rep (statusTracker delta).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from bench import HEADLINE

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TAG = os.environ.get("R15_TAG", "before")

# lifecycle queries: the returned frame is a pinned reconstruction, the
# interesting work happens on build — skip plan capture, profile instead
LIFECYCLE = {"load_star_roundtrip", "load_events_star"}


def make_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("r15-capture")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sql_autoloader_spark.logutil import silence_benign_scheduler_spam

    silence_benign_scheduler_spam(spark)
    return spark


def warmup(spark) -> None:
    from pyspark.sql import functions as F

    for t in entry_mod._TABLES:
        entry_mod._t(spark, SF_DIR, t).limit(1).count()
    warm = entry_mod._t(spark, SF_DIR, "region")
    warm.groupBy("r_name").count().count()
    warm.alias("a").join(warm.alias("b"), on="r_regionkey").count()
    warm.select(F.md5(F.col("r_name"))).count()
    warm.select(
        F.transform(F.split("r_name", " "), lambda x: F.xxhash64(x))
    ).count()
    warm.select(
        F.regexp_replace(F.lower("r_name"), "[^a-z0-9\\s]", " ")
    ).count()
    from sql_autoloader_spark.connectors.spark_catalog import SparkConnector

    wdb = SparkConnector(spark)
    wdb.execute_ddl(
        "CREATE TABLE __warm_a (id INTEGER PRIMARY KEY, a TEXT UNIQUE);"
        "CREATE TABLE __warm_b (a_id INTEGER REFERENCES __warm_a (id),"
        " b TEXT UNIQUE);"
    )
    with wdb:
        wdb.load(spark.createDataFrame([("x", "y")], "a string, b string"))


def capture_plans() -> None:
    spark = make_spark()
    queries = {**entry_mod.queries(), **entry_mod.scale_path_queries()}
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in HEADLINE:
        if name in LIFECYCLE:
            continue
        df = queries[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{TAG}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")


def time_queries(names: list[str]) -> None:
    spark = make_spark()
    warmup(spark)
    queries = {**entry_mod.queries(), **entry_mod.scale_path_queries()}
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names or HEADLINE:
        best, reps = None, []
        last_stats = ""
        for rep in range(5):
            group = f"{name}-rep{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            n = df.count()
            dt = time.time() - t0
            sc.setLocalProperty("spark.jobGroup.id", None)
            reps.append(round(dt, 3))
            if best is None or dt < best:
                best = dt
                jids = sorted(tracker.getJobIdsForGroup(group) or [])
                stages, tasks = 0, 0
                for jid in jids:
                    ji = tracker.getJobInfo(jid)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None and si.numTasks > 0:
                            stages += 1
                            tasks += si.numTasks
                last_stats = (
                    f"jobs={len(jids)} stages={stages} tasks={tasks}"
                )
        print(
            f"{name:34s} best={best:.3f}s reps={reps} rows={n} {last_stats}"
        )


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "plans"
    if cmd == "plans":
        capture_plans()
    else:
        time_queries(sys.argv[2:])
