"""One-off profiler for the loader lifecycle bench queries.

Runs the same work as ``q_load_events_star`` / ``q_load_star_roundtrip``
but with a per-phase stopwatch, so optimization targets the phase that
actually costs time.  Not part of the test suite.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from sql_autoloader_spark.connectors.spark_catalog import SparkConnector

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


class SW:
    def __init__(self) -> None:
        self.t0 = time.time()
        self.marks: list[tuple[str, float]] = []

    def mark(self, label: str) -> None:
        now = time.time()
        self.marks.append((label, now - self.t0))
        self.t0 = now

    def dump(self, title: str) -> None:
        total = sum(d for _, d in self.marks)
        print(f"== {title} (total {total:.3f}s)")
        for label, d in self.marks:
            print(f"   {label:<40s} {d:.3f}s")
        self.marks = []
        self.t0 = time.time()


def profile_events(spark: SparkSession) -> None:
    sw = SW()
    ev = entry_mod._t(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    sw.mark("read relation")
    db = SparkConnector(spark)
    db.expose_reconstruction = True
    sw.mark("connector ctor")
    db.execute_ddl(
        """
        CREATE TABLE be_etype (id INTEGER PRIMARY KEY, event_type TEXT UNIQUE);
        CREATE TABLE be_event (
            event_id BIGINT,
            etype_id INTEGER REFERENCES be_etype (id),
            value DOUBLE
        );
        """
    )
    sw.mark("execute_ddl")
    with db:
        db.load(ev)
        sw.mark("load()")
    sw.mark("commit/exit")
    n = db.last_reconstruction.count()
    sw.mark(f"final count ({n})")
    sw.dump("load_events_star")


def profile_star(spark: SparkSession) -> None:
    sw = SW()
    nation = entry_mod._t(spark, SF_DIR, "nation")
    region = entry_mod._t(spark, SF_DIR, "region")
    flat = nation.join(
        region, nation["n_regionkey"] == region["r_regionkey"]
    ).select(F.col("n_name").alias("name"), F.col("r_name").alias("region"))
    sw.mark("read relations")
    connector = SparkConnector(spark)
    connector.expose_reconstruction = True
    connector.execute_ddl(
        """
        CREATE TABLE dim_region (
            id INTEGER PRIMARY KEY,
            region TEXT UNIQUE
        );
        CREATE TABLE dim_nation (
            id INTEGER PRIMARY KEY,
            name TEXT UNIQUE,
            region_id INTEGER REFERENCES dim_region (id)
        );
        """
    )
    sw.mark("execute_ddl")
    with connector:
        connector.load(flat)
        sw.mark("load()")
    sw.mark("commit/exit")
    n = connector.last_reconstruction.count()
    sw.mark(f"final count ({n})")
    sw.dump("load_star_roundtrip")


def instrument() -> None:
    """Wrap the lifecycle internals with stopwatches (prints per call)."""
    import sql_autoloader_spark.connectors.base as base_mod
    import sql_autoloader_spark.ops.dataframe_ops as ops_mod

    def timed(cls_or_mod, name: str) -> None:
        orig = getattr(cls_or_mod, name)

        def wrapper(*args, **kwargs):
            t0 = time.time()
            out = orig(*args, **kwargs)
            print(f"      [{name}] {time.time() - t0:.3f}s")
            return out

        setattr(cls_or_mod, name, wrapper)

    timed(base_mod.BaseConnector, "_insert_and_retrieve_counted")
    timed(base_mod.BaseConnector, "insert")
    timed(base_mod.BaseConnector, "compare")
    timed(base_mod.BaseConnector, "_execute_compare_query")
    timed(ops_mod, "check_merge_invariants")
    timed(ops_mod, "validate_load_compare")
    timed(ops_mod, "_compare_grouped")
    timed(ops_mod, "_validate_grouped")
    timed(ops_mod, "preprocess")
    timed(ops_mod, "distinct_rows")

    import sql_autoloader_spark.connectors.spark_catalog as cat_mod

    timed(cat_mod.SparkConnector, "_write_new_rows")
    timed(cat_mod.SparkConnector, "_register_view")

    import sql_autoloader_spark.schema.graph as graph_mod

    timed(graph_mod.Schema, "get_compare_query")
    timed(ops_mod, "match_dtypes")
    from pyspark.sql.classic.dataframe import DataFrame as DF2

    for m in ("localCheckpoint", "cache", "first", "count", "collect"):
        orig_m = getattr(DF2, m)

        def make(orig_m=orig_m, m=m):
            def wrapper(self, *a, **kw):
                t0 = time.time()
                out = orig_m(self, *a, **kw)
                dt = time.time() - t0
                if dt > 0.02:
                    print(f"        [DF.{m}] {dt:.3f}s")
                return out

            return wrapper

        setattr(DF2, m, make())
    from pyspark.sql import DataFrame as DF

    orig_count = DF.count

    def count(self):
        t0 = time.time()
        out = orig_count(self)
        print(f"      [DataFrame.count] {time.time() - t0:.3f}s")
        return out

    DF.count = count


def main() -> None:
    import tempfile

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    print(f"event log dir: {evdir}")
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-load")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sql_autoloader_spark.logutil import silence_benign_scheduler_spam
    silence_benign_scheduler_spam(spark)

    # warmup identical in spirit to bench.py
    for t in entry_mod._TABLES:
        entry_mod._t(spark, SF_DIR, t).limit(1).count()
    wdb = SparkConnector(spark)
    wdb.execute_ddl(
        "CREATE TABLE __warm_a (id INTEGER PRIMARY KEY, a TEXT UNIQUE);"
        "CREATE TABLE __warm_b (a_id INTEGER REFERENCES __warm_a (id),"
        " b TEXT UNIQUE);"
    )
    with wdb:
        wdb.load(spark.createDataFrame([("x", "y")], "a string, b string"))

    for _ in range(2):
        profile_events(spark)
    for _ in range(2):
        profile_star(spark)
    print("---- instrumented runs ----")
    instrument()
    profile_events(spark)
    profile_star(spark)


if __name__ == "__main__":
    main()
