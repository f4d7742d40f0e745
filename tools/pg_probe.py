"""Measured scaling of the PostgreSQL sink's three data movements.

For each lifecycle movement the sink has a driver-bounded path and a
scale path; this probe runs BOTH against the same embedded server and
the same sf0.1 events star, printing wall time and the DataRow count
on the lifecycle connection (the driver-bottleneck witness):

- write:     driver VALUES-INSERT path  vs  distributed COPY path
- validate:  row-pull grouped compare   vs  in-database checksum
- read:      driver SELECT *            vs  distributed ctid ranges

Run: ``python tools/pg_probe.py [replicas]`` (replicas scales events
×N with disjoint ids; default 1 = sf0.1's ~75k fact rows).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 1

DDL = """
    CREATE TABLE pp_etype (
        id bigint GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
        event_type text UNIQUE
    );
    CREATE TABLE pp_event (
        event_id bigint,
        etype_id bigint REFERENCES pp_etype (id),
        value double precision
    );
"""


def _timed_once(db, tbl, trickle) -> float:  # noqa: ANN001
    t0 = time.time()
    db._write_new_rows(
        tbl, trickle, ["event_id", "value"], payload_bound=200
    )
    return time.time() - t0


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sql_autoloader_spark.connectors.pgwire import EmbeddedPostgres
    from sql_autoloader_spark.connectors.postgres import PostgresConnector

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{BASE}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    if REPLICAS > 1:
        span = ev.agg(F.max("event_id")).first()[0] + 1
        ev = ev.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("__i"))
        ).select(
            (F.col("event_id") + F.col("__i") * span).alias("event_id"),
            "event_type",
            "value",
        )
    ev = ev.localCheckpoint(eager=True)
    n = ev.count()
    print(f"fact rows: {n}")

    def timed(label, fn):  # noqa: ANN001, ANN202
        t0 = time.time()
        out = fn()
        print(f"  {label:46s} {time.time() - t0:7.2f}s")
        return out

    def bench(server, label, **kwargs):  # noqa: ANN001, ANN003, ANN202
        server.createdb(label)
        db = PostgresConnector(
            spark,
            sock_dir=server.sock_dir,
            port=server.port,
            database=label,
            **kwargs,
        )
        db.execute_ddl(DDL)
        before = db.client.data_rows
        t0 = time.time()
        with db:
            db.load(ev)
        wall = time.time() - t0
        rows = db.client.data_rows - before
        print(f"  {label:30s} {wall:7.2f}s  driver DataRows: {rows}")
        return db

    with EmbeddedPostgres() as server:
        # -- write + validate combinations ----------------------------------
        # scale posture: COPY write + in-database checksum validate
        db = bench(server, "copy_write_checksum", copy_threshold=1000)
        # idempotent RELOAD = the incremental posture: the staging
        # merge anti-joins a full-size staging against a full-size
        # target (the shape where a non-hashable join condition
        # explodes quadratically)
        before = db.client.data_rows
        t0 = time.time()
        with db:
            db.load(ev)
        print(
            f"  {'copy_reload_full_overlap':30s} {time.time() - t0:7.2f}s"
            f"  driver DataRows: {db.client.data_rows - before}"
        )
        # COPY write, validation forced onto the row-pull path (the
        # pre-r9 shape): disable the server-side hook before loading
        server.createdb("copy_pull")
        db2 = PostgresConnector(
            spark,
            sock_dir=server.sock_dir,
            port=server.port,
            database="copy_pull",
            copy_threshold=1000,
        )
        db2._serverside_fast_compare = (  # type: ignore[method-assign]
            lambda *a, **k: None
        )
        db2.execute_ddl(DDL)
        before = db2.client.data_rows
        t0 = time.time()
        with db2:
            db2.load(ev)
        print(
            f"  {'copy_write_pull_validate':30s} {time.time() - t0:7.2f}s"
            f"  driver DataRows: {db2.client.data_rows - before}"
        )
        # driver VALUES-INSERT write (threshold above the fact size)
        db3 = bench(server, "driver_write_checksum", copy_threshold=n + 1)

        # -- incremental reload vs target size: the EXCEPT skip -------------
        # A covering PK lets the merge drop its `EXCEPT SELECT … FROM
        # target` pre-filter (ON CONFLICT alone is idempotent), so a
        # fixed trickle into a UNIQUE-keyed table should cost the same
        # no matter how big the target is, while the constraint-less
        # table's EXCEPT layer scans the whole heap per load.
        server.createdb("skiprobe")
        db4 = PostgresConnector(
            spark,
            sock_dir=server.sock_dir,
            port=server.port,
            database="skiprobe",
            copy_threshold=1000,
        )
        db4.execute_ddl(
            "CREATE TABLE uq_event (event_id bigint PRIMARY KEY,"
            "                       value double precision);"
            "CREATE TABLE cl_event (event_id bigint,"
            "                       value double precision)"
        )
        trickle = (
            spark.range(200)
            .select(
                (F.col("id") - 1_000_000).alias("event_id"),
                (F.col("id") * 0.25).alias("value"),
            )
            .localCheckpoint(eager=True)
        )
        for target_rows in (200_000, 2_000_000):
            for tbl in ("uq_event", "cl_event"):
                db4.client.execute(f"TRUNCATE {tbl}")
                db4.client.execute(
                    f"INSERT INTO {tbl} SELECT g, g * 0.5"
                    f" FROM generate_series(1, {target_rows}) g"
                )
                db4.client.execute(f"ANALYZE {tbl}")
                # time the write movement itself (insert's subset
                # verification is a separate, already-probed movement)
                wall = min(
                    _timed_once(
                        db4, tbl, trickle
                    )
                    for _ in range(3)
                )
                mode = (
                    "skip-EXCEPT" if tbl == "uq_event" else "EXCEPT-scan"
                )
                print(
                    f"  trickle 200 rows → {tbl} ({mode}),"
                    f" target {target_rows:>9,}: "
                    f"{wall:7.3f}s (best of 3)"
                )
        db4.close()

        # -- read: distributed ctid ranges vs driver SELECT * --------------
        fact_bytes = db._table_size("pp_event")
        print(f"fact on disk: {fact_bytes >> 20} MiB")
        db.read_copy_bytes = 1 << 62  # force driver read
        timed("read driver SELECT *", lambda: db._read_table("pp_event").count())
        db.read_copy_bytes = 64 << 10  # force distributed read
        timed(
            "read distributed ctid COPY-out",
            lambda: db._read_table("pp_event").count(),
        )
        for conn in (db, db2, db3):
            conn.close()


if __name__ == "__main__":
    main()
