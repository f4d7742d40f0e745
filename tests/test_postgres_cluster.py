"""The PostgreSQL COPY paths across a REAL process boundary.

In ``local[n]`` mode executors share the driver process, so the pickled
partition writers/readers and their TCP dials are exercised without
ever crossing a process boundary.  ``local-cluster[2,1,1024]`` forks
two genuine executor JVMs (each with its own Python workers), which is
the closest in-container approximation of a multi-machine cluster: the
closures must actually pickle, and every COPY connection is a real TCP
socket from a foreign process — exactly the topology of executors
dialing a warehouse.

The test runs in a subprocess (a second SparkContext cannot coexist
with the session-scoped fixture) and is among the slowest in the suite
— deliberately, like tests/test_cross_process.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from sql_autoloader_spark.connectors.pgwire import EmbeddedPostgres

pytestmark = pytest.mark.skipif(
    not EmbeddedPostgres.available(),
    reason="PostgreSQL server binaries not available",
)

REPO = str(Path(__file__).resolve().parent.parent)

_CHILD = """
import json
from pyspark.sql import SparkSession

from sql_autoloader_spark.connectors.pgwire import EmbeddedPostgres
from sql_autoloader_spark.connectors.postgres import PostgresConnector

spark = (
    SparkSession.builder.master("local-cluster[2,1,1024]")
    .config("spark.executor.memory", "1024m")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

with EmbeddedPostgres(tcp=True) as server:
    server.createdb("clusterdb")
    db = PostgresConnector(
        spark,
        host=server.host,
        port=server.port,
        database="clusterdb",
        copy_threshold=0,      # every write takes the distributed COPY path
        read_copy_bytes=64 << 10,  # the fact read takes the ctid-range path
    )
    db.execute_ddl(
        '''
        CREATE TABLE dim_kind (
            id bigint GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
            kind text UNIQUE);
        CREATE TABLE fact_obs (
            kind_id bigint REFERENCES dim_kind (id),
            payload text, amount double precision);
        CREATE TABLE obs_note (fo bigint, note text);
        '''
    )
    n = 20000
    flat = spark.range(n).selectExpr(
        "concat('kind_', id % 13) AS kind",
        "concat('p_', id, repeat('y', 30)) AS payload",
        "cast(id AS double) / 3 AS amount",
    )
    before = db.client.data_rows
    with db:
        db.load(flat)
    driver_rows = db.client.data_rows - before
    (fact_count,) = db.client.query("SELECT count(*) FROM fact_obs").rows[0]
    # idempotency across the process boundary too
    with db:
        db.load(flat)
    (fact_count2,) = db.client.query("SELECT count(*) FROM fact_obs").rows[0]
    # distributed ctid-range read from executor processes
    frame = db._read_table("fact_obs")
    read_parts = frame.rdd.getNumPartitions()
    read_count = frame.count()
    db.close()

print("RESULT " + json.dumps({
    "fact_count": fact_count,
    "fact_count2": fact_count2,
    "driver_rows": driver_rows,
    "read_parts": read_parts,
    "read_count": read_count,
}))
spark.stop()
"""


def test_copy_paths_across_real_executor_processes(tmp_path) -> None:  # noqa: ANN001
    path = tmp_path / "cluster_child.py"
    path.write_text(_CHILD)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(  # noqa: S603 - our own script
        [sys.executable, str(path)],
        capture_output=True,
        text=True,
        env=env,
        timeout=540,
        check=False,
    )
    assert proc.returncode == 0, f"child failed:\n{proc.stdout}\n{proc.stderr[-4000:]}"
    line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    ]
    assert line, f"no RESULT line:\n{proc.stdout}"
    res = json.loads(line[-1][len("RESULT ") :])
    assert res["fact_count"] == 20000
    assert res["fact_count2"] == 20000  # idempotent reload
    assert res["read_count"] == 20000
    assert res["read_parts"] > 1  # genuinely ranged
    # dimension scans + checksum only — never the fact
    assert res["driver_rows"] < 300, res["driver_rows"]


_RACE_CHILD = """
import json, os, sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sql_autoloader_spark.connectors.postgres import PostgresConnector

tag = sys.argv[1]
sock_dir = sys.argv[2]
port = int(sys.argv[3])
barrier = sys.argv[4]
rounds = int(sys.argv[5])

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# OVERLAPPING payload: both writers share every maker and half the
# cars; each also brings cars only it inserts
rows = sorted(
    [(f"m{i % 5:02d}", f"c_sh_{i:02d}") for i in range(10)]
    + [(f"m{i % 5:02d}", f"c_{tag}_{i:02d}") for i in range(10)]
)
flat = spark.createDataFrame(rows, "maker string, car string")

db = PostgresConnector(
    spark, sock_dir=sock_dir, port=port, database="racedb"
)

open(f"{barrier}/ready_{tag}", "w").close()
deadline = time.time() + 600
while not os.path.exists(f"{barrier}/go"):
    if time.time() > deadline:
        sys.exit(3)  # orphan guard: never idle a JVM forever
    time.sleep(0.05)

counts, retries = [], 0
for i in range(rounds):
    for attempt in range(3):
        try:
            # exact=False is the multi-writer contract: validate MY
            # rows landed (subset), never that I own the whole content
            with db:
                out = db.load(flat, exact=False)
                nulls = out.select(
                    sum(
                        F.count(F.when(F.col(c).isNull(), 1))
                        for c in out.columns
                    ).alias("n")
                ).collect()[0]["n"]
                n = out.count()
            break
        except Exception as e:  # noqa: BLE001
            # concurrent overlapping multi-row inserts can deadlock;
            # PostgreSQL aborts one victim — the contract is retry
            if "deadlock" not in str(e).lower() or attempt == 2:
                raise
            retries += 1
    assert nulls == 0, f"round {i}: NULL foreign keys after merge"
    counts.append(n)

db.close()
print("RESULT " + json.dumps({"counts": counts, "retries": retries}))
spark.stop()
"""


def test_two_driver_processes_race_overlapping_loads(
    tmp_path, spark  # noqa: ANN001
) -> None:
    """SURVEY §7.4 hard-part #1, the cross-PROCESS form: two driver
    processes ``load()`` OVERLAPPING dimension data into one live
    PostgreSQL simultaneously.  ON CONFLICT makes the inserts
    idempotent, and each process's key retrieve-and-merge runs under
    READ COMMITTED — it may observe the other writer's rows mid-load
    (an insert that conflicts with an UNCOMMITTED row blocks until that
    transaction resolves, then the per-statement snapshot sees the
    winner).  Both processes must end every round with complete,
    non-null key merges; afterwards a third connector (this process)
    must find each unique key exactly once and the exact compare of the
    UNION payload must pass.  The isolation contract is documented in
    OPERATIONS.md."""
    from pyspark.sql import functions as F  # noqa: F401

    from sql_autoloader_spark.connectors.postgres import PostgresConnector

    barrier = tmp_path / "barrier"
    barrier.mkdir()
    server = EmbeddedPostgres().start()
    try:
        server.createdb("racedb")
        ddl_db = PostgresConnector(
            spark, sock_dir=server.sock_dir, port=server.port,
            database="racedb",
        )
        ddl_db.execute_ddl(
            """
            CREATE TABLE maker (
                id bigint GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
                maker text UNIQUE);
            CREATE TABLE car (
                id bigint GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
                car text UNIQUE,
                maker_id bigint REFERENCES maker (id));
            """
        )

        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        script = tmp_path / "race_child.py"
        script.write_text(_RACE_CHILD)
        kids = [
            subprocess.Popen(  # noqa: S603 - our own script
                [sys.executable, str(script), tag, server.sock_dir,
                 str(server.port), str(barrier), "4"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env=env, text=True,
            )
            for tag in ("1", "2")
        ]
        import time as _time
        deadline = _time.time() + 900
        while _time.time() < deadline:
            if all(
                (barrier / f"ready_{t}").exists() for t in ("1", "2")
            ):
                break
            _time.sleep(0.1)
        else:
            msg = "children never became ready"
            raise AssertionError(msg)
        (barrier / "go").touch()

        results = []
        for k in kids:
            out, err = k.communicate(timeout=1200)
            assert k.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
            line = [
                ln for ln in out.splitlines() if ln.startswith("RESULT ")
            ]
            assert line, f"no RESULT line:\n{out}\n{err[-2000:]}"
            res = json.loads(line[-1][len("RESULT ") :])
            assert res["counts"] == [20, 20, 20, 20], res
            results.append(res)

        # third-process verification: each unique key exactly once
        q = ddl_db.client.query
        (makers,) = q("SELECT count(*) FROM maker").rows[0]
        (m_dist,) = q("SELECT count(DISTINCT maker) FROM maker").rows[0]
        (cars,) = q("SELECT count(*) FROM car").rows[0]
        (c_dist,) = q("SELECT count(DISTINCT car) FROM car").rows[0]
        assert makers == m_dist == 5
        assert cars == c_dist == 30  # 10 shared + 10 per child
        (null_fk,) = q(
            "SELECT count(*) FROM car WHERE maker_id IS NULL"
        ).rows[0]
        assert null_fk == 0
        # union compare: the warehouse holds exactly both payloads
        union_rows = sorted(
            {
                (f"m{i % 5:02d}", f"c_sh_{i:02d}") for i in range(10)
            }
            | {
                (f"m{i % 5:02d}", f"c_{t}_{i:02d}")
                for t in ("1", "2")
                for i in range(10)
            }
        )
        union = spark.createDataFrame(
            union_rows, "maker string, car string"
        )
        ddl_db.compare(union, exact=True)
        ddl_db.close()
    finally:
        server.destroy()
