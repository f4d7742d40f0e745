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
