"""Catalog-database mode: metadata persists as table properties and a
new connector re-introspects committed state (the analogue of reopening
a SQLite file, reference tests/test_sqlite_connector.py:117-127,224-227).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from sql_autoloader_spark.connectors.spark_catalog import SparkConnector


def test_database_mode_roundtrip_and_reopen(spark: SparkSession) -> None:
    data = spark.createDataFrame(
        [("Toyota", "Corolla"), ("Ford", "Focus")], "brand string, model string"
    )
    db = SparkConnector(spark, database="persisttest")
    db.execute_ddl(
        """
        CREATE TABLE p_brand (id INTEGER PRIMARY KEY, brand TEXT UNIQUE);
        CREATE TABLE p_car (
            id INTEGER PRIMARY KEY,
            model TEXT UNIQUE,
            brand_id INTEGER REFERENCES p_brand (id)
        );
        """
    )
    with db:
        db.load(data)

    # a brand-new connector must re-introspect everything from the catalog
    db2 = SparkConnector(spark, database="persisttest")
    assert not db2.schema_is_empty()
    assert db2._read_table("p_brand").count() == 2
    assert db2._read_table("p_car").count() == 2
    assert db2._meta["p_car"].references == [("brand_id", "p_brand", "id")]
    assert db2._meta["p_car"].unique_constraints == [["model"]]

    # and loading the same data through it stays idempotent
    with db2:
        db2.load(data)
    assert db2._read_table("p_brand").count() == 2
    assert db2._read_table("p_car").count() == 2


def test_partitioned_fact_table_layout_and_reopen(spark: SparkSession) -> None:
    """partition_by lands managed tables physically partitioned, the
    spec survives reopen via table properties, and filtered scans prune
    partitions (the 100 TB fact-table layout path)."""
    from pyspark.sql import functions as F

    data = spark.createDataFrame(
        [("NL", "a"), ("NL", "b"), ("DE", "c")],
        "country string, payload string",
    )
    db = SparkConnector(
        spark, database="parttest", partition_by={"pt_fact": ["country"]}
    )
    db.execute_ddl(
        """
        CREATE TABLE pt_fact (
            id INTEGER PRIMARY KEY,
            payload TEXT UNIQUE,
            country TEXT
        );
        """
    )
    with db:
        db.load(data)
    assert db._read_table("pt_fact").count() == 3

    cols = spark.catalog.listColumns("pt_fact", "parttest")
    assert [c.name for c in cols if c.isPartition] == ["country"]

    scan = spark.table("parttest.pt_fact").where(F.col("country") == "NL")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "country" in plan.split("PartitionFilters", 1)[-1].split("\n")[0]
    assert scan.count() == 2

    # a reopened connector restores the partition spec from properties
    # and keeps appending into the partitioned layout, idempotently
    db2 = SparkConnector(spark, database="parttest")
    assert db2.partition_by == {"pt_fact": ["country"]}
    more = spark.createDataFrame(
        [("NL", "a"), ("FR", "d")], "country string, payload string"
    )
    with db2:
        db2.load(more, exact=False)
    assert db2._read_table("pt_fact").count() == 4


def test_partition_by_unknown_column_rejected(spark: SparkSession) -> None:
    db = SparkConnector(
        spark, database="parttest2", partition_by={"pt_bad": ["nope"]}
    )
    try:
        db.execute_ddl("CREATE TABLE pt_bad (id INTEGER PRIMARY KEY, x TEXT);")
    except ValueError as err:
        assert "nope" in str(err)
    else:
        raise AssertionError("expected ValueError for unknown partition column")


def test_commit_failure_leaves_no_partial_state(
    spark: SparkSession, monkeypatch: "pytest.MonkeyPatch"
) -> None:
    """A failure between per-table appends during commit must leave NO
    table showing the transaction's rows — the manifest protocol's
    whole-block atomicity (reference sqlite_connector.py:197-204)."""
    import pytest

    data = spark.createDataFrame(
        [("Toyota", "Corolla"), ("Ford", "Focus")], "brand string, model string"
    )
    db = SparkConnector(spark, database="atomictest")
    db.execute_ddl(
        """
        CREATE TABLE at_brand (id INTEGER PRIMARY KEY, brand TEXT UNIQUE);
        CREATE TABLE at_car (
            id INTEGER PRIMARY KEY,
            model TEXT UNIQUE,
            brand_id INTEGER REFERENCES at_brand (id)
        );
        """
    )

    calls = {"n": 0}
    real = SparkConnector._append_epoch

    def fail_second(self, table, new_rows, cid):  # noqa: ANN001, ANN202
        calls["n"] += 1
        if calls["n"] == 2:
            msg = "simulated crash between per-table appends"
            raise RuntimeError(msg)
        real(self, table, new_rows, cid)

    monkeypatch.setattr(SparkConnector, "_append_epoch", fail_second)
    with pytest.raises(RuntimeError, match="simulated crash"), db:
        db.load(data)
    monkeypatch.undo()

    # the same connector AND a fresh one (simulated restart) both see
    # fully-empty tables — the first table's landed rows were swept /
    # are invisible
    for conn in (db, SparkConnector(spark, database="atomictest")):
        assert conn._read_table("at_brand").count() == 0
        assert conn._read_table("at_car").count() == 0

    # and the database is fully usable afterwards: the same load commits
    with db:
        db.load(data)
    assert db._read_table("at_brand").count() == 2
    assert db._read_table("at_car").count() == 2


def test_crash_without_sweep_recovers_on_reopen(
    spark: SparkSession, monkeypatch: "pytest.MonkeyPatch"
) -> None:
    """Hard-crash simulation: the failing commit gets NO chance to sweep
    (process death).  Orphan rows stay physically present but invisible,
    and the next connector open sweeps them before new writes."""
    import pytest

    from sql_autoloader_spark.connectors import spark_catalog as sc

    data = spark.createDataFrame(
        [("Toyota", "Corolla"), ("Ford", "Focus")], "brand string, model string"
    )
    db = SparkConnector(spark, database="crashtest")
    db.execute_ddl(
        """
        CREATE TABLE cr_brand (id INTEGER PRIMARY KEY, brand TEXT UNIQUE);
        CREATE TABLE cr_car (
            id INTEGER PRIMARY KEY,
            model TEXT UNIQUE,
            brand_id INTEGER REFERENCES cr_brand (id)
        );
        """
    )

    calls = {"n": 0}
    real = SparkConnector._append_epoch

    def fail_second(self, table, new_rows, cid):  # noqa: ANN001, ANN202
        calls["n"] += 1
        if calls["n"] == 2:
            msg = "simulated process death"
            raise RuntimeError(msg)
        real(self, table, new_rows, cid)

    monkeypatch.setattr(SparkConnector, "_append_epoch", fail_second)
    monkeypatch.setattr(
        SparkConnector,
        "_sweep_orphans",
        lambda self, tables, only_token=None: None,
    )
    with pytest.raises(RuntimeError, match="process death"), db:
        db.load(data)
    monkeypatch.undo()

    # orphan rows are physically present in the first-appended table...
    raw_counts = {
        t: spark.table(f"crashtest.{t}").count() for t in ("cr_brand", "cr_car")
    }
    assert sum(raw_counts.values()) > 0
    # ...but a reopened connector recovers: nothing visible, orphans gone
    db2 = SparkConnector(spark, database="crashtest")
    assert db2._read_table("cr_brand").count() == 0
    assert db2._read_table("cr_car").count() == 0
    assert all(
        spark.table(f"crashtest.{t}").count() == 0
        for t in ("cr_brand", "cr_car")
    )
    with db2:
        db2.load(data)
    assert db2._read_table("cr_brand").count() == 2
    assert db2._read_table("cr_car").count() == 2


def test_bucketed_fact_tables_join_without_exchange(
    spark: SparkSession,
) -> None:
    """bucket_by lands managed tables hash-bucketed: the spec survives
    reopen via table properties, appended data keeps the layout, and a
    join between two tables bucketed on the same key runs with zero
    runtime exchange — the write paid the shuffle once."""
    from pyspark.sql import functions as F

    data = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "k long, tag string, v double",
    )
    db = SparkConnector(
        spark,
        database="buckettest",
        bucket_by={"bk_left": (4, ["k"]), "bk_right": (4, ["k"])},
    )
    db.execute_ddl(
        """
        CREATE TABLE bk_left (k BIGINT, tag TEXT, v DOUBLE);
        CREATE TABLE bk_right (k BIGINT, tag TEXT, v DOUBLE);
        """
    )
    with db:
        db.insert(data, table="bk_left")
        db.insert(data, table="bk_right")

    # reopened connector re-learns the layout from table properties
    db2 = SparkConnector(spark, database="buckettest")
    assert db2.bucket_by["bk_left"] == (4, ["k"])

    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.table("buckettest.bk_left").select("k", "v")
        right = spark.table("buckettest.bk_right").select(
            F.col("k"), F.col("v").alias("v2")
        )
        joined = left.join(right, on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 3  # unique keys on both sides
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert "Exchange" not in plan.split("Initial Plan")[0]


def test_adopting_externally_created_table_migrates_epoch(
    spark: SparkSession,
) -> None:
    """A populated table created OUTSIDE the connector (plain spark.sql,
    no epoch column) is adopted by execute_ddl: existing rows become
    durable epoch-0 content and subsequent commits append cleanly."""
    spark.sql("CREATE DATABASE IF NOT EXISTS adopttest")
    spark.sql("DROP TABLE IF EXISTS adopttest.ad_brand")
    spark.createDataFrame([(1, "Ford")], "id BIGINT, brand STRING").write.mode(
        "overwrite"
    ).saveAsTable("adopttest.ad_brand")

    db = SparkConnector(spark, database="adopttest")
    db.execute_ddl(
        "CREATE TABLE ad_brand (id INTEGER PRIMARY KEY, brand TEXT UNIQUE);"
    )
    assert {tuple(r) for r in db._read_table("ad_brand").collect()} == {
        (1, "Ford")
    }
    more = spark.createDataFrame([("Toyota",), ("Ford",)], ["brand"])
    with db:
        db.insert(more, table="ad_brand")
    rows = {tuple(r) for r in db._read_table("ad_brand").collect()}
    assert rows == {(1, "Ford"), (2, "Toyota")}


def test_legacy_migration_preserves_partition_layout(
    spark: SparkSession,
) -> None:
    """Opening a pre-manifest (epoch-less) database must migrate WITHOUT
    erasing the persisted partition_by layout."""
    import json

    spark.sql("CREATE DATABASE IF NOT EXISTS legacytest")
    spark.sql("DROP TABLE IF EXISTS legacytest.lg_fact")
    data = spark.createDataFrame(
        [("NL", "a", 1), ("DE", "b", 2)], "country STRING, payload STRING, n BIGINT"
    )
    data.write.partitionBy("country").saveAsTable("legacytest.lg_fact")
    props = {
        "primary_key": "",
        "foreign_keys": [],
        "payload_columns": ["country", "payload", "n"],
        "unique_constraints": [],
        "references": [],
        "column_types": [
            ["country", "STRING"],
            ["payload", "STRING"],
            ["n", "BIGINT"],
        ],
        "not_null": [],
        "partition_by": ["country"],
    }
    prop_sql = ", ".join(
        f"'sql_autoloader.{k}' = '{json.dumps(v)}'" for k, v in props.items()
    )
    spark.sql(f"ALTER TABLE legacytest.lg_fact SET TBLPROPERTIES ({prop_sql})")

    db = SparkConnector(spark, database="legacytest")
    assert db.partition_by.get("lg_fact") == ["country"]
    # migration happened (epoch column now physically present)...
    assert "__commit_id" in spark.table("legacytest.lg_fact").columns
    # ...and both content and the persisted layout survived
    assert db._read_table("lg_fact").count() == 2
    kept = {
        r.key: r.value
        for r in spark.sql(
            "SHOW TBLPROPERTIES legacytest.lg_fact"
        ).collect()
    }
    assert json.loads(kept["sql_autoloader.partition_by"]) == ["country"]
    cols = spark.catalog.listColumns("lg_fact", "legacytest")
    assert [c.name for c in cols if c.isPartition] == ["country"]


def test_second_connector_transaction_sees_prior_commits(
    spark: SparkSession,
) -> None:
    """BEGIN semantics across connector instances: a connector opened
    BEFORE another one commits must, at its own transaction start,
    refresh to the durable state — fresh epoch, continued surrogate
    ids, and idempotency against the other connector's rows."""
    a = SparkConnector(spark, database="epochtest")
    a.execute_ddl(
        "CREATE TABLE ep_brand (id INTEGER PRIMARY KEY, brand TEXT UNIQUE);"
    )
    b = SparkConnector(spark, database="epochtest")  # opened before a commits

    with a:
        a.load(spark.createDataFrame([("Ford",)], ["brand"]))
    with b:
        # 'Ford' must be seen (no duplicate), 'Toyota' continues the ids
        b.load(
            spark.createDataFrame([("Toyota",), ("Ford",)], ["brand"]),
            compare=False,
        )

    rows = sorted(
        map(tuple, SparkConnector(spark, database="epochtest")
            ._read_table("ep_brand").collect())
    )
    assert rows == [(1, "Ford"), (2, "Toyota")]
    history = SparkConnector(spark, database="epochtest").commit_history()
    assert history == sorted(set(history))  # no commit-id reuse
    assert len(history) == 2


def test_time_travel_reads_past_snapshots(spark: SparkSession) -> None:
    """The manifest journal doubles as a commit log: `read_table_as_of`
    returns each table's content at any durable epoch, and the snapshot
    is consistent ACROSS tables because the epoch flip was atomic."""
    import pytest

    db = SparkConnector(spark, database="traveltest")
    db.execute_ddl(
        """
        CREATE TABLE tt_dim (id INTEGER PRIMARY KEY, word TEXT UNIQUE);
        CREATE TABLE tt_fact (
            n BIGINT,
            word_id INTEGER REFERENCES tt_dim (id)
        );
        """
    )
    with db:
        db.load(
            spark.createDataFrame([(1, "a"), (2, "b")], "n long, word string")
        )
    first = db.commit_history()[-1]
    with db:
        db.load(
            spark.createDataFrame([(3, "c")], "n long, word string"),
            compare=False,
        )
    second = db.commit_history()[-1]
    assert second > first

    # as-of the first commit: neither table shows the second load
    assert db.read_table_as_of("tt_dim", first).count() == 2
    assert db.read_table_as_of("tt_fact", first).count() == 2
    assert db.read_table_as_of("tt_dim", second).count() == 3
    # epoch 0 = pre-first-commit state
    assert db.read_table_as_of("tt_dim", 0).count() == 0

    # a reopened connector sees the same history
    db2 = SparkConnector(spark, database="traveltest")
    assert db2.commit_history() == db.commit_history()
    assert db2.read_table_as_of("tt_fact", first).count() == 2

    with pytest.raises(ValueError, match="not durable"):
        db.read_table_as_of("tt_dim", second + 10)
    with pytest.raises(KeyError):
        db.read_table_as_of("missing", first)


def test_compact_table_consolidates_files(spark: SparkSession) -> None:
    """compact_table: one stage-then-swap rewrite that consolidates the
    small files append-only commits accumulate, preserving content,
    layout, commit epochs (time travel), and dropping nothing durable."""
    import pytest

    db = SparkConnector(spark, database="compacttest")
    db.execute_ddl("CREATE TABLE cp_t (n BIGINT, w TEXT);")
    for i in range(3):
        with db:
            db.load(
                spark.createDataFrame(
                    [(i * 10 + j, f"w{i}_{j}") for j in range(4)],
                    "n long, w string",
                ),
                compare=False,
            )
    history = db.commit_history()
    assert len(history) == 3
    before = sorted(map(tuple, db._read_table("cp_t").collect()))

    with pytest.raises(RuntimeError, match="uncommitted"):
        db.__enter__()
        try:
            db.load(
                spark.createDataFrame([(99, "x")], "n long, w string"),
                compare=False,
            )
            db.compact_table("cp_t")
        finally:
            db.__exit__(ValueError, ValueError("abort"), None)  # rollback

    db.compact_table("cp_t", target_partitions=1)
    after = sorted(map(tuple, db._read_table("cp_t").collect()))
    assert after == before
    # epochs survive: time travel to the first commit still works
    assert db.read_table_as_of("cp_t", history[0]).count() == 4
    assert db.read_table_as_of("cp_t", history[-1]).count() == 12
    # physically consolidated to a single data file
    import os

    location = (
        spark.sql("DESCRIBE TABLE EXTENDED compacttest.cp_t")
        .where("col_name = 'Location'")
        .first()["data_type"]
    ).removeprefix("file:")
    files = [
        f
        for _root, _dirs, names in os.walk(location)
        for f in names
        if f.endswith(".parquet")
    ]
    assert len(files) == 1, files
    # a reopened connector sees identical content
    db2 = SparkConnector(spark, database="compacttest")
    assert sorted(map(tuple, db2._read_table("cp_t").collect())) == before


def test_overwrite_crash_leaves_staging_copy(spark: SparkSession) -> None:
    """_overwrite_table's crash contract: a failure during the target
    rewrite leaves a COMPLETE staging table to retry from (the staging
    write happened first; no localCheckpoint whose partitions die with
    an executor).  Injected at the target-write step of compact_table."""
    import pytest

    db = SparkConnector(spark, database="crashcompact")
    db.execute_ddl("CREATE TABLE cc_t (n BIGINT, w TEXT);")
    for i in range(2):
        with db:
            db.load(
                spark.createDataFrame(
                    [(i, f"w{i}")], "n long, w string"
                ),
                compare=False,
            )
    before = sorted(map(tuple, db._read_table("cc_t").collect()))

    real_sql = spark.sql
    calls = {"n": 0}

    def failing_sql(query, *a, **k):
        # _overwrite_table issues two staging DROPs: one before the
        # staging write, one after the rewrite + props restoration.
        # Failing the SECOND simulates a crash after the rewrite — the
        # state where BOTH the rewritten target (with properties) and
        # the complete staging copy exist.
        if "DROP TABLE IF EXISTS" in query and "staging" in query:
            calls["n"] += 1
            if calls["n"] == 2:
                msg = "injected crash before staging cleanup"
                raise RuntimeError(msg)
        return real_sql(query, *a, **k)

    spark.sql = failing_sql
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            db.compact_table("cc_t", target_partitions=1)
    finally:
        spark.sql = real_sql

    staging = "crashcompact.cc_t__recovery_staging"
    assert spark.catalog.tableExists(staging)
    staged = sorted(
        (r["n"], r["w"]) for r in spark.table(staging).collect()
    )
    assert staged == before
    # retrying the compaction completes, cleans the staging table, and
    # restores the metadata properties the crash interrupted — a fresh
    # connector must introspect the table as before
    db.compact_table("cc_t", target_partitions=1)
    assert not spark.catalog.tableExists(staging)
    assert sorted(map(tuple, db._read_table("cc_t").collect())) == before
    db2 = SparkConnector(spark, database="crashcompact")
    assert "cc_t" in db2._meta
    assert sorted(map(tuple, db2._read_table("cc_t").collect())) == before


def test_concurrent_commits_both_land_exactly_once(
    spark: SparkSession,
) -> None:
    """Optimistic concurrency: two connectors with interleaved staged
    transactions — including a forced commit-id collision — must BOTH
    land, every row exactly once, under distinct commit ids."""
    ddl = "CREATE TABLE cc_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE);"
    a = SparkConnector(spark, database="cctest")
    a.execute_ddl(ddl)
    b = SparkConnector(spark, database="cctest")

    # interleave: both stage before either commits
    a._in_tx = b._in_tx = True
    a.insert(spark.createDataFrame([("alpha",)], ["name"]), table="cc_t")
    b.insert(spark.createDataFrame([("beta",)], ["name"]), table="cc_t")
    a.commit()
    # b's view of durable state is now stale; its commit must detect the
    # claimed id and retry with the next one — no error, no lost rows
    b.commit()

    fresh = SparkConnector(spark, database="cctest")
    rows = sorted(r["name"] for r in fresh._read_table("cc_t").collect())
    assert rows == ["alpha", "beta"]
    history = fresh.commit_history()
    assert len(history) == len(set(history)) == 2

    # forced claim conflict: pre-create the next commit file so the
    # journal's first rename target is taken and the retry loop must bump
    nxt = max(fresh._visible) + 1
    jr = fresh._journal
    jr._fs.createNewFile(jr._path_cls(f"{jr._dir}/{nxt}.commit.tmpblock"))
    jr._fs.rename(
        jr._path_cls(f"{jr._dir}/{nxt}.commit.tmpblock"),
        jr._path_cls(f"{jr._dir}/{nxt}.commit"),
    )
    with fresh:
        fresh.insert(
            spark.createDataFrame([("gamma",)], ["name"]), table="cc_t"
        )
    reread = SparkConnector(spark, database="cctest")
    rows = sorted(r["name"] for r in reread._read_table("cc_t").collect())
    assert rows == ["alpha", "beta", "gamma"]
    assert max(reread.commit_history()) == nxt + 1


def test_threaded_simultaneous_commits(spark: SparkSession) -> None:
    """True simultaneity: two threads committing at once — the atomic
    journal rename serializes the id claim; both commits land, all rows
    exactly once."""
    import threading

    ddl = "CREATE TABLE th_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE);"
    a = SparkConnector(spark, database="thtest")
    a.execute_ddl(ddl)
    b = SparkConnector(spark, database="thtest")
    a._in_tx = b._in_tx = True
    a.insert(spark.createDataFrame([("one",)], ["name"]), table="th_t")
    b.insert(spark.createDataFrame([("two",)], ["name"]), table="th_t")

    errors: list[Exception] = []

    def run(conn: SparkConnector) -> None:
        try:
            conn.commit()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t1 = threading.Thread(target=run, args=(a,))
    t2 = threading.Thread(target=run, args=(b,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors

    fresh = SparkConnector(spark, database="thtest")
    rows = sorted(r["name"] for r in fresh._read_table("th_t").collect())
    assert rows == ["one", "two"]
    history = fresh.commit_history()
    assert len(history) == len(set(history)) == 2


def test_claim_survives_concurrent_vacuum_of_conflict(
    spark: SparkSession,
) -> None:
    """A failed claim whose conflicting commit file was deleted by a
    concurrent vacuum (floor swept past the cid between the rename and
    the exists-check) must RETRY past the floor, not abort: the benign
    race is indistinguishable from a filesystem refusal except through
    the floor re-read."""
    ddl = "CREATE TABLE vr_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE);"
    conn = SparkConnector(spark, database="vacracetest")
    conn.execute_ddl(ddl)
    jr = conn._journal

    orig_claim = jr._claim
    failed: list[str] = []

    def racing_claim(tmp_name: str, dest_name: str) -> bool:
        if not failed:
            failed.append(dest_name)
            # simulate: another writer took this cid AND a concurrent
            # vacuum folded it away before our verification ran
            jr.set_floor(int(dest_name.split(".")[0]))
            return False
        return orig_claim(tmp_name, dest_name)

    jr._claim = racing_claim
    try:
        with conn:
            conn.insert(
                spark.createDataFrame([("solo",)], ["name"]), table="vr_t"
            )
    finally:
        jr._claim = orig_claim

    assert failed, "patched claim never exercised"
    swept = int(failed[0].split(".")[0])
    fresh = SparkConnector(spark, database="vacracetest")
    history = fresh.commit_history()
    # the commit landed exactly once, strictly above the swept floor
    assert history and min(history) > swept
    rows = [r["name"] for r in fresh._read_table("vr_t").collect()]
    assert rows == ["solo"]


def test_vacuum_commits_folds_history(spark: SparkSession) -> None:
    """vacuum_commits re-tags old commits as the always-visible base:
    current content unchanged, folded ids unreadable, retained ids
    readable, the floor survives reopen, and new commits never reuse
    folded ids."""
    import pytest

    db = SparkConnector(spark, database="vactest")
    db.execute_ddl(
        "CREATE TABLE v_dim (id INTEGER PRIMARY KEY, word TEXT UNIQUE);"
    )

    def add(words: list[str]) -> None:
        with db:
            db.load(
                spark.createDataFrame([(w,) for w in words], "word string"),
                compare=False,
            )

    add(["a", "b"])
    add(["c"])
    add(["d"])
    c1, c2, c3 = db.commit_history()

    db.vacuum_commits(retain_last=1)
    # current content is untouched
    words = sorted(r["word"] for r in db._read_table("v_dim").collect())
    assert words == ["a", "b", "c", "d"]
    # history trimmed to the retained commit
    assert db.commit_history() == [c3]
    # base snapshot = everything folded; retained snapshot still works
    assert db.read_table_as_of("v_dim", 0).count() == 3  # a, b, c
    assert db.read_table_as_of("v_dim", c3).count() == 4
    with pytest.raises(ValueError, match="vacuumed"):
        db.read_table_as_of("v_dim", c2)

    # a fresh connector agrees, and a new commit lands ABOVE c3
    db2 = SparkConnector(spark, database="vactest")
    assert db2.commit_history() == [c3]
    assert sorted(
        r["word"] for r in db2._read_table("v_dim").collect()
    ) == words
    with db2:
        db2.load(
            spark.createDataFrame([("e",)], "word string"), compare=False
        )
    assert db2.commit_history()[-1] > c3

    # vacuum everything: history empties, content persists
    db2.vacuum_commits(retain_last=0)
    assert db2.commit_history() == []
    assert db2._read_table("v_dim").count() == 5
    db3 = SparkConnector(spark, database="vactest")
    assert db3._read_table("v_dim").count() == 5


def test_legacy_journal_fold_respects_vacuum_floor(
    spark: SparkSession,
) -> None:
    """Reopening a migrated database after vacuum_commits must NOT
    resurrect legacy journal-table epochs at or below the vacuum floor:
    their rows were folded into token 0, so listing them again would
    corrupt commit_history() and let a later vacuum re-derive its
    horizon from already-vacuumed ids."""
    db = SparkConnector(spark, database="legacyvac")
    db.execute_ddl(
        "CREATE TABLE lv_dim (id INTEGER PRIMARY KEY, word TEXT UNIQUE);"
    )
    for w in ("a", "b", "c"):
        with db:
            db.load(
                spark.createDataFrame([(w,)], "word string"),
                compare=False,
            )
    c1, c2, c3 = db.commit_history()
    db.vacuum_commits(retain_last=1)
    assert db.commit_history() == [c3]

    # simulate a pre-file-journal database: a legacy journal TABLE that
    # still records every epoch, including the two just vacuumed
    spark.createDataFrame(
        [(c1,), (c2,), (c3,)], "commit_id long"
    ).write.mode("overwrite").saveAsTable(
        "legacyvac.__sql_autoloader_commits"
    )

    db2 = SparkConnector(spark, database="legacyvac")
    assert db2.commit_history() == [c3]
    assert sorted(
        r["word"] for r in db2._read_table("lv_dim").collect()
    ) == ["a", "b", "c"]


def test_compact_sort_by_clusters_files(spark: SparkSession) -> None:
    """compact_table(sort_by=...) range-partitions + sorts the rewrite
    so parquet footer min/max ranges are disjoint across files — the
    data-skipping layout — with content unchanged."""
    import pytest

    db = SparkConnector(spark, database="sorttest")
    db.execute_ddl("CREATE TABLE s_fact (n BIGINT, k BIGINT);")
    import random

    rnd = random.Random(5)
    rows = [(i, rnd.randrange(10_000)) for i in range(4_000)]
    with db:
        db.insert(
            spark.createDataFrame(rows, "n long, k long"), table="s_fact"
        )
    before = sorted(map(tuple, db._read_table("s_fact").collect()))

    db.compact_table("s_fact", target_partitions=4, sort_by=["k"])
    after = sorted(map(tuple, db._read_table("s_fact").collect()))
    assert after == before

    # inspect parquet footers: per-file k-ranges must not overlap
    import glob

    import pyarrow.parquet as pq

    loc = db._table_location("s_fact").removeprefix("file:")
    ranges = []
    for f in glob.glob(f"{loc}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        ki = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "k"
        )
        mins = [md.row_group(g).column(ki).statistics.min
                for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(ki).statistics.max
                for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # the rewrite produced several files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {ranges}"

    # bucketed tables refuse a custom sort
    db.bucket_by["s_fact"] = (4, ["n"])
    with pytest.raises(ValueError, match="bucketed"):
        db.compact_table("s_fact", sort_by=["k"])


def test_orphan_staging_dir_from_crashed_process_is_cleared(
    spark: SparkSession,
) -> None:
    """A rewrite killed in ANOTHER process leaves its staging DIRECTORY
    with no catalog entry here — it must neither block the next rewrite
    (LOCATION_ALREADY_EXISTS) nor leak: _overwrite_table clears the
    fixed-name recovery dir in place, and connector open sweeps both
    recovery and token-stage leftovers path-wise."""
    import os

    db = SparkConnector(spark, database="orphstage")
    db.execute_ddl("CREATE TABLE os_t (id INTEGER PRIMARY KEY, w TEXT UNIQUE);")
    with db:
        db.insert(spark.createDataFrame([("a",), ("b",)], ["w"]), table="os_t")

    loc = db._db_location().removeprefix("file:")
    for orphan in ("os_t__recovery_staging", "os_t__stage_12345"):
        os.makedirs(f"{loc}/{orphan}", exist_ok=True)
        with open(f"{loc}/{orphan}/part-junk.parquet", "wb") as fh:
            fh.write(b"leftover")

    # the rewrite proceeds despite the orphan dir (no catalog entry)
    db.compact_table("os_t", target_partitions=1, sort_by=["id"])
    assert sorted(r["w"] for r in db._read_table("os_t").collect()) == [
        "a", "b",
    ]
    assert not os.path.exists(f"{loc}/os_t__recovery_staging")

    # and a fresh connector open sweeps the token-stage leftover too
    SparkConnector(spark, database="orphstage")
    assert not os.path.exists(f"{loc}/os_t__stage_12345")


def test_meta_persist_clears_stale_crc_sidecar(
    spark: SparkSession,
) -> None:
    """Pre-nio writers left Hadoop ChecksumFileSystem .crc sidecars next
    to the metadata JSON; the nio ATOMIC_MOVE bypasses them, so a stale
    CRC must be deleted on re-persist or every future fs.open of the
    JSON fails with ChecksumException and the warehouse cannot open."""
    db = SparkConnector(spark, database="crctest")
    db.execute_ddl("CREATE TABLE cr_t (id INTEGER PRIMARY KEY, w TEXT UNIQUE);")

    loc = db._db_location().removeprefix("file:")
    crc = f"{loc}/_sql_autoloader_meta/.cr_t.json.crc"
    with open(crc, "wb") as fh:  # a stale (mismatching) legacy sidecar
        fh.write(b"\x00" * 16)

    # any DDL re-persist must remove it...
    db.execute_ddl("ALTER TABLE cr_t ADD COLUMN note TEXT")
    import os

    assert not os.path.exists(crc)
    # ...and a fresh catalog name over the location adopts cleanly
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS crctest2 "
        f"LOCATION '{db._db_location()}'"
    )
    adopted = SparkConnector(spark, database="crctest2")
    assert "note" in [c for c, _t in adopted._meta["cr_t"].column_types]


def test_recover_staging_restores_crashed_rewrite(
    spark: SparkSession,
) -> None:
    """recover_staging: a rewrite that crashed after writing its staging
    copy but before (or during) the target rewrite is restored from the
    copy — content identical, staging cleaned up; a healthy target
    refuses without force; absence of any copy errors."""
    import os

    import pytest

    db = SparkConnector(spark, database="recstage")
    db.execute_ddl("CREATE TABLE rs_t (id INTEGER PRIMARY KEY, w TEXT UNIQUE);")
    with db:
        db.insert(
            spark.createDataFrame([("a",), ("b",), ("c",)], ["w"]),
            table="rs_t",
        )
    want = sorted(map(tuple, db._read_table("rs_t").collect()))

    loc = db._db_location().removeprefix("file:")
    # simulate the crash artifact: full content (hidden token column
    # included) parked at the staging path, exactly what
    # _overwrite_table writes before rewriting the target — including
    # the synthetic __zorder key a crashed z-order compaction leaves
    # (the drop only happens on the final write)
    spark.table("recstage.rs_t").withColumn(
        "__zorder", F.lit(7).cast("bigint")
    ).write.parquet(f"{loc}/rs_t__recovery_staging")

    # healthy target: refuse (the crash may not have damaged anything)
    with pytest.raises(RuntimeError, match="force=True"):
        db.recover_staging("rs_t")

    # now damage the target the way a crashed overwrite does
    spark.sql("TRUNCATE TABLE recstage.rs_t")
    assert db._committed_view("rs_t").count() == 0

    restored = db.recover_staging("rs_t")
    assert restored == 3
    assert sorted(map(tuple, db._read_table("rs_t").collect())) == want
    # the synthetic shaping key did NOT leak into the restored schema
    assert "__zorder" not in spark.table("recstage.rs_t").columns
    assert not os.path.exists(f"{loc}/rs_t__recovery_staging")
    assert not os.path.exists(f"{loc}/rs_t__recovery_staging__restoring")

    # nothing left to recover
    with pytest.raises(RuntimeError, match="no recovery staging"):
        db.recover_staging("rs_t")

    # and a FRESH connector still reads the restored content
    again = SparkConnector(spark, database="recstage")
    assert sorted(map(tuple, again._read_table("rs_t").collect())) == want


def test_compact_zorder_clusters_both_dimensions(
    spark: SparkSession,
) -> None:
    """compact_table(zorder_by=[x, y]) makes EVERY file cover a narrow
    range of BOTH columns (footer stats prune on either predicate),
    unlike a lexicographic sort whose non-leading column never prunes;
    content unchanged, no synthetic key in the final schema."""
    import glob
    import random

    import pyarrow.parquet as pq
    import pytest

    db = SparkConnector(spark, database="ztest")
    db.execute_ddl("CREATE TABLE z_fact (x BIGINT, y BIGINT);")
    rnd = random.Random(7)
    rows = [
        (rnd.randrange(10_000), rnd.randrange(10_000))
        for _ in range(20_000)
    ]
    with db:
        db.insert(
            spark.createDataFrame(rows, "x long, y long"), table="z_fact"
        )
    before = sorted(map(tuple, db._read_table("z_fact").collect()))

    db.compact_table("z_fact", target_partitions=16, zorder_by=["x", "y"])
    assert "__zorder" not in spark.table("ztest.z_fact").columns
    after = sorted(map(tuple, db._read_table("z_fact").collect()))
    assert after == before

    loc = db._table_location("z_fact").removeprefix("file:")
    spans = []
    for f in glob.glob(f"{loc}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        stats = {}
        for col in ("x", "y"):
            ci = next(
                i
                for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            mins = [md.row_group(g).column(ci).statistics.min
                    for g in range(md.num_row_groups)]
            maxs = [md.row_group(g).column(ci).statistics.max
                    for g in range(md.num_row_groups)]
            stats[col] = (min(mins), max(maxs))
        spans.append(stats)
    assert len(spans) >= 4
    # z-order property: MOST files are narrow in BOTH dimensions (a
    # 1-D x-sort would leave every file's y-range ≈ the full domain;
    # a few z-files legitimately straddle a Morton quadrant boundary
    # because range-partition split points are sampled, not
    # bit-aligned — those carry wide ranges)
    narrow = [
        s
        for s in spans
        if all(s[c][1] - s[c][0] < 6_000 for c in ("x", "y"))
    ]
    assert len(narrow) >= (2 * len(spans)) // 3, spans
    # the y dimension prunes at all — impossible under a 1-D x-sort
    assert any(s["y"][1] - s["y"][0] < 6_000 for s in spans)
    # and a 2-D box predicate skips most files via footer stats alone
    box = [
        s
        for s in spans
        if s["x"][0] < 2_500 and s["y"][0] < 2_500
    ]
    assert len(box) <= len(spans) // 2

    with pytest.raises(ValueError, match="mutually exclusive"):
        db.compact_table("z_fact", sort_by=["x"], zorder_by=["y"])


def test_compact_zorder_many_columns_auto_bits(
    spark: SparkSession,
) -> None:
    """More than 7 z-order columns must work out of the box: the default
    bucket resolution shrinks so bits × columns fits a bigint (the
    explicit zorder_bits knob overrides)."""
    cols = [f"c{i}" for i in range(9)]
    db = SparkConnector(spark, database="zmanytest")
    db.execute_ddl(
        "CREATE TABLE zm_t (" + ", ".join(f"{c} BIGINT" for c in cols) + ");"
    )
    with db:
        db.insert(
            spark.range(200).select(
                # c0 = id keeps rows distinct (a constraint-free insert
                # dedupes identical rows by design)
                F.col("id").alias(cols[0]),
                *[(F.col("id") * (i + 1) % 97).alias(c)
                  for i, c in enumerate(cols[1:], start=1)],
            ),
            table="zm_t",
        )
    db.compact_table("zm_t", target_partitions=2, zorder_by=cols)
    assert db._read_table("zm_t").count() == 200
    assert "__zorder" not in spark.table("zmanytest.zm_t").columns


def test_analyze_tables_records_cbo_stats(spark: SparkSession) -> None:
    """analyze_tables lands rowCount/sizeInBytes (+ column stats) in the
    catalog — the inputs Catalyst's CBO reads for join reordering."""
    db = SparkConnector(spark, database="statstest")
    db.execute_ddl(
        "CREATE TABLE st_t (id INTEGER PRIMARY KEY, w TEXT UNIQUE);"
    )
    with db:
        db.load(
            spark.createDataFrame([("a",), ("b",), ("c",)], ["w"]),
            compare=False,
        )
    db.analyze_tables()
    stats = next(
        r.data_type
        for r in spark.sql("DESCRIBE TABLE EXTENDED statstest.st_t").collect()
        if r.col_name == "Statistics"
    )
    assert "rows" in stats and "bytes" in stats, stats
    cols = {
        r.info_name: r.info_value
        for r in spark.sql(
            "DESCRIBE TABLE EXTENDED statstest.st_t w"
        ).collect()
    }
    assert cols.get("distinct_count") == "3", cols


def test_adoption_restores_partitioned_and_bucketed_layout(
    spark: SparkSession, tmp_path
) -> None:
    """File-metadata adoption for non-trivial physical layouts: a
    connector under a DIFFERENT database name pointed at the same
    location (a fresh process's catalog state) must adopt a
    partitioned table (PARTITIONED BY + partition discovery — pruning
    still works) and a bucketed table (CLUSTERED BY), restore the
    layout specs, and keep appending into the same layout."""
    loc = str(tmp_path / "layout.db")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS layouta LOCATION '{loc}'")
    writer = SparkConnector(
        spark,
        database="layouta",
        partition_by={"ly_part": ["country"]},
        bucket_by={"ly_buck": (4, ["k"])},
    )
    writer.execute_ddl(
        """
        CREATE TABLE ly_part (
            id INTEGER PRIMARY KEY, payload TEXT UNIQUE, country TEXT
        );
        CREATE TABLE ly_buck (
            id INTEGER PRIMARY KEY, k INTEGER, w TEXT UNIQUE
        );
        """
    )
    with writer:
        writer.insert(
            spark.createDataFrame(
                [("NL", "a"), ("NL", "b"), ("DE", "c")],
                "country string, payload string",
            ),
            table="ly_part",
        )
        writer.insert(
            spark.createDataFrame(
                [(1, "x"), (2, "y")], "k int, w string"
            ),
            table="ly_buck",
        )

    # second catalog name over the same location == a fresh process:
    # nothing in THIS name's catalog, everything via the meta files
    spark.sql(f"CREATE DATABASE IF NOT EXISTS layoutb LOCATION '{loc}'")
    adopted = SparkConnector(spark, database="layoutb")
    assert adopted.partition_by.get("ly_part") == ["country"]
    assert adopted.bucket_by.get("ly_buck") == (4, ["k"])
    assert adopted._read_table("ly_part").count() == 3
    assert adopted._read_table("ly_buck").count() == 2
    # partition pruning works on the adopted entry
    cols = spark.catalog.listColumns("ly_part", "layoutb")
    assert [c.name for c in cols if c.isPartition] == ["country"]
    scan = spark.table("layoutb.ly_part").where(F.col("country") == "NL")
    assert scan.count() == 2
    # and appending through the adopted connector keeps the layout
    with adopted:
        adopted.insert(
            spark.createDataFrame(
                [("FR", "d")], "country string, payload string"
            ),
            table="ly_part",
        )
    assert adopted._read_table("ly_part").count() == 4
    fr_dir = tmp_path / "layout.db" / "ly_part" / "country=FR"
    assert fr_dir.exists()  # new rows landed in the partitioned layout


def test_analyze_tables_changes_join_strategy(spark: SparkSession) -> None:
    """PLAN-EFFECT proof: the statistics analyze_tables records are not
    write-only — with CBO enabled, column stats (rowCount + NDV) shrink
    a selective filter's size estimate below the broadcast threshold
    and flip the join from SortMergeJoin to BroadcastHashJoin building
    the filtered side.  Plans must be re-resolved from the catalog
    (fresh ``spark.table`` after ``refreshTable``) to see new stats."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    db = SparkConnector(spark, database="cboplantest")
    db.execute_ddl(
        """
        CREATE TABLE cb_a (id INTEGER PRIMARY KEY, w TEXT UNIQUE,
                           k INTEGER);
        CREATE TABLE cb_b (id INTEGER PRIMARY KEY, w TEXT UNIQUE,
                           v INTEGER);
        """
    )
    n = 20000
    with db:
        db.insert(
            spark.range(n).select(
                F.concat(F.lit("wa_"), F.col("id")).alias("w"),
                (F.col("id") % 1000).cast("int").alias("k"),
            ),
            table="cb_a",
        )
        db.insert(
            spark.range(n).select(
                F.concat(F.lit("wb_"), F.col("id")).alias("w"),
                (F.col("id") % 7).cast("int").alias("v"),
            ),
            table="cb_b",
        )

    def join_plan() -> str:
        spark.catalog.refreshTable("cboplantest.cb_a")
        spark.catalog.refreshTable("cboplantest.cb_b")
        a = spark.table("cboplantest.cb_a").where(F.col("k") == 1)
        b = spark.table("cboplantest.cb_b")
        j = a.join(b, a["id"] == b["id"]).select(a["w"], b["v"])
        return j._jdf.queryExecution().sparkPlan().toString()

    try:
        spark.conf.set("spark.sql.cbo.enabled", "true")
        # raw parquet of 20k rows ≫ 64 KiB, the ~20-row filtered
        # estimate (rowCount/NDV(k)) ≪ 64 KiB — stats decide the flip
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024)
        )
        before = join_plan()
        assert "SortMergeJoin" in before and "BroadcastHashJoin" not in (
            before
        ), before
        db.analyze_tables()
        after = join_plan()
        assert "BroadcastHashJoin" in after, after
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_token_filter_semi_join_above_inline_limit(
    spark: SparkSession, monkeypatch
) -> None:
    """Above _TOKEN_INLINE_LIMIT commits the visible filter switches to
    a broadcast semi-join (constant plan size); results must be
    identical to the inline path."""
    from sql_autoloader_spark.connectors import spark_catalog as sc_mod

    db = SparkConnector(spark, database="semitest")
    db.execute_ddl(
        "CREATE TABLE se_t (id INTEGER PRIMARY KEY, w TEXT UNIQUE);"
    )
    for w in ("a", "b", "c"):
        with db:
            db.load(
                spark.createDataFrame([(w,)], ["w"]), compare=False
            )
    inline = sorted(r["w"] for r in db._read_table("se_t").collect())
    monkeypatch.setattr(sc_mod, "_TOKEN_INLINE_LIMIT", 1)
    joined_frame = db._committed_view("se_t")
    assert "Join LeftSemi" in joined_frame._jdf.queryExecution().analyzed().toString() or \
        "LeftSemi" in joined_frame._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(r["w"] for r in joined_frame.collect()) == inline == [
        "a", "b", "c",
    ]


def test_conditional_put_claim_single_winner(spark: SparkSession) -> None:
    """Object-store claim seam: with a ConditionalPutClaim strategy
    injected (mock If-None-Match store), racing claimants get exactly
    one winner per commit id — the journal never needs rename/link on
    such stores, and the rest of the protocol is unchanged."""
    import os
    import threading

    from sql_autoloader_spark.connectors.spark_catalog import (
        ConditionalPutClaim,
        SparkConnector,
    )

    db = SparkConnector(spark, database="cputtest")
    jr = db._journal

    def local_path(path: str) -> str:
        for prefix in ("file://", "file:"):
            if path.startswith(prefix):
                return path[len(prefix):]
        return path

    lock = threading.Lock()
    objects: set[str] = set()
    put_calls: list[str] = []

    def put_if_absent(path: str, content: bytes) -> bool:
        # the mock store's conditional PUT: the dict is the atomicity
        # source; on success the object materializes as a real file so
        # the journal's directory listing (its read path) sees it
        with lock:
            put_calls.append(path)
            if path in objects or os.path.exists(local_path(path)):
                return False
            objects.add(path)
        with open(local_path(path), "wb") as fh:
            fh.write(content)
        return True

    jr._strategy = ConditionalPutClaim(put_if_absent)

    # direct race: 8 threads fight for ONE key — exactly one wins
    wins: list[bool] = []
    jr_dir = local_path(jr._dir)
    with open(f"{jr_dir}/tmp-race", "wb") as fh:
        fh.write(b"77")
    threads = [
        threading.Thread(
            target=lambda: wins.append(jr._claim("tmp-race", "99.commit"))
        )
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert wins.count(True) == 1 and wins.count(False) == 7
    os.remove(f"{jr_dir}/99.commit")
    os.remove(f"{jr_dir}/tmp-race")
    objects.clear()

    # full protocol race: 4 threads commit concurrently through the
    # injected strategy — distinct contiguous ids, every token readable
    tokens = [5000 + i for i in range(4)]
    claimed: list[int] = []

    def run(tok: int) -> None:
        claimed.append(jr.commit(tok, after=0))

    threads = [threading.Thread(target=run, args=(t,)) for t in tokens]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(claimed) == [1, 2, 3, 4]
    visible, _floor, _ = jr.state()
    assert set(visible.values()) == set(tokens)
    assert len(put_calls) >= 4  # the injected store call actually ran


def test_many_threaded_writers_land_exactly_once(
    spark: SparkSession,
) -> None:
    """4 writers × 2 sequential commits each, all threads racing: every
    commit lands under a distinct id, every row exactly once — the
    optimistic protocol under real contention."""
    import threading

    ddl = "CREATE TABLE mw_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE);"
    boss = SparkConnector(spark, database="mwtest")
    boss.execute_ddl(ddl)
    errors: list[Exception] = []

    # open every connector BEFORE any writer starts: connector open
    # runs orphan recovery, which cannot tell a crashed commit's
    # leftovers from a LIVE in-flight commit (the documented open-time
    # caveat) — the supported discipline is open-then-write
    conns = [SparkConnector(spark, database="mwtest") for _ in range(4)]

    def writer(tag: int) -> None:
        try:
            conn = conns[tag]
            for round_no in range(2):
                conn._in_tx = True
                conn.insert(
                    spark.createDataFrame(
                        [(f"w{tag}r{round_no}",)], ["name"]
                    ),
                    table="mw_t",
                )
                conn.commit()
                conn._in_tx = False
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    fresh = SparkConnector(spark, database="mwtest")
    rows = sorted(r["name"] for r in fresh._read_table("mw_t").collect())
    assert rows == sorted(
        f"w{t}r{r}" for t in range(4) for r in range(2)
    ), rows
    history = fresh.commit_history()
    assert len(history) == len(set(history)) == 8, history


def test_vacuum_preserves_inflight_unpublished_rows(
    spark: SparkSession,
) -> None:
    """Vacuum's fold must retag ONLY folded tokens: rows carrying an
    unknown token (a concurrent writer's staged-but-unpublished commit)
    must survive the rewrite untouched — invisible until their token
    publishes, visible with their own commit afterwards."""
    ddl = "CREATE TABLE vf_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE);"
    conn = SparkConnector(spark, database="vfoldtest")
    conn.execute_ddl(ddl)
    for nm in ("a", "b", "c"):
        with conn:
            conn.insert(
                spark.createDataFrame([(nm,)], ["name"]), table="vf_t"
            )
    # simulate another process's in-flight commit: files already moved
    # into the table directory, token not yet published in the journal
    token = (1 << 62) + 987654321
    spark.createDataFrame(
        [(99, "inflight", token)], "id int, name string, __commit_id long"
    ).write.mode("append").parquet(conn._table_location("vf_t"))
    spark.catalog.refreshTable(conn._qualified("vf_t"))

    conn.vacuum_commits(retain_last=1)
    names = sorted(r["name"] for r in conn._read_table("vf_t").collect())
    assert names == ["a", "b", "c"]  # folded rows kept, in-flight hidden

    cid = conn._journal.commit(token, after=max(conn.commit_history()))
    conn._refresh_durable()
    names = sorted(r["name"] for r in conn._read_table("vf_t").collect())
    assert names == ["a", "b", "c", "inflight"]  # survived the rewrite
    assert cid in conn.commit_history()


def test_vacuum_retain_more_than_history_is_noop(
    spark: SparkSession,
) -> None:
    """retain_last greater than the history length must fold NOTHING
    (the retention guarantee), not wrap around and fold the oldest."""
    db = SparkConnector(spark, database="vacnoop")
    db.execute_ddl(
        "CREATE TABLE vn_t (id INTEGER PRIMARY KEY, w TEXT UNIQUE);"
    )
    for w in ("a", "b"):
        with db:
            db.load(spark.createDataFrame([(w,)], ["w"]), compare=False)
    before = db.commit_history()
    db.vacuum_commits(retain_last=5)
    assert db.commit_history() == before
    assert db.read_table_as_of("vn_t", before[0]).count() == 1


def test_crashed_vacuum_completes_on_reopen(
    spark: SparkSession, monkeypatch
) -> None:
    """A vacuum that dies after its intent marker: time travel under
    the horizon refuses (never a half-folded snapshot), current reads
    stay correct, and the next connector open completes the fold."""
    import pytest

    db = SparkConnector(spark, database="vaccrash")
    db.execute_ddl(
        "CREATE TABLE vc_t (id INTEGER PRIMARY KEY, w TEXT UNIQUE);"
    )
    for w in ("a", "b", "c"):
        with db:
            db.load(spark.createDataFrame([(w,)], ["w"]), compare=False)
    c1, c2, c3 = db.commit_history()

    def die(self, horizon):  # noqa: ANN001, ANN202
        raise RuntimeError("simulated process death mid-vacuum")

    monkeypatch.setattr(SparkConnector, "_fold_through", die)
    with pytest.raises(RuntimeError, match="process death"):
        db.vacuum_commits(retain_last=1)
    monkeypatch.undo()

    # intent landed, fold did not: current reads correct, as-of under
    # the horizon refuses rather than serving a half-folded snapshot
    assert db._read_table("vc_t").count() == 3
    with pytest.raises(ValueError, match="vacuum.*in progress"):
        db.read_table_as_of("vc_t", c1)
    # the base snapshot is equally in flux mid-vacuum: refuse it too
    with pytest.raises(ValueError, match="vacuum.*in progress"):
        db.read_table_as_of("vc_t", 0)

    # reopen completes the crashed vacuum
    db2 = SparkConnector(spark, database="vaccrash")
    assert db2.commit_history() == [c3]
    assert db2._read_table("vc_t").count() == 3
    assert db2.read_table_as_of("vc_t", 0).count() == 2  # a, b folded
    assert db2.read_table_as_of("vc_t", c3).count() == 3


def test_journal_sweep_temps_reclaims_stale_claim_files(
    spark: SparkSession, tmp_path
) -> None:
    """A writer killed inside ``commit()`` leaves its ``tmp-<token>``
    file behind whether or not its claim landed; ``sweep_temps``
    reclaims exactly those, never commit/floor/vacuuming files, and a
    fresh connector open runs it automatically."""
    from sql_autoloader_spark.connectors.spark_catalog import _CommitJournal

    spark.sql(
        f"CREATE DATABASE sweeptest LOCATION '{tmp_path / 'sweeptest.db'}'"
    )
    jr = _CommitJournal(spark, "sweeptest")
    cid = jr.commit(1_000_001, after=0)
    assert cid == 1
    # simulate two crash leftovers: one whose claim landed (published
    # token, bookkeeping delete lost) and one that died pre-claim
    jdir = tmp_path / "sweeptest.db" / "_sql_autoloader_commits"
    (jdir / "tmp-1000002").write_text("1000002")
    (jdir / "tmp-1000003").write_text("1000003")
    assert jr.sweep_temps() == 2
    assert jr.sweep_temps() == 0  # idempotent
    # the landed commit file is untouched and still readable
    assert jr.visible() == {1: 1_000_001}
    # connector open sweeps automatically (via _recover_orphans)
    (jdir / "tmp-1000004").write_text("1000004")
    SparkConnector(spark, database="sweeptest")
    assert not list(jdir.glob("tmp-*"))
    assert jr.visible() == {1: 1_000_001}


def test_table_changes_feed_and_guards(spark: SparkSession) -> None:
    """table_changes returns exactly the rows each commit added (with
    _commit_id / _change_type), honors both range bounds, and refuses
    non-durable, inverted, and vacuumed ranges."""
    import pytest

    db = SparkConnector(spark, database="cdctest")
    db.execute_ddl(
        "CREATE TABLE c_dim (id INTEGER PRIMARY KEY, word TEXT UNIQUE);"
    )

    def add(words: list[str]) -> None:
        with db:
            db.load(
                spark.createDataFrame([(w,) for w in words], "word string"),
                compare=False,
            )

    add(["a", "b"])
    add(["c"])
    add(["d", "e"])
    c1, c2, c3 = db.commit_history()

    full = db.table_changes("c_dim", 0).collect()
    by_cid = {}
    for r in full:
        assert r["_change_type"] == "insert"
        by_cid.setdefault(r["_commit_id"], set()).add(r["word"])
    assert by_cid == {c1: {"a", "b"}, c2: {"c"}, c3: {"d", "e"}}

    tail = db.table_changes("c_dim", c1, c2).collect()
    assert {(r["_commit_id"], r["word"]) for r in tail} == {(c2, "c")}

    # the CDC columns never leak the physical token column
    cols = db.table_changes("c_dim", 0).columns
    assert "_commit_id" in cols and "_change_type" in cols
    assert not any(c.startswith("__") for c in cols)

    with pytest.raises(ValueError, match="not durable"):
        db.table_changes("c_dim", 0, c3 + 10)
    with pytest.raises(ValueError, match="empty or inverted"):
        db.table_changes("c_dim", c2, c2)
    with pytest.raises(KeyError):
        db.table_changes("nope", 0)

    # vacuum folds c1/c2: feeds reaching below the horizon refuse,
    # feeds at/above it keep working with the same content
    db.vacuum_commits(retain_last=1)
    with pytest.raises(ValueError, match="vacuumed into the base"):
        db.table_changes("c_dim", 0)
    kept = db.table_changes("c_dim", c2).collect()
    assert {(r["_commit_id"], r["word"]) for r in kept} == {
        (c3, "d"),
        (c3, "e"),
    }


def test_table_changes_excludes_inflight_and_maps_claimed_tokens(
    spark: SparkSession,
) -> None:
    """The changes feed must never expose a torn read: rows carrying an
    unpublished token (a concurrent writer's staged-but-uncommitted
    batch) are invisible to table_changes, and once the token publishes
    the feed reports the row under its USER-FACING commit id (token !=
    cid — the crash-adoption mapping), not the physical token."""
    ddl = "CREATE TABLE cf_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE);"
    conn = SparkConnector(spark, database="cdcinflight")
    conn.execute_ddl(ddl)
    for nm in ("a", "b"):
        with conn:
            conn.insert(
                spark.createDataFrame([(nm,)], ["name"]), table="cf_t"
            )
    token = (1 << 62) + 123456789
    spark.createDataFrame(
        [(99, "inflight", token)], "id int, name string, __commit_id long"
    ).write.mode("append").parquet(conn._table_location("cf_t"))
    spark.catalog.refreshTable(conn._qualified("cf_t"))

    feed = conn.table_changes("cf_t", 0).collect()
    assert sorted(r["name"] for r in feed) == ["a", "b"]

    cid = conn._journal.commit(token, after=max(conn.commit_history()))
    assert cid != token  # the mapping is non-trivial by construction
    fresh = SparkConnector(spark, database="cdcinflight")
    feed = fresh.table_changes("cf_t", 0).collect()
    got = {r["name"]: r["_commit_id"] for r in feed}
    assert got["inflight"] == cid
    assert sorted(got) == ["a", "b", "inflight"]


def _rollup_agg(frame):  # noqa: ANN001, ANN202
    from pyspark.sql import functions as F

    return frame.groupBy("name_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def test_rollup_consumer_refresh_crash_and_rebaseline(
    spark: SparkSession, tmp_path, monkeypatch
) -> None:
    """RollupConsumer end-to-end: (1) refreshes fold exactly the new
    commits; (2) a crash BEFORE the HEAD flip leaves the old
    (summary, bookmark) pair and the replay converges without double
    counting — even when the crashed attempt already renamed its
    version directory; (3) nothing new -> no new version; (4) a
    bookmark below the vacuum horizon errors and rebaseline recovers."""
    import pytest

    from sql_autoloader_spark.connectors.consumer import RollupConsumer

    db = SparkConnector(spark, database="rollupcons")
    db.execute_ddl(
        "CREATE TABLE rc_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE,"
        " name_len INTEGER);"
    )

    def add(names: list[str]) -> None:
        with db:
            db.insert(
                spark.createDataFrame(
                    [(n, len(n)) for n in names], "name string, name_len int"
                ),
                table="rc_t",
            )

    consumer = RollupConsumer(spark, str(tmp_path / "rollup"), keys=["name_len"])
    assert consumer.summary() is None

    add(["a", "bb", "cc"])
    state = consumer.refresh(db, "rc_t", _rollup_agg)
    assert state["bookmark"] == db.commit_history()[-1]
    got = {r["name_len"]: r["n"] for r in consumer.summary().collect()}
    assert got == {1: 1, 2: 2}

    # crash injection: the summary dir lands but HEAD never flips
    add(["ddd", "ee"])
    real_flip = RollupConsumer._flip_head

    def die(self, state):  # noqa: ANN001, ANN202
        msg = "simulated crash before the HEAD flip"
        raise RuntimeError(msg)

    monkeypatch.setattr(RollupConsumer, "_flip_head", die)
    with pytest.raises(RuntimeError, match="simulated crash"):
        consumer.refresh(db, "rc_t", _rollup_agg)
    monkeypatch.setattr(RollupConsumer, "_flip_head", real_flip)
    # old pair intact; replay converges, no double counting
    assert consumer.head() == state
    got = {r["name_len"]: r["n"] for r in consumer.summary().collect()}
    assert got == {1: 1, 2: 2}
    state2 = consumer.refresh(db, "rc_t", _rollup_agg)
    got = {r["name_len"]: r["n"] for r in consumer.summary().collect()}
    assert got == {1: 1, 2: 3, 3: 1}

    # nothing new: no-op, same state back
    assert consumer.refresh(db, "rc_t", _rollup_agg) == state2

    # vacuum folds everything below the head; a THIRD commit then lands
    add(["ffff"])
    db.vacuum_commits(retain_last=1)
    lagging = RollupConsumer(
        spark, str(tmp_path / "lagging"), keys=["name_len"]
    )
    lagging._flip_head({"version": 0, "bookmark": state["bookmark"]})
    # bookmark == state.bookmark < horizon -> the feed refuses
    with pytest.raises(ValueError, match="vacuumed into the base"):
        lagging.refresh(db, "rc_t", _rollup_agg)
    rb = lagging.rebaseline(db, "rc_t", _rollup_agg)
    assert rb["bookmark"] == db.commit_history()[-1]
    # the existing consumer's bookmark is AT the horizon: still fine
    got = {r["name_len"]: r["n"] for r in lagging.summary().collect()}
    assert got == {1: 1, 2: 3, 3: 1, 4: 1}


def test_rollup_consumer_bookmark_advances_past_unrelated_commits(
    spark: SparkSession, tmp_path
) -> None:
    """Commits that touch OTHER tables advance the consumer's bookmark
    without writing a summary version: an empty delta must not leave
    an unreadable (schema-less) parquet version dir, and the next
    real delta folds normally."""
    from pyspark.sql import functions as F

    from sql_autoloader_spark.connectors.consumer import RollupConsumer

    db = SparkConnector(spark, database="rollupskip")
    db.execute_ddl(
        "CREATE TABLE rs_a (id INTEGER PRIMARY KEY, name TEXT UNIQUE);"
        "CREATE TABLE rs_b (id INTEGER PRIMARY KEY, word TEXT UNIQUE);"
    )

    def agg(f):  # noqa: ANN001, ANN202
        return f.groupBy(F.length("name").alias("k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )

    rc = RollupConsumer(spark, str(tmp_path / "r"), keys=["k"])
    # commit touches ONLY rs_b: bookmark advances, version stays 0
    with db:
        db.insert(spark.createDataFrame([("x",)], ["word"]), table="rs_b")
    st = rc.refresh(db, "rs_a", agg)
    assert st["version"] == 0
    assert st["bookmark"] == db.commit_history()[-1]
    assert rc.summary() is None
    # a real rs_a commit then folds normally from the advanced bookmark
    with db:
        db.insert(spark.createDataFrame([("aa",)], ["name"]), table="rs_a")
    st = rc.refresh(db, "rs_a", agg)
    assert st["version"] == 1
    assert {(r["k"], r["n"]) for r in rc.summary().collect()} == {(2, 1)}


def test_table_changes_broadcast_join_path_matches_inline(
    spark: SparkSession, monkeypatch
) -> None:
    """Above _TOKEN_INLINE_LIMIT commits in range, the changes feed
    switches from an In-filter + token→cid CASE to a broadcast inner
    join against a (token, commit_id) frame — constant plan size for
    long histories.  Content and commit-id mapping must be identical
    to the inline path."""
    from sql_autoloader_spark.connectors import spark_catalog as sc_mod

    db = SparkConnector(spark, database="cdcjoin")
    db.execute_ddl(
        "CREATE TABLE cj_t (id INTEGER PRIMARY KEY, w TEXT UNIQUE);"
    )
    for w in ("a", "b", "c"):
        with db:
            db.load(spark.createDataFrame([(w,)], ["w"]), compare=False)
    inline = {
        (r["w"], r["_commit_id"])
        for r in db.table_changes("cj_t", 0).collect()
    }
    monkeypatch.setattr(sc_mod, "_TOKEN_INLINE_LIMIT", 1)
    feed = db.table_changes("cj_t", 0)
    plan = feed._jdf.queryExecution().optimizedPlan().toString()
    assert "Join Inner" in plan or "join" in plan.lower()
    joined = {(r["w"], r["_commit_id"]) for r in feed.collect()}
    assert joined == inline and len(joined) == 3


def test_rollup_refresh_runs_one_scan_over_the_commit_range(
    spark: SparkSession, tmp_path
) -> None:
    """Pins the r14 one-scan refresh: the delta is persisted and
    counted ONCE, so the merge/write reads the cache — the commit-range
    scan's parquet bytes are read exactly once per refresh.  Pre-r14
    the refresh ran isEmpty() and then the write as two independent
    jobs, each scanning the range (~2× the bytes this asserts).

    Measured with Hadoop's global FileSystem statistics — in local
    mode every task reads through the driver JVM's "file" scheme, and
    a cache hit reads 0 bytes (probed: the pin is exact, not a guess).
    """
    from sql_autoloader_spark.connectors.consumer import RollupConsumer

    db = SparkConnector(spark, database="rollonescan")
    db.execute_ddl(
        "CREATE TABLE ro_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE,"
        " name_len INTEGER);"
    )
    names = [f"doc-{i:06d}" * 3 for i in range(20000)]
    with db:
        db.insert(
            spark.createDataFrame(
                [(n, len(n)) for n in names], "name string, name_len int"
            ),
            table="ro_t",
        )
    head = db.commit_history()[-1]

    stats = (
        spark.sparkContext._jvm.org.apache.hadoop.fs.FileSystem
        .getGlobalStorageStatistics()
        .get("file")
    )

    # reference: ONE full evaluation of the same delta aggregate
    before = stats.getLong("bytesRead")
    _rollup_agg(db.table_changes("ro_t", 0, head)).count()
    one_scan = stats.getLong("bytesRead") - before
    assert one_scan > 0

    consumer = RollupConsumer(spark, str(tmp_path / "one"), keys=["name_len"])
    cached_before = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    before = stats.getLong("bytesRead")
    state = consumer.refresh(db, "ro_t", _rollup_agg)
    refresh_bytes = stats.getLong("bytesRead") - before
    assert state["version"] == 1 and state["bookmark"] == head
    # one scan's bytes plus small-change (journal files, footers of the
    # freshly written summary's sweep checks) — a second scan would
    # land this at ~2.0×
    assert refresh_bytes < 1.5 * one_scan, (refresh_bytes, one_scan)
    # and the delta cache was released after the refresh
    cached_after = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert cached_after <= cached_before, "refresh leaked a persisted delta"


def test_rollup_refresh_detects_concurrent_vacuum_mid_flight(
    spark: SparkSession, tmp_path, monkeypatch
) -> None:
    """A vacuum that folds commits inside the refresh's range WHILE the
    delta is in flight must never let the consumer advance its bookmark
    past lost rows (the ADVICE.md table_changes/vacuum-horizon race).
    Two scenarios:

    1. a REAL vacuum fired after the plan-time floor check: the fold
       rewrites the scanned files, so the refresh fails LOUDLY (either
       the r14 floor re-check's ValueError or Spark's
       FAILED_READ_FILE on the stale file list — which one depends on
       task scheduling) and the bookmark stays put;
    2. the silent flavor the re-check exists for (the scan completes
       but the floor moved — reachable on object-store listings):
       simulated by a floor that moves between materialization and the
       flip, pinning the re-check deterministically."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from sql_autoloader_spark.connectors.consumer import RollupConsumer

    db = SparkConnector(spark, database="rollvacrace")
    db.execute_ddl(
        "CREATE TABLE rv_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE,"
        " name_len INTEGER);"
    )

    def add(names: list[str]) -> None:
        with db:
            db.insert(
                spark.createDataFrame(
                    [(n, len(n)) for n in names], "name string, name_len int"
                ),
                table="rv_t",
            )

    add(["a", "bb"])
    consumer = RollupConsumer(spark, str(tmp_path / "vac"), keys=["name_len"])
    consumer.refresh(db, "rv_t", _rollup_agg)
    add(["ccc", "dddd"])

    # -- scenario 1: a real racing vacuum is LOUD, never a silent feed
    def agg_with_racing_vacuum(frame):  # noqa: ANN001, ANN202
        # fires between table_changes (floor checked OK) and the
        # count() that materializes the delta — the judge's window
        db.vacuum_commits(retain_last=1)
        return _rollup_agg(frame)

    state_before = consumer.head()
    with pytest.raises((ValueError, Py4JJavaError)):
        consumer.refresh(db, "rv_t", agg_with_racing_vacuum)
    # the bookmark did NOT advance past the lost rows
    assert consumer.head() == state_before
    # recovery path: rebaseline folds the full snapshot and converges
    rb = consumer.rebaseline(db, "rv_t", _rollup_agg)
    assert rb["bookmark"] == db.commit_history()[-1]
    got = {r["name_len"]: r["n"] for r in consumer.summary().collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    # -- scenario 2: the floor re-check itself, deterministically —
    # the scan succeeds but the journal floor moved mid-refresh
    add(["eeeee"])
    journal = db._journal
    real_state = journal.state

    def agg_then_move_floor(frame):  # noqa: ANN001, ANN202
        # table_changes already ran its plan-time check against the
        # REAL floor; from here every state() read reports the floor
        # above the consumer's bookmark, as a vacuum racing the scan
        # would — without rewriting files, so count() succeeds.  A
        # real state() always reports intent >= floor (it returns
        # max(intent, floor)) — simulate the same, since the r15
        # re-check guards on intent (the wider signal that also
        # covers the post-rewrite pre-floor window).
        fake = rb["bookmark"] + 1
        monkeypatch.setattr(
            journal,
            "state",
            lambda: (
                real_state()[0],
                fake,
                max(real_state()[2], fake),
            ),
        )
        return _rollup_agg(frame)

    with pytest.raises(ValueError, match="concurrent vacuum"):
        consumer.refresh(db, "rv_t", agg_then_move_floor)
    monkeypatch.setattr(journal, "state", real_state)
    assert consumer.head() == rb  # bookmark held
    st = consumer.refresh(db, "rv_t", _rollup_agg)  # clean rerun folds
    assert st["bookmark"] == db.commit_history()[-1]
    got = {r["name_len"]: r["n"] for r in consumer.summary().collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_rollup_refresh_errors_in_vacuum_intent_window(
    spark: SparkSession, tmp_path, monkeypatch
) -> None:
    """The r15 ADVICE fix: vacuum ordering is intent marker -> table
    rewrite -> floor file, so there is a window where the rewrite has
    already retagged folded rows to token 0 (the materialized delta
    silently lost them) but the floor file has NOT landed yet.  A
    floor-only re-check passes in that window; the refresh must guard
    on the INTENT — simulate exactly that signature: intent above the
    bookmark, floor still below it."""
    import pytest

    from sql_autoloader_spark.connectors.consumer import RollupConsumer

    db = SparkConnector(spark, database="rollintwin")
    db.execute_ddl(
        "CREATE TABLE ri_t (id INTEGER PRIMARY KEY, name TEXT UNIQUE,"
        " name_len INTEGER);"
    )
    with db:
        db.insert(
            spark.createDataFrame(
                [("a", 1), ("bb", 2)], "name string, name_len int"
            ),
            table="ri_t",
        )
    consumer = RollupConsumer(spark, str(tmp_path / "iw"), keys=["name_len"])
    consumer.refresh(db, "ri_t", _rollup_agg)
    with db:
        db.insert(
            spark.createDataFrame([("ccc", 3)], "name string, name_len int"),
            table="ri_t",
        )

    journal = db._journal
    real_state = journal.state
    before = consumer.head()

    def agg_in_intent_window(frame):  # noqa: ANN001, ANN202
        # in-flight vacuum: intent marker landed (and the rewrite may
        # have retagged our rows), floor not yet written
        visible, floor, _ = real_state()
        monkeypatch.setattr(
            journal,
            "state",
            lambda: (visible, floor, before["bookmark"] + 1),
        )
        return _rollup_agg(frame)

    with pytest.raises(ValueError, match="concurrent vacuum"):
        consumer.refresh(db, "ri_t", agg_in_intent_window)
    monkeypatch.setattr(journal, "state", real_state)
    assert consumer.head() == before  # bookmark held past the lost rows
    st = consumer.refresh(db, "ri_t", _rollup_agg)
    assert st["bookmark"] == db.commit_history()[-1]
    got = {r["name_len"]: r["n"] for r in consumer.summary().collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_persist_table_meta_remote_rename_failure_raises(
    spark: SparkSession, monkeypatch
) -> None:
    """The r15 ADVICE fix for the remote-FS metadata-persist branch: a
    rename that returns False with the destination ABSENT (permission
    failure after the delete removed the old JSON) must RAISE — the
    table would otherwise silently vanish from every future process's
    adoption.  The lost-race signature (rename False, destination
    present — a concurrent same-content persist won) stays tolerated."""
    import pytest

    from sql_autoloader_spark.connectors import spark_catalog as sc_mod

    db = SparkConnector(spark, database="remotemeta")
    db.execute_ddl("CREATE TABLE rm_t (id INTEGER PRIMARY KEY, v TEXT);")
    parsed = db._meta["rm_t"]

    class _RemoteFsProxy:
        """Delegates to the real Hadoop FS but claims a remote scheme
        and refuses renames — the failure signature under test."""

        def __init__(self, real, rename_result=False, on_rename=None):
            self._real = real
            self._rename_result = rename_result
            self._on_rename = on_rename

        def getScheme(self):  # noqa: N802
            return "mockfs"

        def rename(self, src, dst):
            if self._on_rename is not None:
                self._on_rename(src, dst)
            return self._rename_result

        def __getattr__(self, name):
            return getattr(self._real, name)

    real_hadoop_fs = sc_mod._hadoop_fs

    def failing_fs(spark_, path_str):  # noqa: ANN001, ANN202
        fs, path_cls = real_hadoop_fs(spark_, path_str)
        return _RemoteFsProxy(fs), path_cls

    monkeypatch.setattr(sc_mod, "_hadoop_fs", failing_fs)
    with pytest.raises(RuntimeError, match="metadata"):
        db._persist_table_meta(parsed)
    monkeypatch.undo()

    # restore the destination the failed persist deleted
    db._persist_table_meta(parsed)

    # lost-race flavor: rename returns False but a concurrent writer
    # landed the destination — tolerated, no raise, destination intact
    def concurrent_winner_fs(spark_, path_str):  # noqa: ANN001, ANN202
        fs, path_cls = real_hadoop_fs(spark_, path_str)

        def land_dest(src, dst):
            # the "other writer": copy our tmp's content to the dest
            fs.rename(src, dst)

        return _RemoteFsProxy(fs, on_rename=land_dest), path_cls

    monkeypatch.setattr(sc_mod, "_hadoop_fs", concurrent_winner_fs)
    db._persist_table_meta(parsed)  # no raise
    monkeypatch.undo()

    # the metadata file is present and a fresh adoption still works
    meta_dir = db._meta_dir()
    fs, path_cls = real_hadoop_fs(spark, meta_dir)
    assert fs.exists(path_cls(f"{meta_dir}/rm_t.json"))


def test_commit_manifests_written_consumed_and_swept(
    spark: SparkSession, tmp_path
) -> None:
    """r15 per-commit file manifests: every managed commit records the
    files it renamed into each table as ``<token>.manifest`` beside the
    journal, so changes reads plan O(commits in range) instead of
    walking the table.  Pins: (1) manifests exist and name real files
    relative to each table root; (2) the batch feed through manifests
    equals the fallback (manifests deleted) row-for-row; (3) a range
    whose commits touched only OTHER tables plans a zero-file scan;
    (4) post-compaction stale manifests fall back, never misread;
    (5) an orphaned manifest (token never published) is swept at the
    next writer open while live ones survive."""
    import json
    import os

    db = SparkConnector(spark, database="manifests")
    db.execute_ddl(
        "CREATE TABLE mf_t (id INTEGER PRIMARY KEY, v TEXT);"
        "CREATE TABLE mf_other (id INTEGER PRIMARY KEY, w TEXT);"
    )
    with db:
        db.insert(spark.createDataFrame([("a",), ("b",)], ["v"]), table="mf_t")
    with db:
        db.insert(spark.createDataFrame([("x",)], ["w"]), table="mf_other")
    with db:
        db.insert(spark.createDataFrame([("c",)], ["v"]), table="mf_t")

    jdir = db._journal._dir
    for prefix in ("file://", "file:"):
        jdir = jdir.removeprefix(prefix)
    manifests = sorted(
        n for n in os.listdir(jdir) if n.endswith(".manifest")
    )
    assert len(manifests) == 3
    # (1) every manifest names real files under its table root
    for name in manifests:
        with open(os.path.join(jdir, name)) as fh:
            m = json.load(fh)
        assert m["manifest_version"] == 1
        assert str(m["token"]) == name[: -len(".manifest")]
        for entry in m["tables"].values():
            loc = entry["location"]
            for p in ("file://", "file:"):
                loc = loc.removeprefix(p)
            assert entry["files"], "empty file list for a touched table"
            for rel in entry["files"]:
                assert os.path.isfile(os.path.join(loc, rel)), rel

    expect = [("a", 1), ("b", 1), ("c", 3)]

    def feed():  # noqa: ANN202
        return sorted(
            (r["v"], r["_commit_id"])
            for r in db.table_changes("mf_t", 0, 3).collect()
        )

    # (2) manifest plan == fallback plan, row for row
    assert feed() == expect
    # (3) only-other-table range: zero-file scan, still a valid frame
    mid = db.table_changes("mf_t", 1, 2)
    assert mid.count() == 0
    assert "_commit_id" in mid.columns

    saved = {
        n: open(os.path.join(jdir, n)).read() for n in manifests
    }
    for n in manifests:
        os.unlink(os.path.join(jdir, n))
    assert feed() == expect  # pre-manifest journal compat (fallback)
    for n, content in saved.items():
        with open(os.path.join(jdir, n), "w") as fh:
            fh.write(content)

    # (4) compaction rewrites every file: stale manifests must fall
    # back to the full scan, which still sees the tokens
    db.compact_table("mf_t")
    assert feed() == expect

    # (5) orphan sweep: a manifest whose token was never published is
    # crash debris; a writer open removes it, live manifests survive
    orphan = os.path.join(jdir, "123456789.manifest")
    with open(orphan, "w") as fh:
        fh.write('{"manifest_version": 1, "token": 123456789, "tables": {}}')
    SparkConnector(spark, database="manifests")  # recover=True open
    assert not os.path.exists(orphan)
    still = sorted(n for n in os.listdir(jdir) if n.endswith(".manifest"))
    assert still == manifests
    assert feed() == expect


def test_manifest_scan_partitioned_bucketed_and_evolved(
    spark: SparkSession,
) -> None:
    """r15: the batch manifest scan must reproduce the catalog scan's
    semantics on every physical layout — Hive-partitioned tables
    (partition values live in DIRECTORY names; the explicit-schema +
    basePath read must resolve them), bucketed tables (bucket-suffixed
    file names), and schema evolution (files written before ALTER
    TABLE ADD COLUMN null-fill).  Checked by comparing the manifest
    plan row-for-row against the fallback plan (manifests hidden)."""
    import os

    db = SparkConnector(
        spark,
        database="mflayout",
        partition_by={"ml_part": ["country"]},
        bucket_by={"ml_buck": (4, ["k"])},
    )
    db.execute_ddl(
        "CREATE TABLE ml_part (id INTEGER PRIMARY KEY, country TEXT,"
        " amount INTEGER);"
        "CREATE TABLE ml_buck (id INTEGER PRIMARY KEY, k INTEGER,"
        " v TEXT);"
    )
    with db:
        db.insert(
            spark.createDataFrame(
                [("nl", 1), ("us", 2)], "country string, amount int"
            ),
            table="ml_part",
        )
        db.insert(
            spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
            table="ml_buck",
        )
    db.execute_ddl("ALTER TABLE ml_part ADD COLUMN note TEXT;")
    with db:
        db.insert(
            spark.createDataFrame(
                [("nl", 3, "late")], "country string, amount int, note string"
            ),
            table="ml_part",
        )
        db.insert(
            spark.createDataFrame([(3, "c")], "k int, v string"),
            table="ml_buck",
        )

    def feeds():  # noqa: ANN202
        part = sorted(
            (r["country"], r["amount"], r["note"], r["_commit_id"])
            for r in db.table_changes("ml_part", 0, 2).collect()
        )
        buck = sorted(
            (r["k"], r["v"], r["_commit_id"])
            for r in db.table_changes("ml_buck", 0, 2).collect()
        )
        return part, buck

    jdir = db._journal._dir
    for prefix in ("file://", "file:"):
        jdir = jdir.removeprefix(prefix)
    manifests = [n for n in os.listdir(jdir) if n.endswith(".manifest")]
    assert len(manifests) == 2
    # partition-dir relpaths actually recorded (country=nl/... shape)
    import json as _json

    recorded = [
        rel
        for n in manifests
        for e in _json.load(open(os.path.join(jdir, n)))["tables"].values()
        for rel in e["files"]
    ]
    assert any("country=" in rel and "/" in rel for rel in recorded)

    via_manifest = feeds()
    for n in manifests:
        os.rename(os.path.join(jdir, n), os.path.join(jdir, n + ".bak"))
    try:
        via_fallback = feeds()
    finally:
        for n in manifests:
            os.rename(os.path.join(jdir, n + ".bak"), os.path.join(jdir, n))
    assert via_manifest == via_fallback
    part, buck = via_manifest
    assert part == [
        ("nl", 1, None, 1),
        ("nl", 3, "late", 2),
        ("us", 2, None, 1),
    ]
    assert buck == [(1, "a", 1), (2, "b", 1), (3, "c", 2)]
