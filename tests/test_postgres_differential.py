"""Differential: PostgreSQL's ``INSERT ... ON CONFLICT DO NOTHING``
vs SQLite's ``INSERT OR IGNORE`` — the two conflict-ignore mechanisms
the reference delegates idempotency to (reference
postgres/postgres_connector.py:13-28 vs sqlite_connector.py:10-25).

The loader treats the two sinks as interchangeable; that is only sound
if the underlying engines agree on what a UNIQUE constraint admits for
random payloads, including NULLs (SQL UNIQUE treats NULLs as distinct
on both engines — PostgreSQL's default NULLS DISTINCT matches SQLite).
The property test drives both engines directly over random two-batch
scenarios — no Spark in the loop, so Hypothesis can afford real volume
— and asserts identical post-state and identical conflict verdicts
(same exemption as tests/test_sqlite_differential.py: which row
survives an intra-batch collision among NULL-bearing rows is
engine-defined).

The corpus test then runs the SAME star load through the two
*connectors* and asserts identical reconstructions — the lifecycle
layer agreeing end to end, not just the engines.
"""

from __future__ import annotations

import sqlite3

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import SparkSession

from sql_autoloader_spark.connectors.pgwire import (
    EmbeddedPostgres,
    PGWireClient,
    pg_literal,
)
from sql_autoloader_spark.connectors.postgres import PostgresConnector
from sql_autoloader_spark.connectors.sqlite import SQLiteConnector

pytestmark = pytest.mark.skipif(
    not EmbeddedPostgres.available(),
    reason="PostgreSQL server binaries not available",
)

COLS = ["a", "b", "c"]


@pytest.fixture(scope="module")
def pg() -> EmbeddedPostgres:
    server = EmbeddedPostgres().start()
    yield server
    server.destroy()


@pytest.fixture(scope="module")
def pg_client(pg: EmbeddedPostgres) -> PGWireClient:
    pg.createdb("diff")
    client = pg.client(database="diff")
    yield client
    client.close()


@st.composite
def scenario(draw: st.DrawFn):
    unique = draw(
        st.lists(st.sampled_from(COLS), min_size=1, max_size=2, unique=True)
    )
    val = st.one_of(st.none(), st.integers(min_value=0, max_value=2))
    row = st.tuples(*[val for _ in COLS])
    batch1 = draw(st.lists(row, min_size=0, max_size=5))
    batch2 = draw(st.lists(row, min_size=0, max_size=5))
    return sorted(set(unique)), batch1, batch2


def _subset_conflict(distinct: list[tuple], table: set[tuple]) -> bool:
    """The reference's post-insert subset check (nulls exempt)."""
    return any(
        r not in table for r in distinct if None not in r
    )


def _sqlite_state(
    unique: list[str], batches: list[list[tuple]]
) -> tuple[bool, set[tuple]]:
    con = sqlite3.connect(":memory:")
    cols = ", ".join(COLS)
    con.execute(
        f"CREATE TABLE t (id INTEGER PRIMARY KEY, {cols},"
        f" UNIQUE ({', '.join(unique)}))"
    )
    conflicted = False
    for batch in batches:
        distinct = list(dict.fromkeys(batch))
        con.executemany(
            f"INSERT OR IGNORE INTO t ({cols}) VALUES (?, ?, ?)", distinct
        )
        table = set(con.execute(f"SELECT {cols} FROM t").fetchall())
        if _subset_conflict(distinct, table):
            conflicted = True
    rows = set(con.execute(f"SELECT {cols} FROM t").fetchall())
    con.close()
    return conflicted, rows


def _pg_state(
    client: PGWireClient, unique: list[str], batches: list[list[tuple]]
) -> tuple[bool, set[tuple]]:
    cols = ", ".join(COLS)
    client.execute("DROP TABLE IF EXISTS t")
    client.execute(
        f"CREATE TABLE t (id bigint GENERATED ALWAYS AS IDENTITY "
        f"PRIMARY KEY, a bigint, b bigint, c bigint,"
        f" UNIQUE ({', '.join(unique)}))"
    )
    conflicted = False
    for batch in batches:
        distinct = list(dict.fromkeys(batch))
        if distinct:
            values = ", ".join(
                "(" + ", ".join(pg_literal(v) for v in row) + ")"
                for row in distinct
            )
            client.execute(
                f"INSERT INTO t ({cols}) VALUES {values} "
                "ON CONFLICT DO NOTHING"
            )
        table = {
            tuple(r) for r in client.query(f"SELECT {cols} FROM t").rows
        }
        if _subset_conflict(distinct, table):
            conflicted = True
    rows = {tuple(r) for r in client.query(f"SELECT {cols} FROM t").rows}
    return conflicted, rows


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sc=scenario())
def test_on_conflict_matches_insert_or_ignore(
    pg_client: PGWireClient, sc
) -> None:
    unique, batch1, batch2 = sc
    lite_conflict, lite_rows = _sqlite_state(unique, [batch1, batch2])
    pg_conflict, pg_rows = _pg_state(pg_client, unique, [batch1, batch2])

    def null_collision(batch: list[tuple]) -> bool:
        idx = [COLS.index(c) for c in unique]
        seen: dict[tuple, tuple] = {}
        for row in dict.fromkeys(batch):
            key = tuple(row[i] for i in idx)
            if None in key:
                continue  # NULL keys never collide (NULLS DISTINCT)
            if key in seen and seen[key] != row:
                if None in seen[key] or None in row:
                    return True
            seen.setdefault(key, row)
        return False

    if null_collision(batch1) or null_collision(batch2):
        return  # engine-defined survivor — documented exemption
    assert pg_conflict == lite_conflict, (unique, batch1, batch2)
    if not pg_conflict:
        assert pg_rows == lite_rows, (unique, batch1, batch2)


def test_connectors_agree_on_star_corpus(
    spark: SparkSession, pg: EmbeddedPostgres
) -> None:
    """The SAME dimension star load through PostgresConnector and
    SQLiteConnector: identical compare-query reconstructions and
    identical (natural key → surrogate-key cardinality) structure."""
    pg.createdb("corpus")
    flat = spark.createDataFrame(
        [
            ("Toyota", "Corolla"),
            ("Toyota", "Yaris"),
            ("VW", "Golf"),
            ("VW", "Polo"),
            ("BMW", "i3"),
        ],
        "brand string, model string",
    )

    pg_db = PostgresConnector(
        spark, sock_dir=pg.sock_dir, port=pg.port, database="corpus"
    )
    pg_db.execute_ddl(
        """
        CREATE TABLE brand (
            id bigint GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
            brand text UNIQUE
        );
        CREATE TABLE model (
            id bigint GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
            model text UNIQUE,
            brand_id bigint REFERENCES brand (id)
        );
        """
    )
    lite_db = SQLiteConnector(spark)
    lite_db.execute_ddl(
        """
        CREATE TABLE brand (
            id INTEGER PRIMARY KEY,
            brand TEXT UNIQUE
        );
        CREATE TABLE model (
            id INTEGER PRIMARY KEY,
            model TEXT UNIQUE,
            brand_id INTEGER REFERENCES brand (id)
        );
        """
    )
    try:
        with pg_db:
            pg_db.load(flat)
        with lite_db:
            lite_db.load(flat)
        query_cols = ["brand", "model"]
        pg_query = pg_db.schema.get_compare_query(query_cols, quote='"')
        lite_query = lite_db.schema.get_compare_query(query_cols, quote='"')
        pg_rows = {
            (r["brand"], r["model"])
            for r in pg_db._execute_compare_query(pg_query).collect()
        }
        lite_rows = {
            (r["brand"], r["model"])
            for r in lite_db._execute_compare_query(lite_query).collect()
        }
        assert pg_rows == lite_rows
        assert pg_db._read_table("brand").count() == 3
        assert lite_db._read_table("brand").count() == 3
        assert pg_db._read_table("model").count() == 5
    finally:
        pg_db.close()
        lite_db.close()
