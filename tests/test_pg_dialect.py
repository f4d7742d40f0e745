"""Executable evidence for the Postgres dialect's introspection SQL.

The dialect now ALSO runs against a live PostgreSQL server — the
embedded-server suite (tests/test_postgres_live.py) executes these same
strings over the wire and asserts end-to-end classification.  This
module stays as the portable layer: it pins the SQL text and proves the
semantics on a second independent engine, which still matters when the
server binaries are absent (the reference's own Postgres suite is
skipped for exactly that reason, reference
tests/test_postgres_connector.py:48).  Two mechanisms:

1. DIFFERENTIAL EXECUTION: DuckDB implements the SQL-standard
   ``information_schema`` views the dialect queries (``tables``,
   ``columns``, ``key_column_usage``, ``table_constraints``), so the
   dialect's strings execute on a REAL engine verbatim apart from the
   schema literal (``'public'`` → DuckDB's default ``'main'``).  This
   proves the SQL parses, every join and aggregation is well-formed,
   and the classification semantics (PK detection incl. the
   PK-that-is-also-FK case, FK edge extraction with ordinal pairing
   through ``referential_constraints``) are right — not just that the
   strings look plausible.  (Multi-column FK pairing itself is pinned
   against live pg_catalog in tests/test_postgres_live.py — DuckDB
   does not populate referential_constraints for composite FKs.)
2. GOLDEN PIN: the generated SQL text is regression-pinned, mirroring
   the reference's introspection intent
   (reference postgres/postgres_connector.py:67-157 — same
   information_schema joins for column/constraint classification; the
   reference's pg_catalog reference query is re-expressed on the
   standard constraint_column_usage view instead of pg_constraint
   internals).
"""

from __future__ import annotations

import duckdb
import pytest

from sql_autoloader_spark.connectors.jdbc import PostgresDialect

def _on_duckdb(sql: str) -> str:
    """The one documented substitution; everything else runs verbatim."""
    return sql.replace("'public'", "'main'")


@pytest.fixture
def con() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE brand (id INTEGER PRIMARY KEY, name VARCHAR UNIQUE);
        CREATE TABLE dealer (id INTEGER PRIMARY KEY, name VARCHAR);
        CREATE TABLE car (
            id INTEGER PRIMARY KEY,
            brand_id INTEGER REFERENCES brand (id),
            model VARCHAR
        );
        -- PK that is ALSO an FK: the case the dialect's MAX() aggregation
        -- exists for (one kcu row per constraint; first-seen could be
        -- the non-PK row)
        CREATE TABLE car_detail (
            car_id INTEGER PRIMARY KEY REFERENCES car (id),
            note VARCHAR
        );
        """
    )
    return con


def test_pg_tables_query_executes(con: duckdb.DuckDBPyConnection) -> None:
    rows = con.execute(_on_duckdb(PostgresDialect().tables_query())).fetchall()
    assert {r[0] for r in rows} == {"brand", "dealer", "car", "car_detail"}


def test_pg_columns_query_classifies(con: duckdb.DuckDBPyConnection) -> None:
    sql = _on_duckdb(PostgresDialect().columns_query("car"))
    rows = con.execute(sql).fetchall()
    # ordered by ordinal position, one row per column, PK classified
    assert [(r[0], r[1]) for r in rows] == [
        ("id", 1),
        ("brand_id", 0),
        ("model", 0),
    ]
    # shape: to_table/to_key columns present (NULL in this query)
    assert all(r[2] is None and r[3] is None for r in rows)


def test_pg_columns_query_pk_also_fk(con: duckdb.DuckDBPyConnection) -> None:
    """A column in BOTH a PK and an FK constraint must classify as PK —
    the regression the dialect's MAX(CASE ...) guards against."""
    sql = _on_duckdb(PostgresDialect().columns_query("car_detail"))
    rows = con.execute(sql).fetchall()
    assert [(r[0], r[1]) for r in rows] == [("car_id", 1), ("note", 0)]


def test_pg_references_query_extracts_fk_edges(
    con: duckdb.DuckDBPyConnection,
) -> None:
    d = PostgresDialect()
    assert con.execute(_on_duckdb(d.references_query("car"))).fetchall() == [
        ("brand_id", "brand", "id")
    ]
    assert con.execute(
        _on_duckdb(d.references_query("car_detail"))
    ).fetchall() == [("car_id", "car", "id")]
    assert con.execute(_on_duckdb(d.references_query("brand"))).fetchall() == []


def test_pg_sql_golden_pin() -> None:
    """Regression-pin the generated SQL (whitespace-normalized): any
    edit to the dialect strings must consciously update this pin."""
    d = PostgresDialect()

    def norm(sql: str) -> str:
        return " ".join(sql.split())

    assert norm(d.tables_query()) == (
        "SELECT table_name AS name FROM information_schema.tables "
        "WHERE table_schema = 'public' AND table_type = 'BASE TABLE'"
    )
    assert norm(d.columns_query("car")) == (
        "SELECT c.column_name, "
        "MAX(CASE WHEN tc.constraint_type = 'PRIMARY KEY' "
        "THEN 1 ELSE 0 END) AS is_primary_key, "
        "NULL AS to_table, NULL AS to_key "
        "FROM information_schema.columns c "
        "LEFT JOIN information_schema.key_column_usage kcu "
        "ON c.table_schema = kcu.table_schema "
        "AND c.table_name = kcu.table_name "
        "AND c.column_name = kcu.column_name "
        "LEFT JOIN information_schema.table_constraints tc "
        "ON kcu.constraint_schema = tc.constraint_schema "
        "AND kcu.constraint_name = tc.constraint_name "
        "AND tc.constraint_type = 'PRIMARY KEY' "
        "WHERE c.table_schema = 'public' AND c.table_name = 'car' "
        "GROUP BY c.column_name "
        "ORDER BY MIN(c.ordinal_position)"
    )
    assert norm(d.references_query("car")).endswith(
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "ON tc.constraint_schema = kcu.constraint_schema "
        "AND tc.constraint_name = kcu.constraint_name "
        "JOIN information_schema.referential_constraints rc "
        "ON tc.constraint_schema = rc.constraint_schema "
        "AND tc.constraint_name = rc.constraint_name "
        "JOIN information_schema.key_column_usage rk "
        "ON rc.unique_constraint_schema = rk.constraint_schema "
        "AND rc.unique_constraint_name = rk.constraint_name "
        "AND kcu.position_in_unique_constraint = rk.ordinal_position "
        "WHERE tc.constraint_type = 'FOREIGN KEY' "
        "AND tc.table_schema = 'public' "
        "AND tc.table_name = 'car'"
    )
