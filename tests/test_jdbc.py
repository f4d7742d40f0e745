"""JDBC connector tests.

No JDBC driver jar ships in this container, so the end-to-end path is
exercised in deployment only; here we validate the parts that don't
need a driver: dialect inference, and — crucially — that the SQLite
introspection SQL the dialect generates returns the correct schema
when executed by a real SQLite engine (in-process ``sqlite3``, same
engine a JDBC driver would wrap).
"""

from __future__ import annotations

import re
import sqlite3

import pytest

from sql_autoloader_spark.connectors.jdbc import (
    JDBCConnector,
    PostgresDialect,
    SQLiteDialect,
)

CAR_DDL = """
CREATE TABLE merk (id INTEGER PRIMARY KEY, naam TEXT UNIQUE NOT NULL);
CREATE TABLE dealer (id INTEGER PRIMARY KEY, naam TEXT UNIQUE NOT NULL);
CREATE TABLE merk_dealer (
  id INTEGER PRIMARY KEY,
  merk_id INTEGER REFERENCES merk (id),
  dealer_id INTEGER REFERENCES dealer (id),
  UNIQUE (merk_id, dealer_id)
);
"""


def test_infer_dialect() -> None:
    assert isinstance(
        JDBCConnector._infer_dialect("jdbc:sqlite:/tmp/x.db"), SQLiteDialect
    )
    assert isinstance(
        JDBCConnector._infer_dialect("jdbc:postgresql://h/db"), PostgresDialect
    )
    with pytest.raises(ValueError, match="dialect"):
        JDBCConnector._infer_dialect("jdbc:mysql://h/db")


def test_sqlite_introspection_sql_against_real_sqlite() -> None:
    """The dialect's metadata queries, run by actual SQLite, must yield
    the reference's TableDict/ReferenceDict content (reference
    sqlite_connector.py:84-147 parity)."""
    dialect = SQLiteDialect()
    con = sqlite3.connect(":memory:")
    con.executescript(CAR_DDL)

    names = sorted(r[0] for r in con.execute(dialect.tables_query()))
    assert names == ["dealer", "merk", "merk_dealer"]

    cols = con.execute(dialect.columns_query("merk_dealer")).fetchall()
    by_name = {c[0]: c for c in cols}
    assert by_name["id"][1] == 1  # pk flag
    assert by_name["merk_id"][2:] == ("merk", "id")
    assert by_name["dealer_id"][2:] == ("dealer", "id")

    refs = set(con.execute(dialect.references_query("merk_dealer")))
    assert refs == {("merk_id", "merk", "id"), ("dealer_id", "dealer", "id")}

    refs_none = con.execute(dialect.references_query("merk")).fetchall()
    assert refs_none == []


def test_postgres_introspection_sql_shape() -> None:
    """Postgres queries are plain information_schema SELECTs (syntax
    check only — no server in the container)."""
    dialect = PostgresDialect()
    for sql in (
        dialect.tables_query(),
        dialect.columns_query("t"),
        dialect.references_query("t"),
    ):
        assert re.search(r"\bSELECT\b", sql, re.I)
        assert "information_schema" in sql or "pg_" in sql
