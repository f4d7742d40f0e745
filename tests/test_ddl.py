"""Direct tests of the CREATE TABLE parser (connectors/ddl.py) —
the constraint grammar the Spark-catalog sink stores as table
properties (reference parity: sqlite_connector.py:84-147 reads the
same structures from PRAGMA introspection)."""

from __future__ import annotations

import pytest

from sql_autoloader_spark.connectors.ddl import (
    parse_create_table,
    parse_script,
    split_statements,
)
from sql_autoloader_spark.exceptions import InvalidTableError


def test_named_table_level_constraints_are_parsed() -> None:
    t = parse_create_table(
        """CREATE TABLE book (
            id INTEGER PRIMARY KEY,
            author_id BIGINT,
            title TEXT,
            CONSTRAINT fk_a FOREIGN KEY (author_id) REFERENCES author (id),
            CONSTRAINT uq_t UNIQUE (title)
        )"""
    )
    assert t is not None
    assert t.references == [("author_id", "author", "id")]
    assert t.foreign_keys == ["author_id"]
    assert ["title"] in t.unique_constraints


def test_composite_primary_key_raises() -> None:
    with pytest.raises(InvalidTableError, match="composite primary"):
        parse_create_table("CREATE TABLE t (a INT, b INT, PRIMARY KEY (a, b))")


def test_composite_foreign_key_raises() -> None:
    with pytest.raises(InvalidTableError, match="composite foreign"):
        parse_create_table(
            "CREATE TABLE t (a INT, b INT,"
            " FOREIGN KEY (a, b) REFERENCES u (x))"
        )


def test_quoted_literals_do_not_split_columns_or_statements() -> None:
    tables = parse_script(
        "CREATE TABLE t (id INTEGER PRIMARY KEY,"
        " status TEXT DEFAULT 'new,pending', sep TEXT DEFAULT ';');"
        "CREATE TABLE u (id INTEGER PRIMARY KEY)"
    )
    assert [t.name for t in tables] == ["t", "u"]
    cols = [c for c, _ in tables[0].column_types]
    assert cols == ["id", "status", "sep"]
    assert len(split_statements("SELECT ';'; SELECT 1")) == 2


def test_trailing_table_options_tolerated() -> None:
    t = parse_create_table(
        "CREATE TABLE t (id INTEGER PRIMARY KEY, x TEXT) WITHOUT ROWID"
    )
    assert t is not None and t.name == "t"
    assert t.primary_key == "id"


def test_unparseable_create_table_raises_instead_of_vanishing() -> None:
    with pytest.raises(InvalidTableError, match="Unparseable"):
        parse_script("CREATE TABLE broken id INTEGER")


def test_non_create_statements_skipped() -> None:
    assert parse_script("CREATE INDEX i ON t (x); PRAGMA foo") == []
