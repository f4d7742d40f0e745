"""Port of /root/reference/tests/test_bugs.py — the production-bug
regression corpus, against :class:`SparkConnector`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from sql_autoloader_spark.connectors.spark_catalog import SparkConnector
from sql_autoloader_spark.exceptions import (
    ColumnIsAmbiguousError,
    CompareNoExactMatchError,
    TableDoesNotExistError,
)


def rowset(df) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def test_empty_predecessors_bug(spark: SparkSession) -> None:
    """A no-predecessor table absent from the data must stay out of the
    plan (reference tests/test_bugs.py:15-112)."""
    ddl = """
    CREATE TABLE stof (
        id INTEGER PRIMARY KEY,
        ec_number TEXT UNIQUE NOT NULL
    );
    CREATE TABLE stof_cas_number (
        stof_id INTEGER REFERENCES stof (id) ON DELETE CASCADE,
        cas_number TEXT NOT NULL,
        UNIQUE (stof_id, cas_number)
    );
    CREATE TABLE stof_naam (
        stof_id INTEGER REFERENCES stof (id) ON DELETE CASCADE,
        substance_name TEXT NOT NULL,
        UNIQUE (stof_id, substance_name)
    );
    CREATE TABLE stof_nl_naam (
        stof_id INTEGER REFERENCES stof (id) ON DELETE CASCADE,
        stof_naam TEXT NOT NULL,
        UNIQUE (stof_id, stof_naam)
    );
    CREATE TABLE stoffenlijst (
        id INTEGER PRIMARY KEY,
        stoffenlijst TEXT UNIQUE NOT NULL
    );
    CREATE TABLE stof_op_lijst (
        stof_id INTEGER REFERENCES stof (id) ON DELETE CASCADE,
        stoffenlijst_id INTEGER REFERENCES stoffenlijst (id) ON DELETE CASCADE,
        UNIQUE (stof_id, stoffenlijst_id)
    );
    CREATE TABLE adres (
        id INTEGER PRIMARY KEY,
        straatnaam TEXT NOT NULL,
        postcode TEXT NOT NULL,
        plaats TEXT NOT NULL,
        UNIQUE (straatnaam, postcode, plaats)
    );
    CREATE TABLE hoofddossier (
        id INTEGER PRIMARY KEY,
        stof_id INTEGER REFERENCES stof (id) ON DELETE CASCADE,
        dossier_nummer TEXT UNIQUE NOT NULL,
        joint_submission INTEGER NOT NULL CHECK (joint_submission IN (0, 1))
    );
    CREATE TABLE dossier (
        id INTEGER PRIMARY KEY,
        hoofddossier_id INTEGER REFERENCES hoofddossier (id) ON DELETE CASCADE,
        adres_id INTEGER REFERENCES adres (id) ON DELETE CASCADE,
        reference_number TEXT UNIQUE NOT NULL
    );
    """
    data = spark.createDataFrame(
        [
            ("1", "A", "c"),
            ("2", "B", None),
            ("3", None, "d"),
            ("4", None, None),
            ("4", None, None),
        ],
        "ec_number string, cas_number string, substance_name string",
    )
    db = SparkConnector(spark)
    db.execute_ddl(ddl)
    with db:
        db.load(data)

    query = """
    SELECT ec_number, cas_number, substance_name
    FROM stof
    LEFT JOIN stof_cas_number ON stof_cas_number.stof_id = stof.id
    LEFT JOIN stof_naam ON stof_naam.stof_id = stof.id
    """
    assert rowset(spark.sql(query)) == rowset(data.distinct())


def test_duplicate_with_missings_bug(spark: SparkSession) -> None:
    """Partial-missing data loads under exact=False, fails exact compare
    (reference :115-142)."""
    ddl = """
    CREATE TABLE a (id INTEGER PRIMARY KEY, a INTEGER UNIQUE NOT NULL);
    CREATE TABLE b (a_id INTEGER REFERENCES a (id), b INTEGER UNIQUE NOT NULL);
    CREATE TABLE c (a_id INTEGER REFERENCES a (id), c TEXT UNIQUE NOT NULL);
    """
    data = spark.createDataFrame(
        [(1, 2, None), (1, 2, "a")], "a long, b long, c string"
    )
    db = SparkConnector(spark)
    db.execute_ddl(ddl)
    with pytest.raises(CompareNoExactMatchError), db:
        db.load(data)

    db2 = SparkConnector(spark)
    db2.execute_ddl(ddl)
    with db2:
        db2.load(data, exact=False)


def test_schema_bug(spark: SparkSession) -> None:
    """A reference to a misspelled table raises TableDoesNotExistError
    (reference :145-162)."""
    ddl = """
    CREATE TABLE a (id INTEGER PRIMARY KEY, a TEXT);
    CREATE TABLE b (a_id INTEGER REFERENCES aa (id), b TEXT);
    """
    db = SparkConnector(spark)
    with pytest.raises(TableDoesNotExistError):
        db.execute_ddl(ddl)


def test_ambiguous_bug(spark: SparkSession) -> None:
    """Multiple FK edges to the same parent must not trip the ambiguity
    check for unrelated loads (reference :165-189)."""
    ddl = """
    CREATE TABLE a (id INTEGER PRIMARY KEY, a TEXT);
    CREATE TABLE b (a_id INTEGER REFERENCES a (id), b TEXT);
    CREATE TABLE c (
        a1_id INTEGER REFERENCES a (id),
        a2_id INTEGER REFERENCES a (id),
        c TEXT
    );
    """
    data = spark.createDataFrame(
        [("one", "one"), ("one", "two")], "a string, b string"
    )
    db = SparkConnector(spark)
    db.execute_ddl(ddl)
    with db:
        db.load(data)


def test_retrieve_drop_bug(spark: SparkSession) -> None:
    """retrieve_ids must not fail dropping columns absent from the data
    (reference :192-220)."""
    ddl = """
    CREATE TABLE a (id INTEGER PRIMARY KEY, a TEXT UNIQUE, extra TEXT);
    CREATE TABLE b (a_id INTEGER REFERENCES a (id), b TEXT);
    """
    data = spark.createDataFrame(
        [("one", "een", "this"), ("two", "twee", "is"), ("three", "drie", "fun")],
        "a string, b string, extra string",
    )
    retrieve = spark.createDataFrame([("one",), ("two",)], "a string")
    db = SparkConnector(spark)
    db.execute_ddl(ddl)
    with db:
        db.load(data)
        out = db.retrieve_ids(retrieve, table="a", alias="a_id")
        assert "a_id" in out.columns


def test_load_ids_bug(spark: SparkSession) -> None:
    """load() accepts raw FK values with prefix disambiguation
    (reference :223-252)."""
    ddl = """
    CREATE TABLE a (id INTEGER PRIMARY KEY, a TEXT UNIQUE NOT NULL);
    CREATE TABLE b (
        id INTEGER PRIMARY KEY,
        a_id INTEGER REFERENCES a (id),
        b TEXT UNIQUE NOT NULL
    );
    CREATE TABLE c (
        a_id INTEGER REFERENCES a (id),
        b_id INTEGER REFERENCES b (id),
        c TEXT UNIQUE NOT NULL
    );
    """
    data = spark.createDataFrame(
        [(1, 1, "one"), (2, 2, "two"), (3, 3, "three")],
        "a_id long, b_id long, c string",
    )
    db = SparkConnector(spark)
    db.execute_ddl(ddl)
    with db:
        with pytest.raises(ColumnIsAmbiguousError):
            db.load(data)
        db.load(data, columns={"a_id": "c.a_id"}, compare=False)
