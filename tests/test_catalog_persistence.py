"""Catalog-database mode: metadata persists as table properties and a
new connector re-introspects committed state (the analogue of reopening
a SQLite file, reference tests/test_sqlite_connector.py:117-127,224-227).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

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
