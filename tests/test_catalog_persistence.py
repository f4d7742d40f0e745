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
