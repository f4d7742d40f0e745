"""sql_autoloader_spark — a PySpark-native declarative ETL auto-loader.

Given a flat ``pyspark.sql.DataFrame`` whose column names match columns of
a relational schema, this package introspects the schema into a DAG,
plans a topological load order, and per table performs dedup ->
idempotent insert -> surrogate-key retrieval -> null-safe key merge,
then validates the load by reconstructing the flat frame with one
generated LEFT-JOIN query (reference semantics:
/root/reference/sql_autoloader/connector.py:376-452).

Spark-first design: all data-plane work is DataFrame/SQL (Catalyst
optimizes join strategy, pushdown, AQE); only O(#tables) metadata
planning runs on the driver.
"""

from sql_autoloader_spark import exceptions
from sql_autoloader_spark.connectors import (
    JDBCConnector,
    PostgresConnector,
    SparkConnector,
    SQLiteConnector,
)
from sql_autoloader_spark.schema import (
    LoadInstructions,
    Reference,
    Schema,
    Table,
)

__all__ = [
    "JDBCConnector",
    "LoadInstructions",
    "PostgresConnector",
    "Reference",
    "SQLiteConnector",
    "Schema",
    "SparkConnector",
    "Table",
    "exceptions",
]

__version__ = "0.1.0"
