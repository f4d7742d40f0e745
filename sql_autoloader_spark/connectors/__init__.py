"""Connectors: sinks/sources the autoloader can load into."""

from sql_autoloader_spark.connectors.base import BaseConnector
from sql_autoloader_spark.connectors.jdbc import (
    JDBCConnector,
    PostgresDialect,
    SQLiteDialect,
)
from sql_autoloader_spark.connectors.spark_catalog import SparkConnector
from sql_autoloader_spark.connectors.sqlite import SQLiteConnector

__all__ = [
    "BaseConnector",
    "JDBCConnector",
    "PostgresDialect",
    "SQLiteConnector",
    "SQLiteDialect",
    "SparkConnector",
]
