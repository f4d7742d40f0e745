"""Connectors: sinks/sources the autoloader can load into."""

from sql_autoloader_spark.connectors.base import BaseConnector
from sql_autoloader_spark.connectors.consumer import RollupConsumer
from sql_autoloader_spark.connectors.jdbc import (
    JDBCConnector,
    PostgresDialect,
    SQLiteDialect,
)
from sql_autoloader_spark.connectors.pgwire import (
    EmbeddedPostgres,
    PGWireClient,
)
from sql_autoloader_spark.connectors.postgres import PostgresConnector
from sql_autoloader_spark.connectors.spark_catalog import SparkConnector
from sql_autoloader_spark.connectors.sqlite import SQLiteConnector

__all__ = [
    "BaseConnector",
    "RollupConsumer",
    "EmbeddedPostgres",
    "JDBCConnector",
    "PGWireClient",
    "PostgresConnector",
    "PostgresDialect",
    "SQLiteConnector",
    "SQLiteDialect",
    "SparkConnector",
]
