"""Driver-side schema metadata and load planning.

This layer never touches data: it models the target database as a DAG of
tables + foreign-key references and derives load plans and validation
queries from it (SURVEY.md §2B).
"""

from sql_autoloader_spark.schema.graph import GetSchemaFunction, Schema
from sql_autoloader_spark.schema.model import (
    InsertAndRetrieveDict,
    InsertDict,
    LoadInstructions,
    Reference,
    ReferenceDict,
    Table,
    TableDict,
)

__all__ = [
    "GetSchemaFunction",
    "InsertAndRetrieveDict",
    "InsertDict",
    "LoadInstructions",
    "Reference",
    "ReferenceDict",
    "Schema",
    "Table",
    "TableDict",
]
