"""Stateless PySpark DataFrame operations (the data plane)."""

from sql_autoloader_spark.ops.dataframe_ops import (
    compare,
    distinct_rows,
    has_nulls,
    match_dtypes,
    merge_ids,
    postprocess,
    preprocess,
    validate_load_compare,
)

__all__ = [
    "compare",
    "distinct_rows",
    "has_nulls",
    "match_dtypes",
    "merge_ids",
    "postprocess",
    "preprocess",
    "validate_load_compare",
]
