"""Differential property test for ``merge_ids`` against a pure-Python
null-safe model (port of the reference's randomized merge strategy,
/root/reference/tests/test_dataframe_operations.py:297-350).

For random data rows and a random keyed dimension fetch — both with
NULLs — the Spark merge and the model must agree on:

- which error fires (null ids → MissingKeysAfterMergeError, fan-out
  without allow_duplication → the duplication assertion, else none),
- and on success, the exact multiset of (keys..., id) result rows.

NULL == NULL in the join (eqNullSafe), which pandas/python ``==`` does
not give for free — the model compares tuples directly (None == None
holds in Python, mirroring the null-safe semantics).
"""

from __future__ import annotations

from collections import Counter

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings
from pyspark.sql import SparkSession

from sql_autoloader_spark.exceptions import MissingKeysAfterMergeError
from sql_autoloader_spark.ops import dataframe_ops as ops

KEYS = ["k1", "k2"]
VAL = st.one_of(st.none(), st.integers(min_value=0, max_value=2))


@st.composite
def scenario(draw: st.DrawFn):
    data = draw(st.lists(st.tuples(VAL, VAL), min_size=1, max_size=6))
    # dimension fetch: unique key combos, sequential ids
    combos = draw(
        st.lists(st.tuples(VAL, VAL), min_size=0, max_size=6, unique=True)
    )
    # possibly duplicate a combo under a second id → fan-out case
    dup = draw(st.booleans()) and bool(combos)
    db = [(i + 1, *c) for i, c in enumerate(combos)]
    if dup:
        db.append((len(db) + 1, *combos[0]))
    allow_duplication = draw(st.booleans())
    return data, db, allow_duplication


def _model(
    data: list[tuple], db: list[tuple], *, allow_duplication: bool
):
    """(error_kind, result multiset) per reference semantics."""
    out = []
    duplicated = False
    missing = False
    for row in data:
        matches = [r for r in db if (r[1], r[2]) == row]
        if not matches:
            missing = True
            out.append((*row, None))
        else:
            if len(matches) > 1:
                duplicated = True
            out.extend((*row, m[0]) for m in matches)
    # null ids are checked first (see check_merge_invariants)
    if missing:
        return "missing", None
    if duplicated and not allow_duplication:
        return "duplicated", None
    return None, Counter(out)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=8,  # r16: suite wall-time budget (derandomized stream)
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scenario())
def test_merge_ids_matches_nullsafe_model(spark: SparkSession, sc) -> None:
    data_rows, db_rows, allow_duplication = sc

    data = spark.createDataFrame(data_rows, "k1 int, k2 int")
    db = spark.createDataFrame(db_rows, "the_id long, k1 int, k2 int")

    kind, want = _model(
        data_rows, db_rows, allow_duplication=allow_duplication
    )
    if kind == "missing":
        with pytest.raises(MissingKeysAfterMergeError):
            ops.merge_ids(
                data, db, "the_id", "t", allow_duplication=allow_duplication
            ).collect()
    elif kind == "duplicated":
        with pytest.raises(AssertionError, match="duplicated"):
            ops.merge_ids(
                data, db, "the_id", "t", allow_duplication=allow_duplication
            ).collect()
    else:
        got = Counter(
            (r["k1"], r["k2"], r["the_id"])
            for r in ops.merge_ids(
                data, db, "the_id", "t", allow_duplication=allow_duplication
            ).collect()
        )
        assert got == want
