"""Driver-side PostgreSQL sink over the pure-Python wire client.

Reference parity: ``PostgresConnector``
(/root/reference/sql_autoloader/postgres/postgres_connector.py:160-254)
— the psycopg-backed connector whose own test suite is skipped upstream
for lack of a live server.  Here the full loader lifecycle executes
against a REAL PostgreSQL server (the container ships the server
binaries; :class:`~sql_autoloader_spark.connectors.pgwire.EmbeddedPostgres`
manages one per test/query run), so every semantic the reference's
Postgres path promises runs for real:

- schema introspection from ``information_schema`` via the SAME dialect
  SQL the JDBC path golden-pins (jdbc.PostgresDialect — reference
  postgres_connector.py:67-157), now executed live over the wire plus a
  UNIQUE-constraint introspection the reference leaves to the database;
- idempotent inserts via ``INSERT ... ON CONFLICT DO NOTHING`` against
  real constraints (reference postgres_connector.py:13-28) — a
  uniqueness conflict keeps rows out at the database layer and surfaces
  as :class:`InsertingDataFailedError` through the shared lifecycle;
- surrogate keys minted by the database's own ``GENERATED ... AS
  IDENTITY`` / ``bigserial`` sequences and read back by the key
  retrieval scan — no engine-side key generation;
- generated compare queries executed by PostgreSQL itself (double-quote
  identifier dialect);
- genuine transaction brackets: the ``with`` block maps to one
  ``BEGIN``/``COMMIT``/``ROLLBACK`` on the single wire connection
  (reference postgres_connector.py:176-199), so a failed load leaves
  the database at its pre-block state.

Positioning at scale: like the SQLite sink this is the *compatibility*
connector — data crosses the driver as row batches, exactly how the
reference works, appropriate for dimension-scale operational targets.
Fact-scale loads belong on ``SparkConnector`` where writes stay
distributed; a cluster deployment against a big warehouse would add the
Postgres JDBC jar and use ``JDBCConnector`` (same dialect SQL) for
partitioned reads/writes.
"""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from sql_autoloader_spark.connectors.base import BaseConnector
from sql_autoloader_spark.connectors.jdbc import (
    PostgresDialect,
    fetch_schema_with_dialect,
)
from sql_autoloader_spark.connectors.pgwire import (
    PGWireClient,
    ResultSet,
    pg_literal,
)
from sql_autoloader_spark.schema import ReferenceDict, TableDict

#: rows per multi-row INSERT statement — amortizes wire round trips the
#: way the reference's executemany batches psycopg binds
_INSERT_BATCH = 500


def _spark_type(oid: int, typmod: int) -> DataType:
    """Spark type for a result column by PostgreSQL type OID (public
    pg_catalog assignments).  Unknown OIDs surface as string and are
    re-cast by ``ops.match_dtypes`` downstream — the same fallback the
    SQLite connector's affinity mapping uses."""
    if oid == 16:
        return BooleanType()
    if oid == 17:
        return BinaryType()
    if oid in (20, 21, 23, 26):
        return LongType()
    if oid in (700, 701):
        return DoubleType()
    if oid == 1082:
        return DateType()
    if oid == 1114:
        return TimestampNTZType()
    if oid == 1184:
        return TimestampType()
    if oid == 1700 and typmod >= 4:
        precision = ((typmod - 4) >> 16) & 0xFFFF
        scale = (typmod - 4) & 0xFFFF
        if 0 < precision <= 38 and scale <= precision:
            return DecimalType(precision, scale)
    return StringType()


def _norm_cell(value: object) -> object:
    """Canonical comparable form for the idempotency pre-filter: values
    whose representation differs between a Spark ``collect`` and the
    wire decode (aware vs naive timestamps, Decimal vs float text, NaN's
    non-reflexive equality) map to one form so set membership means
    value equality."""
    if value is None:
        return None
    if isinstance(value, bool):
        return value
    if isinstance(value, float):
        return "__nan__" if value != value else value
    if isinstance(value, decimal.Decimal):
        as_float = float(value)
        return "__nan__" if as_float != as_float else as_float
    if isinstance(value, datetime.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(datetime.timezone.utc).replace(
                tzinfo=None
            )
        return str(value)
    if isinstance(value, datetime.date):
        return str(value)
    if isinstance(value, bytearray):
        return bytes(value)
    return value


class PostgresConnector(BaseConnector):
    """Auto-loader over a live PostgreSQL database reached through the
    wire-protocol client.

    Parameters
    ----------
    spark:
        Session for the DataFrame side of the lifecycle (dedup,
        null-safe key merge, compare validation).
    client:
        An open :class:`PGWireClient`; alternatively pass ``sock_dir``/
        ``port``/``user``/``database`` and one is opened here.  The
        connector owns whichever connection it uses (``close()``).
    """

    _quote = '"'

    def __init__(
        self,
        spark: SparkSession,
        *,
        client: PGWireClient | None = None,
        sock_dir: str | None = None,
        port: int = 54321,
        user: str = "postgres",
        database: str = "postgres",
    ) -> None:
        self.spark = spark
        if client is None:
            if sock_dir is None:
                msg = "pass either an open client= or sock_dir=/port="
                raise ValueError(msg)
            client = PGWireClient(
                sock_dir, port, user=user, database=database
            )
        self.client = client
        self.dialect = PostgresDialect()
        self._in_transaction = False
        self.schema = self.get_schema()

    # -- transactions -------------------------------------------------------

    def __enter__(self):  # noqa: ANN204 - Self on 3.11 via base
        self.client.execute("BEGIN")
        self._in_transaction = True
        return self

    def __exit__(self, exc_type: object, *exception: object) -> None:
        self._in_transaction = False
        # a failed statement leaves the transaction aborted; ROLLBACK is
        # always legal, COMMIT of an aborted transaction rolls back too
        self.client.execute("COMMIT" if exc_type is None else "ROLLBACK")

    def close(self) -> None:
        self.client.close()

    # -- DDL / metadata -----------------------------------------------------

    def execute_ddl(self, script: str) -> None:
        """Run a DDL script and re-introspect (reference C5 passthrough,
        connector.py:167-173).  A multi-statement simple-query message
        executes as one implicit transaction — all-or-nothing, like the
        sqlite3 ``executescript`` the SQLite sink uses."""
        self.client.execute(script)
        self.update_schema()

    def fetch_schema(self) -> tuple[list[TableDict], list[ReferenceDict]]:
        return fetch_schema_with_dialect(self.dialect, self._rows)

    # -- wire plumbing ------------------------------------------------------

    def _rows(self, sql: str) -> list[dict]:
        rs = self.client.query(sql)
        if rs is None:
            return []
        return [dict(zip(rs.columns, row, strict=True)) for row in rs.rows]

    def _frame(self, rs: ResultSet | None) -> DataFrame:
        if rs is None:
            return self.spark.createDataFrame([], StructType([]))
        fields = [
            StructField(name, _spark_type(oid, typmod), nullable=True)
            for name, oid, typmod in zip(
                rs.columns, rs.oids, rs.typmods, strict=True
            )
        ]
        rows = [
            tuple(
                str(v)
                if isinstance(f.dataType, StringType) and v is not None
                else v
                for v, f in zip(row, fields, strict=True)
            )
            for row in rs.rows
        ]
        return self.spark.createDataFrame(rows, StructType(fields))

    # -- physical primitives ------------------------------------------------

    def _read_table(self, table: str) -> DataFrame:
        return self._frame(self.client.query(f'SELECT * FROM "{table}"'))

    def _write_new_rows(
        self,
        table: str,
        new_rows: DataFrame,
        columns: list[str],
        *,
        payload_bound: int | None = None,
    ) -> None:
        """Idempotent insert, two layers deep (mirrors the SQLite sink):

        1. rows already present — all inserted columns equal, NULLs
           equal — are filtered out driver-side, so re-loading identical
           data never grows constraint-less tables;
        2. the remainder goes through ``INSERT ... ON CONFLICT DO
           NOTHING`` so REAL constraints arbitrate genuine conflicts
           (same key, different payload), exactly like the reference
           (postgres_connector.py:13-28).
        """
        quoted = ", ".join(f'"{c}"' for c in columns)
        existing = {
            tuple(_norm_cell(v) for v in row)
            for row in (self.client.query(
                f'SELECT DISTINCT {quoted} FROM "{table}"'
            ) or ResultSet()).rows
        }
        payload = [
            row
            for row in (
                tuple(r[c] for c in columns)
                for r in new_rows.select(*columns).collect()
            )
            if tuple(_norm_cell(v) for v in row) not in existing
        ]
        for start in range(0, len(payload), _INSERT_BATCH):
            values = ", ".join(
                "(" + ", ".join(pg_literal(v) for v in row) + ")"
                for row in payload[start : start + _INSERT_BATCH]
            )
            self.client.execute(
                f'INSERT INTO "{table}" ({quoted}) VALUES {values} '
                "ON CONFLICT DO NOTHING"
            )

    def _execute_compare_query(self, query: str) -> DataFrame:
        return self._frame(self.client.query(query))
