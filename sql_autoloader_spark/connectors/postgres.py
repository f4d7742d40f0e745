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

Positioning at scale: the driver's single connection never carries
table-sized traffic in either direction.

- **Writes**: small known payloads (dimension tables) land in a typed
  session-temp table via driver-rendered ``VALUES`` lists,
  reference-shaped — but BOTH idempotency layers run SERVER-side in
  the merge statement (a hashable typed ``EXCEPT`` set difference +
  ``ON CONFLICT DO NOTHING``), so the target is never read back
  through the driver.  Anything larger — or of unknown size, the
  scale-safe default — goes through the distributed COPY path:
  executors ``COPY`` DataFrame partitions concurrently into an
  unlogged staging table (PostgreSQL's fastest ingest primitive, N
  parallel streams), and the same one-statement ``EXCEPT`` +
  ``ON CONFLICT`` merge folds staging into the target.  When a
  covering UNIQUE/PK constraint guarantees duplicates conflict, the
  ``EXCEPT`` pre-filter (an O(target) scan per load) is skipped
  entirely — ``ON CONFLICT`` alone keeps re-loads idempotent.
- **Validation**: the generated compare's happy path is an in-database
  checksum aggregate — eleven numbers cross the wire.
- **Reads**: tables above ``read_copy_bytes`` stream out of the server
  through executor-side ctid-ranged ``COPY ... TO STDOUT``.

On a real cluster executors dial the warehouse over TCP (``host=``),
with md5/SCRAM-SHA-256 auth and TLS when the deployment requires them.
"""

from __future__ import annotations

import itertools
import logging
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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
    PGWireError,
    ResultSet,
    UnstorableTextError,
    copy_text_parse,
    copy_text_row,
    pg_literal,
)
from sql_autoloader_spark.exceptions import TransactionAbortedError
from sql_autoloader_spark.ops import dataframe_ops as ops
from sql_autoloader_spark.schema import ReferenceDict, TableDict

logger = logging.getLogger("sql_autoloader_spark")

#: rows per multi-row INSERT statement — sized so the default
#: ``copy_threshold`` payload fits ONE statement (= one linear
#: hash-anti-join scan of the target for the whole insert); the
#: reference's executemany batched at wire-bind granularity instead
_INSERT_BATCH = 5000

#: schema holding per-load staging tables for the distributed COPY
#: path; outside 'public' so introspection (jdbc.PostgresDialect
#: filters table_schema='public') never sees load machinery
_STAGING_SCHEMA = "_al_staging"

#: COPY bytes buffered per CopyData message from each executor
_COPY_BUFFER = 1 << 18

#: default cap on concurrently-held snapshot-export connections (one
#: idle read-only REPEATABLE READ transaction each); see the
#: ``snapshot_exports=`` constructor parameter
_MAX_SNAPSHOT_HOLDERS = 8

#: naive timestamp text is interpreted in the connection's TimeZone;
#: every Spark-side rendering this connector produces is UTC-naive
#: (collects run under ``ops.utc_session``, COPY payloads are formatted
#: JVM-side in UTC), so pin the interpretation to match on EVERY
#: connection the connector opens.  DateStyle is pinned too: the wire
#: and COPY decoders parse ISO output only, and a server configured
#: with e.g. 'German, DMY' would otherwise break every datetime read.
_TZ_SETUP = "SET TIME ZONE 'UTC'; SET datestyle = ISO"

#: extra setup for auxiliary/executor connections only: these run
#: autocommit statements that take locks on tables the DRIVER connection
#: may hold stronger locks on mid-transaction (e.g. the staging CREATE's
#: AccessShare vs an AccessExclusive from DDL inside an open ``with db:``
#: block) while the driver synchronously waits on them — an untimed lock
#: wait would be a mutual hang, a bounded ``lock_timeout`` turns it into
#: a clear error.  Deliberately NO statement_timeout: these connections
#: carry the fact-scale COPY streams, whose legitimate runtime is
#: unbounded at 100 TB — only lock WAITS are capped.
_AUX_SESSION_SETUP = f"{_TZ_SETUP}; SET lock_timeout = '30s'"


def _copy_partition_reader(
    host: str | None,
    sock_dir: str | None,
    port: int,
    user: str,
    database: str,
    password: str | None,
    tls: bool,
    tls_ca: str | None,
    tls_verify_hostname: bool,
    table: str,
    quoted: str,
    oids: list[int],
    snapshot_id: str | None,
):
    """Build the ``mapPartitions`` task for the distributed COPY read:
    each partition holds one ctid block range and streams it out over
    its own wire connection — the read twin of
    :func:`_copy_partition_writer` (N executors COPYing OUT of the
    server concurrently).  TID range scans (block-addressed) split the
    heap physically, so ranges are balanced regardless of key skew and
    need no index; the LAST range is unbounded above so blocks appended
    after planning are still read.

    *snapshot_id*: a ``pg_export_snapshot()`` export every partition
    imports (``SET TRANSACTION SNAPSHOT``) so ALL ranges — and any
    Spark task retry or re-execution — read ONE MVCC snapshot of the
    table, exactly like a single-connection read would.  If the
    exporting transaction has since closed (connector closed before a
    lazy re-read), the import fails LOUDLY server-side rather than
    silently reading the table's later state."""

    def read(ranges):  # noqa: ANN001 - iterator of (lo, hi|None)
        for lo, hi in ranges:
            cond = f"ctid >= '({lo},0)'"
            if hi is not None:
                cond += f" AND ctid < '({hi},0)'"
            sql = (
                f'COPY (SELECT {quoted} FROM "{table}" WHERE {cond}) '
                "TO STDOUT"
            )
            client = PGWireClient(
                sock_dir,
                port,
                host=host,
                user=user,
                database=database,
                password=password,
                tls=tls,
                tls_ca=tls_ca,
                tls_verify_hostname=tls_verify_hostname,
            )
            try:
                client.execute(_AUX_SESSION_SETUP)
                if snapshot_id is not None:
                    client.execute(
                        "BEGIN ISOLATION LEVEL REPEATABLE READ READ"
                        f" ONLY; SET TRANSACTION SNAPSHOT"
                        f" {pg_literal(snapshot_id)}"
                    )
                for line in client.copy_out(sql):
                    yield copy_text_parse(line, oids)
                if snapshot_id is not None:
                    client.execute("COMMIT")
            finally:
                client.close()

    return read


def _checksum_compare_sql(staging: str, quoted: str, query: str) -> str:
    """The in-database twin of ``ops.fast_set_equal``'s aggregate.

    Each row hashes as ``md5(ROW(cols)::text)`` — ``record_out`` is a
    canonical, injective rendering (NULL and empty string stay distinct,
    floats print shortest-round-trip) shared by both sides.  The two
    64-bit halves of the digest are independent channels; each side
    folds them with BOTH an order-independent sum (as numeric — bigint
    sums overflow) and a bit_xor, so a collision must defeat four
    combiners of a 128-bit digest (~2^-128, the same bound as the Spark
    fast path).  One streaming aggregate, one result row.
    """
    return f"""
        WITH __u AS (
            SELECT 1 AS __side, md5(ROW({quoted})::text) AS __h
              FROM (SELECT DISTINCT {quoted} FROM {staging}) __d
            UNION ALL
            SELECT 0 AS __side, md5(ROW({quoted})::text) AS __h
              FROM ({query}) __b
        ), __hh AS (
            SELECT __side,
                   ('x' || substr(__h, 1, 16))::bit(64)::bigint AS __h1,
                   ('x' || substr(__h, 17, 16))::bit(64)::bigint AS __h2
              FROM __u
        )
        SELECT count(*) FILTER (WHERE __side = 1) AS __n_d,
               count(*) FILTER (WHERE __side = 0) AS __n_b,
               coalesce(sum(__h1::numeric) FILTER (WHERE __side = 1), 0) AS __s1_d,
               coalesce(sum(__h1::numeric) FILTER (WHERE __side = 0), 0) AS __s1_b,
               coalesce(bit_xor(__h1) FILTER (WHERE __side = 1), 0) AS __x1_d,
               coalesce(bit_xor(__h1) FILTER (WHERE __side = 0), 0) AS __x1_b,
               coalesce(sum(__h2::numeric) FILTER (WHERE __side = 1), 0) AS __s2_d,
               coalesce(sum(__h2::numeric) FILTER (WHERE __side = 0), 0) AS __s2_b,
               coalesce(bit_xor(__h2) FILTER (WHERE __side = 1), 0) AS __x2_d,
               coalesce(bit_xor(__h2) FILTER (WHERE __side = 0), 0) AS __x2_b
          FROM __hh
    """


def _close_quietly(client: PGWireClient) -> None:
    """Finalizer-safe close (runs from gc, socket may be dead)."""
    try:
        client.close()
    except Exception:  # noqa: BLE001, S110
        pass


def _render_values_row(row: tuple, columns: list[str]) -> str:
    """One parenthesized VALUES tuple, naming the column on an
    :class:`UnstorableTextError` so the driver-path rejection is as
    actionable as the COPY path's."""
    parts = []
    for col, v in zip(columns, row):
        try:
            parts.append(pg_literal(v))
        except UnstorableTextError as exc:
            raise UnstorableTextError(
                f'column "{col}": {exc}', value=exc.value
            ) from None
    return "(" + ", ".join(parts) + ")"


def _copy_partition_writer(
    host: str | None,
    sock_dir: str | None,
    port: int,
    user: str,
    database: str,
    password: str | None,
    tls: bool,
    tls_ca: str | None,
    tls_verify_hostname: bool,
    copy_sql: str,
    columns: list[str],
):
    """Build the ``foreachPartition`` task for the distributed COPY
    path.  Captures only plain connect parameters (picklable); each
    non-empty partition opens its own wire connection — on a cluster
    that is N executors COPYing into the server concurrently, the
    standard parallel-ingest topology for PostgreSQL."""

    def write(rows) -> None:  # noqa: ANN001 - iterator of Row
        client: PGWireClient | None = None
        try:
            buffer = bytearray()

            def chunks():  # noqa: ANN202
                nonlocal buffer
                for row in rows:
                    buffer += copy_text_row(tuple(row))
                    if len(buffer) >= _COPY_BUFFER:
                        yield bytes(buffer)
                        buffer = bytearray()
                if buffer:
                    yield bytes(buffer)

            gen = chunks()
            try:
                first = next(gen)
            except StopIteration:
                return  # empty partition: never connect
            client = PGWireClient(
                sock_dir,
                port,
                host=host,
                user=user,
                database=database,
                password=password,
                tls=tls,
                tls_ca=tls_ca,
                tls_verify_hostname=tls_verify_hostname,
            )
            client.execute(_AUX_SESSION_SETUP)
            client.copy_in(copy_sql, itertools.chain([first], gen))
        except UnstorableTextError as exc:
            # name the column so the task failure is actionable
            named = (
                f'column "{columns[exc.cell_index]}": {exc}'
                if exc.cell_index is not None
                and exc.cell_index < len(columns)
                else str(exc)
            )
            raise UnstorableTextError(
                named, cell_index=exc.cell_index, value=exc.value
            ) from None
        finally:
            if client is not None:
                client.close()

    return write


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
        ``host``/``port``/``user``/``database``/``password`` and one is
        opened here (``password`` and ``tls`` also flow to every
        executor/aux connection — md5 and SCRAM-SHA-256 servers are
        supported, ``tls=True`` STARTTLS-wraps every TCP connection,
        and ``tls_ca=`` additionally verifies the server certificate
        chain on each of them; ``tls_verify_hostname=True`` upgrades
        to verify-full).  The connector owns whichever
        connection it uses (``close()``).
    copy_threshold:
        Payload row-count bound at or below which inserts use the
        driver-side multi-row INSERT path.  Above it — or whenever the
        payload size is unknown — the write goes through the
        distributed COPY path (executors COPY partitions concurrently
        into an unlogged staging table; one server-side null-safe
        anti-join + ``ON CONFLICT DO NOTHING`` merges it), provided
        connect parameters were given so executors can dial in.
    copy_connections:
        Cap on concurrent executor COPY connections (partitions are
        coalesced down to this before the write; distributed reads
        split into at most this many ctid ranges).
    read_copy_bytes:
        On-disk size (heap + TOAST) above which out-of-transaction
        table reads are distributed: executors stream disjoint ctid
        block ranges via ``COPY (SELECT ...) TO STDOUT`` instead of one
        driver-connection ``SELECT *``.  Mid-transaction reads always
        stay on the driver connection (the connector's own uncommitted
        rows must be visible) and log a loud warning above this size.
    """

    _quote = '"'

    def __init__(
        self,
        spark: SparkSession,
        *,
        client: PGWireClient | None = None,
        sock_dir: str | None = None,
        host: str | None = None,
        # no meaningful default exists: EmbeddedPostgres allocates an
        # OS-assigned ephemeral port (round 11), so ALWAYS pass the
        # server's actual port (e.g. ``port=pg.port``); 5432 is the
        # conventional default only for external production servers
        port: int = 5432,
        user: str = "postgres",
        database: str = "postgres",
        password: str | None = None,
        tls: bool = False,
        tls_ca: str | None = None,
        tls_verify_hostname: bool = False,
        copy_threshold: int = 5000,
        copy_connections: int = 16,
        read_copy_bytes: int = 8 << 20,
        snapshot_exports: int = _MAX_SNAPSHOT_HOLDERS,
        except_prefilter: str = "auto",
    ) -> None:
        self.spark = spark
        # pure-parameter validation BEFORE any I/O: raising after the
        # wire connect would leak a live server connection per bad
        # construction attempt (round-12 review)
        if except_prefilter not in ("auto", "always"):
            msg = (
                f"except_prefilter={except_prefilter!r}: expected "
                "'auto' or 'always'"
            )
            raise ValueError(msg)
        if client is None:
            if sock_dir is None and host is None:
                msg = "pass either an open client= or sock_dir=/host="
                raise ValueError(msg)
            client = PGWireClient(
                sock_dir,
                port,
                host=host,
                user=user,
                database=database,
                password=password,
                tls=tls,
                tls_ca=tls_ca,
                tls_verify_hostname=tls_verify_hostname,
            )
        self.client = client
        self.client.execute(_TZ_SETUP)
        self.dialect = PostgresDialect()
        self.copy_threshold = copy_threshold
        self.copy_connections = copy_connections
        self.read_copy_bytes = read_copy_bytes
        #: cap on live snapshot-export connections (one idle read-only
        #: REPEATABLE READ transaction per distributed read): a
        #: long-lived connector must not exhaust max_connections or
        #: pin the vacuum horizon indefinitely.  Past the cap the
        #: OLDEST export is released — any frame from that read (even
        #: one never yet acted on: exports happen at construction,
        #: imports at action time) then fails loudly with "invalid
        #: snapshot identifier" instead of the SERVER failing new
        #: connections.  Size it to the number of big-table frames the
        #: application keeps live simultaneously.
        self.snapshot_exports = snapshot_exports
        # executor connect parameters; without them (bare client=) the
        # distributed COPY path is unavailable and all writes stay on
        # the driver connection
        self._connect = (
            {
                "sock_dir": sock_dir,
                "host": host,
                "port": port,
                "user": user,
                "database": database,
                "password": password,
                "tls": tls,
                "tls_ca": tls_ca,
                "tls_verify_hostname": tls_verify_hostname,
            }
            if sock_dir is not None or host is not None
            else None
        )
        #: EXCEPT pre-filter policy — identity-gap mitigation (round 12;
        #: validated pre-I/O at the top of __init__).
        #: ``"auto"``: keep the EXCEPT layer whenever the target has a
        #: NARROW (int2/int4) identity/serial column even when a
        #: covering constraint would allow skipping it — ON CONFLICT
        #: consumes sequence values for skipped rows, and a narrow
        #: sequence can exhaust in weeks under hourly re-loads of a
        #: large static payload (OPERATIONS.md).  ``"always"``: never
        #: skip — zero gap growth on any re-load, at the cost of the
        #: O(target) EXCEPT scan the skip exists to save.
        self.except_prefilter = except_prefilter
        self._staging: set[str] = set()
        self._in_transaction = False
        #: open snapshot-export connections backing distributed reads
        self._snapshot_holders: list[PGWireClient] = []
        self.schema = self.get_schema()

    # -- lifecycle wrappers: UTC-bound plan analysis --------------------------
    #
    # This sink's canonical wall clock is UTC: every connection is
    # pinned ``SET TIME ZONE 'UTC'`` and both write paths store a
    # TimestampType's UTC wall clock into zone-less columns.  The
    # lifecycle's verification plans must interpret those wall clocks
    # the same way — Spark binds time-zone-sensitive casts (the
    # TIMESTAMP ↔ TIMESTAMP_NTZ alignment in ``ops.match_dtypes``) from
    # the SESSION timezone at analysis, so each entry point analyzes its
    # plans under ``ops.utc_session``.  Without this, a non-UTC session
    # reinterprets a stored NTZ wall clock as session-local and every
    # verification of a TimestampType→timestamp load mismatches.  The
    # conf lock is held across the wrapped call (including its actions);
    # concurrent OTHER-thread conf toggles on the same session serialize
    # behind it — the documented trade, as in ``ops._aqe_disabled``.

    def insert(self, data: DataFrame, **kwargs) -> None:  # noqa: ANN003
        with ops.utc_session(self.spark):
            return super().insert(data, **kwargs)

    def _retrieve_ids_counted(self, data: DataFrame, **kwargs):  # noqa: ANN003, ANN202
        with ops.utc_session(self.spark):
            return super()._retrieve_ids_counted(data, **kwargs)

    def compare(self, data: DataFrame, **kwargs) -> None:  # noqa: ANN003
        with ops.utc_session(self.spark):
            return super().compare(data, **kwargs)

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
        if exc_type is None and self.client.last_tag == "ROLLBACK":
            # an earlier statement aborted the transaction and user code
            # swallowed the exception inside the block: the server turned
            # our COMMIT into a rollback and reports it ONLY via the
            # command tag — surface it instead of claiming durability
            self._sweep_staging()
            msg = (
                "COMMIT completed as ROLLBACK: the transaction was "
                "aborted by an earlier error inside the block; nothing "
                "was persisted"
            )
            raise TransactionAbortedError(msg)
        # a clean commit also committed the staging drops; after a
        # rollback the drops rolled back while the COPY'd staging data
        # (committed by executor connections) survived — sweep it now
        self._sweep_staging()

    def close(self) -> None:
        self._release_snapshots()
        self._sweep_staging()
        self.client.close()

    def _sweep_staging(self) -> None:
        for stage in list(self._staging):
            try:
                self.client.execute(
                    f'DROP TABLE IF EXISTS "{_STAGING_SCHEMA}"."{stage}"'
                )
            except PGWireError:  # pragma: no cover - sweep is best-effort
                break
            self._staging.discard(stage)

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

    def _unique_covers(self, table: str, columns: list[str]) -> bool:
        """True when some non-deferrable UNIQUE or PRIMARY KEY
        constraint's columns are a subset of *columns* and a duplicate
        key NECESSARILY conflicts (every member NOT NULL, or the
        constraint is NULLS NOT DISTINCT — plain UNIQUE treats NULL
        keys as distinct, so a nullable member lets exact-duplicate
        NULL-key rows slip past ON CONFLICT).

        When true, re-inserting an exactly-present row is guaranteed to
        hit ``ON CONFLICT DO NOTHING``, so the ``EXCEPT SELECT … FROM
        target`` pre-filter — an O(target) scan per load — is provably
        redundant and the write paths skip it.  Deferrable constraints
        are excluded because ON CONFLICT cannot use them as arbiters;
        partial unique INDEXES are not constraints and are (soundly)
        never considered.
        """
        # Probed fresh per WRITE, deliberately uncached: a constraint
        # dropped by ANOTHER session (migration, DBA) must flip the
        # next load back to the EXCEPT layer, or re-loads would
        # silently duplicate — one indexed catalog lookup per write is
        # noise next to the O(target) scan the skip saves.
        # pg_index.indnullsnotdistinct exists from PG 15; version-gate
        # rather than try/except — a failed probe statement would abort
        # an open ``with db:`` transaction.
        # leading digits only: betas/devel report '16beta1'/'17devel'
        digits = re.match(
            r"\d+", self.client.parameters.get("server_version", "")
        )
        major = int(digits.group()) if digits else 0
        nnd = (
            "COALESCE(i.indnullsnotdistinct, FALSE)"
            if major >= 15
            else "FALSE"
        )
        rows = self._rows(
            f"SELECT c.conname, a.attname, a.attnotnull, {nnd} AS nnd"
            "  FROM pg_constraint c"
            "  JOIN pg_attribute a"
            "    ON a.attrelid = c.conrelid"
            "   AND a.attnum = ANY (c.conkey)"
            "  LEFT JOIN pg_index i ON i.indexrelid = c.conindid"
            f" WHERE c.conrelid = {self._regclass(table)}"
            "   AND c.contype IN ('p', 'u')"
            "   AND NOT c.condeferrable"
        )
        by_con: dict[str, list[dict]] = {}
        for r in rows:
            by_con.setdefault(r["conname"], []).append(r)
        cols = set(columns)
        return any(
            ({r["attname"] for r in members} <= cols)
            and (
                all(r["attnotnull"] for r in members)
                or members[0]["nnd"]
            )
            for members in by_con.values()
        )

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
        # wire timestamptz decodes to UTC-naive; enter Spark under UTC so
        # the session timezone does not reinterpret the wall clock
        with ops.utc_session(self.spark):
            return self.spark.createDataFrame(rows, StructType(fields))

    # -- physical primitives ------------------------------------------------

    def _read_table(self, table: str) -> DataFrame:
        """Current visible contents of *table*, routed by size.

        Small tables (dimension scans, the lifecycle's common case) pull
        through the driver connection — which is also the only correct
        path mid-transaction, where the connector's own uncommitted rows
        must be visible.  Above ``read_copy_bytes`` (and outside a
        transaction, where autocommit means no uncommitted state exists)
        the read goes DISTRIBUTED: executors stream disjoint ctid block
        ranges concurrently via ``COPY (SELECT ...) TO STDOUT`` — the
        read twin of the COPY write path — so a fact-sized key
        retrieval never crosses the driver.  A fact-sized read that is
        FORCED driver-side by an open transaction logs a loud warning
        naming the scale-safe alternatives."""
        size = self._table_size(table)
        big = size is not None and size > self.read_copy_bytes
        if big and self._connect is not None and not self._in_transaction:
            return self._read_table_distributed(table)
        if big:
            logger.warning(
                "Reading %s MiB table '%s' through the single driver "
                "connection (%s). At scale, run fact loads outside the "
                "'with db:' block (autocommit) so reads distribute, or "
                "construct the connector with sock_dir=/host= so "
                "executors can dial in.",
                size >> 20,
                table,
                "open transaction"
                if self._in_transaction
                else "no executor connect parameters",
            )
        return self._frame(self.client.query(f'SELECT * FROM "{table}"'))

    @staticmethod
    def _regclass(table: str) -> str:
        """Escaped ``::regclass`` literal for *table*: the name travels
        INSIDE a string literal for catalog lookups, so it needs literal
        escaping on top of the identifier quoting — a table legally
        named ``it's`` must not terminate the literal (or splice SQL)."""
        ident = '"' + table.replace('"', '""') + '"'
        return f"{pg_literal(ident)}::regclass"

    def _table_size(self, table: str) -> int | None:
        """Total on-disk bytes (heap + TOAST) — one catalog lookup."""
        rs = self.client.query(
            f"SELECT pg_table_size({self._regclass(table)})"
        )
        return rs.rows[0][0] if rs is not None and rs.rows else None

    def _export_read_snapshot(self) -> str | None:
        """Export one MVCC snapshot for a distributed read.

        A lazy partitioned read would otherwise take a separate
        autocommit snapshot per partition connection at action time —
        no single point-in-time view (a concurrent UPDATE can surface a
        row twice or not at all across ranges), and any Spark task
        retry or second action silently re-reads the table's LATER
        state.  Exporting ``pg_export_snapshot()`` from a driver-held
        ``REPEATABLE READ READ ONLY`` transaction and importing it in
        every partition restores exactly the single-connection
        semantics of the driver-side ``_frame`` path.

        The exporting connection must stay open until the partitions
        have imported; derived frames (lifecycle joins/aggregates)
        share the read's RDD plan and may re-execute it much later, so
        the holder lives on the connector until ``close()`` — bounded
        by ``_MAX_SNAPSHOT_HOLDERS`` (oldest released first).  A
        re-execution AFTER close fails loudly server-side ("invalid
        snapshot identifier") instead of silently diverging.  The cost
        is one idle read-only REPEATABLE READ transaction per
        distributed read for the connector's lifetime (it can pin the
        vacuum horizon on a busy server — close connectors promptly; a
        server-side ``idle_in_transaction_session_timeout`` reaping
        the holder degrades a later re-read to the same loud error).
        Failure to export (old server, aux dial-in problem) degrades
        to the previous per-partition-snapshot behavior with a
        warning.
        """
        try:
            holder = self._aux_client()
        except Exception as e:  # noqa: BLE001 - snapshot is best-effort
            logger.warning(
                "could not open a snapshot-export connection (%s); "
                "distributed read proceeds without a shared snapshot",
                e,
            )
            return None
        try:
            holder.execute(
                "BEGIN ISOLATION LEVEL REPEATABLE READ READ ONLY"
            )
            (snapshot_id,) = holder.query(
                "SELECT pg_export_snapshot()"
            ).rows[0]
        except Exception as e:  # noqa: BLE001
            holder.close()
            logger.warning(
                "pg_export_snapshot unavailable (%s); distributed "
                "read proceeds without a shared snapshot",
                e,
            )
            return None
        self._snapshot_holders.append(holder)
        while len(self._snapshot_holders) > self.snapshot_exports:
            _close_quietly(self._snapshot_holders.pop(0))
            logger.warning(
                "released the oldest snapshot export (> %d held — "
                "raise snapshot_exports= to keep more): any frame "
                "from that read now fails loudly when (re-)executed",
                self.snapshot_exports,
            )
        return str(snapshot_id)

    def _release_snapshots(self) -> None:
        """Close all snapshot-export connections (their transactions
        abort server-side; later imports then fail loudly)."""
        while self._snapshot_holders:
            _close_quietly(self._snapshot_holders.pop())

    def _read_table_distributed(self, table: str) -> DataFrame:
        """N executor connections each COPY one ctid block range out of
        the server; rows parse by column OID executor-side
        (:func:`pgwire.copy_text_parse`) and land as a typed DataFrame
        without ever touching the driver.  All partitions import ONE
        exported MVCC snapshot (:meth:`_export_read_snapshot`), so the
        frame is a consistent point-in-time view even under concurrent
        writers and across task retries."""
        meta = self.client.query(f'SELECT * FROM "{table}" LIMIT 0')
        fields = [
            StructField(name, _spark_type(oid, typmod), nullable=True)
            for name, oid, typmod in zip(
                meta.columns, meta.oids, meta.typmods, strict=True
            )
        ]
        (main_bytes,) = self.client.query(
            f"SELECT pg_relation_size({self._regclass(table)})"
        ).rows[0]
        blocks = max(int(main_bytes) // 8192, 1)
        # ~64 blocks (512 KiB) of heap per task at minimum; capped by
        # the connection budget
        nranges = max(min(self.copy_connections, blocks // 64), 1)
        bounds = [blocks * i // nranges for i in range(nranges)]
        ranges: list[tuple[int, int | None]] = [
            (bounds[i], bounds[i + 1] if i + 1 < nranges else None)
            for i in range(nranges)
        ]
        quoted = ", ".join(f'"{c}"' for c in meta.columns)
        conn = self._connect
        assert conn is not None  # routing guarantees this  # noqa: S101
        # columns landing as StringType must ARRIVE as strings: mask
        # their wire OID to text so decoders that return richer Python
        # types (e.g. Decimal for a bare unconstrained numeric, which
        # has no typmod to map) don't crash schema verification — the
        # same `str(v)` coercion the driver-path _frame applies
        masked_oids = [
            25 if isinstance(f.dataType, StringType) else oid
            for f, oid in zip(fields, meta.oids, strict=True)
        ]
        snapshot_id = self._export_read_snapshot()
        rdd = self.spark.sparkContext.parallelize(
            ranges, len(ranges)
        ).mapPartitions(
            _copy_partition_reader(
                conn["host"],
                conn["sock_dir"],
                conn["port"],
                conn["user"],
                conn["database"],
                conn["password"],
                conn["tls"],
                conn["tls_ca"],
                conn["tls_verify_hostname"],
                table,
                quoted,
                masked_oids,
                snapshot_id,
            )
        )
        # NOTE: the export is held until close() — NOT tied to this
        # wrapper's garbage collection, because derived frames (joins,
        # aggregates the lifecycle builds on top) share the underlying
        # RDD plan and outlive the wrapper object.
        return self.spark.createDataFrame(rdd, StructType(fields))

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
           equal — are filtered out, so re-loading identical data never
           grows constraint-less tables;
        2. the remainder goes through ``INSERT ... ON CONFLICT DO
           NOTHING`` so REAL constraints arbitrate genuine conflicts
           (same key, different payload), exactly like the reference
           (postgres_connector.py:13-28).

        Physical strategy by payload size: at or below
        ``copy_threshold`` known rows, the driver path — the PAYLOAD is
        collected and rendered into ``VALUES`` lists (reference-shaped,
        postgres_connector.py executemany analogue), but BOTH
        idempotency layers run server-side in the same statement
        (a hashable ``EXCEPT`` set difference + ``ON
        CONFLICT``), so the TARGET table is never read: a 100-row
        incremental load into a billion-row dimension moves 100 rows,
        not the dimension.  Server-side comparison is also exact typed
        equality — no driver-side value normalization can diverge from
        the database's own semantics.  Above the threshold — or when
        the size is unknown, the scale-safe default — the distributed
        COPY path: nothing is ever collected to the driver either.
        """
        small = (
            payload_bound is not None
            and payload_bound <= self.copy_threshold
        )
        if self._connect is not None and not small:
            self._copy_write(table, new_rows, columns)
            return
        quoted = ", ".join(f'"{c}"' for c in columns)
        # collect under UTC so TimestampType renders as the same UTC
        # wall clock the connection's pinned 'SET TIME ZONE UTC' writes
        with ops.utc_session(self.spark):
            collected = new_rows.select(*columns).collect()
        payload = [tuple(r[c] for c in columns) for r in collected]
        if not payload:
            return
        # The payload lands first in a SESSION-TEMP table typed like the
        # target (CTAS WITH NO DATA clones exact typmods), so literals
        # take ASSIGNMENT casts — a value too long for varchar(n) errors
        # exactly like a plain INSERT or the COPY path would, where an
        # explicit ::cast would silently truncate; bare literals for
        # uuid/enum/inet columns resolve to the landing types with no
        # catalog machinery.  The null-safe already-present filter is
        # then a type-exact ``EXCEPT``: exact SQL VALUE equality
        # (numeric 1.5 ≡ 1.50, float -0 ≡ 0, NULLs not distinct —
        # semantics a rendered-text or driver-side normalization can
        # only approximate) that PostgreSQL executes as a linear
        # HashSetOp.  A hand-rolled ``NOT EXISTS`` with ``IS NOT
        # DISTINCT FROM`` has the same semantics but CANNOT hash — it
        # plans as a Nested Loop Anti Join, O(payload × table),
        # measured 239 s where this shape takes ~4 s.  The temp table
        # is per-connection (each connector owns its driver
        # connection), joins the surrounding transaction's fate, and is
        # dropped eagerly on the happy path.
        tmp = 'pg_temp."__al_values"'
        self.client.execute(f"DROP TABLE IF EXISTS {tmp}")
        self.client.execute(
            f'CREATE TEMP TABLE "__al_values" AS '
            f'SELECT {quoted} FROM "{table}" WITH NO DATA'
        )
        for start in range(0, len(payload), _INSERT_BATCH):
            values = ", ".join(
                _render_values_row(row, columns)
                for row in payload[start : start + _INSERT_BATCH]
            )
            self.client.execute(
                f"INSERT INTO {tmp} ({quoted}) VALUES {values}"
            )
        self.client.execute(
            f'INSERT INTO "{table}" ({quoted}) '
            f"SELECT {quoted} FROM ("
            f"{self._merge_source(table, tmp, quoted, columns)}"
            ") AS __new "
            "ON CONFLICT DO NOTHING"
        )
        self.client.execute(f"DROP TABLE {tmp}")

    def _merge_source(
        self, table: str, staging: str, quoted: str, columns: list[str]
    ) -> str:
        """The merge statement's row source, shared by both physical
        write paths.

        Default: ``staging EXCEPT SELECT … FROM target`` — the
        HASHABLE exact-value null-safe already-present filter (see the
        comments at the call sites), which both dedups staging and
        keeps re-loads of identical data from growing CONSTRAINT-LESS
        tables.  When a covering UNIQUE/PK constraint guarantees that
        an exactly-present row conflicts (:meth:`_unique_covers`), the
        EXCEPT's O(target) scan per load is provably redundant — ``ON
        CONFLICT DO NOTHING`` alone already provides both idempotency
        layers — so the source collapses to ``SELECT DISTINCT`` over
        staging only: an incremental load into a billion-row
        constrained fact table then touches the index, not the heap.

        Documented side effect of the skip (round-11 advice): ``ON
        CONFLICT DO NOTHING`` evaluates identity/sequence defaults
        BEFORE arbitration, so re-loading an already-present payload
        into a covered table with a ``GENERATED ... AS IDENTITY``
        column consumes sequence values for the skipped rows —
        surrogate-id GAPS grow by up to the payload size per re-load
        (the EXCEPT layer used to keep those rows out of the INSERT
        entirely).  Gaps are semantically harmless (identity columns
        promise uniqueness, not density) and PostgreSQL sequences hold
        2^63 values, but a pipeline that re-loads a large static
        payload hourly into an ``integer`` identity column could
        exhaust 2^31 in ~weeks.  Mitigation (round 12): the skip is
        policy-gated by ``except_prefilter`` — ``"auto"`` (default)
        AUTO-RETAINS the EXCEPT layer when the target carries a narrow
        (int2/int4) identity or serial column, so the exhaustion
        scenario never skips; ``"always"`` retains it unconditionally
        for operators who care about gap growth on wide identities
        too.  See OPERATIONS.md § Operating the PostgreSQL sink.
        """
        if (
            self.except_prefilter != "always"
            and self._unique_covers(table, columns)
            and not self._narrow_identity(table)
        ):
            return f"SELECT DISTINCT {quoted} FROM {staging}"
        return (
            f"SELECT {quoted} FROM {staging} "
            f'EXCEPT SELECT {quoted} FROM "{table}"'
        )

    def _narrow_identity(self, table: str) -> bool:
        """True when *table* has an int2/int4 identity or serial
        column — the sequence-exhaustion hazard the ``"auto"`` policy
        guards (a 2^31 sequence consumed by skipped re-insert rows).
        Probed fresh per write like :meth:`_unique_covers` (a type
        change by another session must flip the next load's plan);
        one indexed catalog lookup per write.
        """
        rows = self._rows(
            "SELECT count(*) AS n"
            "  FROM pg_attribute a"
            "  LEFT JOIN pg_attrdef d"
            "    ON d.adrelid = a.attrelid AND d.adnum = a.attnum"
            f" WHERE a.attrelid = {self._regclass(table)}"
            "   AND a.attnum > 0 AND NOT a.attisdropped"
            "   AND a.atttypid IN ('int2'::regtype, 'int4'::regtype)"
            "   AND (a.attidentity IN ('a', 'd')"
            "        OR pg_get_expr(d.adbin, d.adrelid)"
            "           LIKE 'nextval(%')"
        )
        return bool(rows and rows[0]["n"])

    def _copy_write(
        self, table: str, new_rows: DataFrame, columns: list[str]
    ) -> None:
        """Distributed idempotent insert: executors COPY partitions of
        *new_rows* concurrently into a fresh unlogged staging table,
        then ONE server-side statement merges it into *table* —

        ``INSERT … SELECT … FROM (staging EXCEPT SELECT … FROM table)
        ON CONFLICT DO NOTHING``

        — the same two idempotency layers as the driver path (EXCEPT
        is the HASHABLE exact-value null-safe spelling of the
        pre-filter — see the comment at the statement; real
        constraints still arbitrate genuine conflicts).  No row ever
        crosses the driver.

        Transactional shape (SURVEY §7.4 stage-validate-swap): staging
        lives in its own schema, created and COPY'd over autocommit
        connections so executors can see it even while the driver
        connection is mid-transaction; the merge and the staging DROP
        run on the driver connection, so they commit or roll back with
        the surrounding ``with`` block.  Rolled-back staging leftovers
        are swept on ``__exit__``/``close``; ``sweep_staging`` clears
        anything a crashed driver left behind.
        """
        quoted = ", ".join(f'"{c}"' for c in columns)
        qualified, stage = self._stage_frame(
            new_rows,
            columns,
            like_sql=f'SELECT {quoted} FROM "{table}"',
            prefix=f"stage_{table}",
        )
        # The null-safe already-present filter is ``EXCEPT``: exact SQL
        # VALUE equality with set semantics (it also dedups staging, so
        # no separate DISTINCT), executed as a linear HashSetOp.  A
        # hand-rolled ``NOT EXISTS`` with ``IS NOT DISTINCT FROM`` has
        # the same semantics but CANNOT hash — it plans the merge as a
        # Nested Loop Anti Join, O(staging × target): a 10,000× plan-
        # cost blowup already at 100k × 100k (EXPLAIN-verified), i.e.
        # every incremental fact load would go quadratic.
        self.client.execute(
            f'INSERT INTO "{table}" ({quoted}) '
            f"SELECT {quoted} FROM ("
            f"{self._merge_source(table, qualified, quoted, columns)}"
            ") AS __new "
            "ON CONFLICT DO NOTHING"
        )
        # transactional: rolls back with the block, in which case the
        # exit sweep drops the orphan
        self.client.execute(f"DROP TABLE {qualified}")
        if not self._in_transaction:
            self._staging.discard(stage)

    def _stage_frame(
        self,
        frame: DataFrame,
        columns: list[str],
        *,
        like_sql: str,
        prefix: str,
    ) -> tuple[str, str]:
        """Distributed COPY of *frame* into a fresh unlogged staging
        table whose column types clone *like_sql*'s output (so the
        server casts COPY text into exactly the landing types).

        Staging lives in its own schema, created and COPY'd over
        AUTOCOMMIT connections so executors can see it even while the
        driver connection is mid-transaction; task retries may duplicate
        partition rows, which every consumer neutralizes (the write
        merge SELECTs DISTINCT, the compare checksums DISTINCT).
        Returns ``(qualified_name, stage_name)``; the stage is
        registered for the exit/close sweeps.
        """
        stage = f"{prefix}_{os.urandom(6).hex()}"
        quoted = ", ".join(f'"{c}"' for c in columns)
        qualified = f'"{_STAGING_SCHEMA}"."{stage}"'
        aux = self._aux_client()
        try:
            aux.execute(f'CREATE SCHEMA IF NOT EXISTS "{_STAGING_SCHEMA}"')
            aux.execute(
                f"CREATE UNLOGGED TABLE {qualified} AS {like_sql} "
                "WITH NO DATA"
            )
        finally:
            aux.close()
        self._staging.add(stage)
        out = self._render_timestamps(frame.select(*columns))
        if (
            out.rdd.getNumPartitions() > self.copy_connections
        ):  # cap concurrent server connections
            out = out.coalesce(self.copy_connections)
        conn = self._connect
        assert conn is not None  # routing guarantees this  # noqa: S101
        out.foreachPartition(
            _copy_partition_writer(
                conn["host"],
                conn["sock_dir"],
                conn["port"],
                conn["user"],
                conn["database"],
                conn["password"],
                conn["tls"],
                conn["tls_ca"],
                conn["tls_verify_hostname"],
                f"COPY {qualified} ({quoted}) FROM STDIN",
                list(columns),
            )
        )
        return qualified, stage

    @staticmethod
    def _render_timestamps(frame: DataFrame) -> DataFrame:
        """Render timestamp columns to UTC wall-clock text JVM-side
        before a COPY.

        ``TimestampType`` crosses the Python boundary as a NAIVE
        datetime in the session timezone, which the server would then
        reinterpret in the CONNECTION's timezone — two configs that
        nothing forces to agree.  Instead, format the instant's UTC
        wall clock: every connection this connector opens is pinned
        ``SET TIME ZONE 'UTC'``, so a ``timestamptz`` landing stores
        the exact instant and a ``timestamp`` landing stores the SAME
        canonical UTC wall clock the driver INSERT path stores (which
        collects under ``ops.utc_session``) — both physical paths land
        bit-identical values.  The UTC binding happens at ANALYSIS time
        (Spark resolves expression time zones from the session conf
        when the plan is analyzed), so the lock is held only across
        plan construction, never across the COPY itself; executors skip
        per-row Python datetime rendering entirely.  NTZ timestamps are
        zone-free wall clocks — a plain string cast is canonical.
        """
        exprs = []
        changed = False
        for fld in frame.schema.fields:
            if isinstance(fld.dataType, TimestampType):
                exprs.append(
                    F.date_format(
                        fld.name, "yyyy-MM-dd HH:mm:ss.SSSSSS"
                    ).alias(fld.name)
                )
                changed = True
            elif isinstance(fld.dataType, TimestampNTZType):
                exprs.append(F.col(fld.name).cast("string").alias(fld.name))
                changed = True
            else:
                exprs.append(F.col(fld.name))
        if not changed:
            return frame
        with ops.utc_session(frame.sparkSession):
            return frame.select(*exprs)

    def _drop_stage_quietly(self, qualified: str, stage: str) -> None:
        """Best-effort staging drop on an error path: inside an aborted
        transaction the DROP itself errors — swallow it (the exit sweep
        or ``sweep_staging`` reclaims the orphan) so the ROOT cause
        propagates instead of the follow-on."""
        try:
            self.client.execute(f"DROP TABLE IF EXISTS {qualified}")
            self._staging.discard(stage)
        except PGWireError:
            pass

    def _aux_client(self) -> PGWireClient:
        conn = self._connect
        if conn is None:  # pragma: no cover - guarded by callers
            msg = "distributed COPY path needs sock_dir=/host= parameters"
            raise ValueError(msg)
        client = PGWireClient(
            conn["sock_dir"],
            conn["port"],
            host=conn["host"],
            user=conn["user"],
            database=conn["database"],
            password=conn["password"],
            tls=conn["tls"],
            tls_ca=conn["tls_ca"],
            tls_verify_hostname=conn["tls_verify_hostname"],
        )
        client.execute(_AUX_SESSION_SETUP)
        return client

    def sweep_staging(self) -> int:
        """Drop EVERY table in the staging schema — recovery after a
        crashed driver (cf. ``SparkConnector.recover_staging``).  Call
        only while no load is in flight anywhere: staging tables are
        per-statement scratch, so outside an active ``load`` the schema
        should be empty."""
        rows = self._rows(
            "SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{_STAGING_SCHEMA}'"
        )
        for row in rows:
            self.client.execute(
                f'DROP TABLE IF EXISTS "{_STAGING_SCHEMA}"."{row["table_name"]}"'
            )
        self._staging.clear()
        return len(rows)

    def _execute_compare_query(self, query: str) -> DataFrame:
        return self._frame(self.client.query(query))

    def _serverside_fast_compare(
        self, data: DataFrame, query: str
    ) -> bool | None:
        """Checksum set-equality computed ENTIRELY inside PostgreSQL.

        The scale problem this solves (reference connector.py:326-374 at
        100 TB): ``_execute_compare_query`` decodes the full fact-sized
        reconstruction through ONE driver wire connection.  Instead, the
        loaded frame is distributed-COPY'd once more into unlogged
        staging (N executor streams — the same parallel topology as the
        write path), and one server-side aggregate computes the
        :func:`ops.fast_set_equal` analogue over both sides: per-side
        counts plus order-independent sum/xor combiners of two
        independent 64-bit hash channels (the halves of ``md5`` over
        each row's canonical record text).  Eleven numbers cross the
        wire.  Both sides hash through PostgreSQL's OWN value rendering
        (``record_out``), so every representation question — float
        shortest-round-trip, numeric scale, timestamptz — is answered by
        one engine and cancels out.

        ``True`` proves set equality under PostgreSQL's ASSIGNMENT-CAST
        semantics (the staged payload coerces into the reconstruction's
        column types before hashing) — for non-canonical text payloads
        (e.g. '01' into an int column) that is a hair wider than the
        in-Spark path's match_dtypes alignment; see the semantic note
        at the ``compare`` hook (base.py).  Mechanically: staging is
        checksummed DISTINCT (
        data is distinct by construction and executor task retries may
        duplicate partition rows; the reconstruction side streams raw,
        exactly like the in-Spark fast path).  ``False`` proves nothing
        by itself — the caller falls back to the row-pulling grouped
        compare for classification and error samples (the rare path by
        construction).  ``None`` when executors cannot dial in (bare
        ``client=`` construction).
        """
        if self._connect is None:
            return None
        cols = data.columns
        quoted = ", ".join(f'"{c}"' for c in cols)
        try:
            qualified, stage = self._stage_frame(
                data,
                cols,
                like_sql=f"SELECT {quoted} FROM ({query}) __q",
                prefix="stage_cmp",
            )
        except Exception as e:  # noqa: BLE001 - staging is best-effort here
            # Staging runs on AUX/executor connections (aux CREATE
            # SCHEMA/TABLE, executor COPY dial-in), so its failure
            # NEVER touches the driver connection or its transaction —
            # e.g. a sock_dir= deployment where executors on other
            # machines cannot reach the socket but the driver can.  The
            # fast path is an optimization, never a gate: degrade to
            # the driver-side compare, mid-transaction included (the
            # driver transaction is still valid by construction, and the
            # motivating deployment loads small dimensions entirely
            # driver-side inside a ``with`` bracket — raise-through
            # here would regress exactly that).  A half-created stage
            # is registered and reclaimed by the exit/close sweeps.
            # Contrast the CHECKSUM-query failure below, which runs on
            # the driver connection and aborts the bracket — that one
            # must raise through mid-transaction.
            logger.warning(
                "server-side checksum compare could not stage the "
                "frame (%s); falling back to the driver-side compare",
                e,
            )
            return None
        checksum = _checksum_compare_sql(qualified, quoted, query)
        try:
            (row,) = self.client.query(checksum).rows
        except PGWireError as e:
            self._drop_stage_quietly(qualified, stage)
            if self._in_transaction:
                # the failed statement aborted the transaction; nothing
                # (not even the fallback compare) can proceed — let the
                # ROOT error surface, not a drop/abort follow-on
                raise
            logger.warning(
                "server-side checksum compare unavailable (%s); "
                "falling back to the driver-side compare",
                e,
            )
            return None
        # transactional like the write path: rolls back with the
        # block, in which case the exit sweep drops the orphan
        self.client.execute(f"DROP TABLE {qualified}")
        if not self._in_transaction:
            self._staging.discard(stage)
        n_d, n_b = row[0], row[1]
        if n_b == 0:
            return False  # callers treat "no results" as a failure
        return n_d == n_b and all(
            row[i] == row[i + 1] for i in range(2, 10, 2)
        )
