"""Driver-side SQLite sink: the reference-parity compatibility connector.

Runs the full loader lifecycle against a live ``sqlite3`` database using
the standard-library driver (no JDBC jar required), so every semantic
the reference relies on executes for real rather than being emulated:

- schema introspection from the database itself via PRAGMAs
  (reference sqlite_connector.py:84-147 — table_info / foreign_key_list
  / index_list classify each column as PK, FK, or payload);
- idempotent inserts via ``INSERT OR IGNORE`` against REAL ``UNIQUE``
  constraints (reference sqlite_connector.py:10-25) — a uniqueness
  conflict keeps rows out at the database layer and surfaces as
  :class:`InsertingDataFailedError` through the shared lifecycle;
- surrogate keys from SQLite's own ``INTEGER PRIMARY KEY`` rowid
  autoincrement and read back by the key-retrieval scan (reference
  C3 semantics, sqlite_connector.py:45-61) — no engine-side key
  generation at all;
- generated compare queries executed by SQLite itself (double-quote
  identifier dialect);
- genuine transaction brackets: the ``with`` block maps to SQLite
  BEGIN/COMMIT/ROLLBACK (reference sqlite_connector.py:197-204), so a
  failed load leaves the database file bit-for-bit at its pre-block
  state.

Positioning at scale: this is the *compatibility* sink — data crosses
the driver as row batches, which is exactly how the reference works and
is appropriate for dimension-scale targets (an operational SQLite or
small warehouse).  Fact-scale loads belong on
:class:`~sql_autoloader_spark.connectors.spark_catalog.SparkConnector`,
where writes stay distributed.
"""

from __future__ import annotations

import datetime
import decimal
import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sql_autoloader_spark.connectors.base import BaseConnector
from sql_autoloader_spark.connectors.normalize import canonical_number
from sql_autoloader_spark.exceptions import (
    InvalidTableError,
    MatchDatatypesError,
)
from sql_autoloader_spark.schema import ReferenceDict, TableDict


def _affinity(declared: str | None) -> DataType:
    """SQLite type affinity (https://sqlite.org/datatype3.html §3.1) to a
    Spark type.  Values are re-coerced to the user frame's dtypes by
    ``ops.match_dtypes`` downstream, so this only needs to be a faithful
    superset of what the column can hold."""
    decl = (declared or "").upper()
    if "INT" in decl:
        return LongType()
    if any(token in decl for token in ("CHAR", "CLOB", "TEXT")):
        return StringType()
    if decl == "" or "BLOB" in decl:
        return BinaryType()
    if any(token in decl for token in ("REAL", "FLOA", "DOUB")):
        return DoubleType()
    # NUMERIC affinity (DECIMAL, DATE, BOOLEAN, ...): values may be
    # numbers, ISO strings, or converter-produced objects — surface as
    # string and let match_dtypes cast to the user frame's type.
    return StringType()


def _coerce(value: object, dtype: DataType) -> object:
    """Align a dynamically-typed SQLite value with the declared affinity
    (SQLite columns may hold any type regardless of declaration).
    Raises ``ValueError``/``TypeError`` on non-coercible values — callers
    translate that into a typed error or a string fallback."""
    if value is None:
        return None
    if isinstance(dtype, LongType):
        return int(value)
    if isinstance(dtype, DoubleType):
        return float(value)
    if isinstance(dtype, StringType):
        return value if isinstance(value, str) else str(value)
    return value


class UnstorableValueError(ValueError):
    """A payload value SQLite cannot store faithfully.

    SQLite has no NaN: binding ``float('nan')`` (or a NaN Decimal)
    silently stores NULL (sqlite.org/floatingpoint.html), so a NaN row
    would come back as a different row — the re-load filter could never
    match it and every reload would grow the table.  The sink rejects
    the value loudly BEFORE any write instead (the same contract as the
    PG wire client's lone-surrogate rejection)."""


def _bind_cell(value: object) -> object:
    """sqlite3-bindable canonical form of one payload cell (round 11 —
    found by the type-lattice fuzz): ``decimal.Decimal`` is not a
    registered sqlite3 adapter type (raises ``ProgrammingError``), so
    it binds as its :func:`canonical_number` string — NUMERIC/INTEGER
    affinity columns convert numeric text back to INTEGER/REAL exactly
    when the conversion is lossless, TEXT columns keep full precision;
    either way the readback re-canonicalizes to the same string the
    idempotency filter normed the payload to.  NaN (float or Decimal)
    is rejected typed — see :class:`UnstorableValueError`."""
    if isinstance(value, float):
        if value != value:
            msg = (
                "SQLite cannot store NaN (it silently coerces to NULL);"
                " filter NaN rows out or map them to NULL explicitly."
            )
            raise UnstorableValueError(msg)
        return value
    if isinstance(value, decimal.Decimal):
        if value.is_nan():
            msg = (
                "SQLite cannot store a NaN numeric (it silently"
                " coerces to NULL); filter NaN rows out first."
            )
            raise UnstorableValueError(msg)
        return canonical_number(value)
    return value


def _norm_cell(value: object) -> object:
    """Canonical comparable form for the idempotency pre-filter: values
    that change representation across the Spark → sqlite3 → Spark round
    trip (datetimes bound via the default adapters come back as TEXT,
    bools as 0/1, NaN breaks reflexive equality, numbers cross storage
    classes) map to the form the database would hand back, so set
    membership is meaningful.  Numbers canonicalize through
    :func:`canonical_number` so an INTEGER readback matches the REAL
    that produced it while high-precision decimals stay distinct."""
    if value is None:
        return None
    if isinstance(value, bool):
        # sqlite stores bools as INTEGER 0/1, and the readback int
        # routes through canonical_number below — the payload side must
        # land on the SAME form or a bool column defeats the
        # idempotency pre-filter and every re-load duplicates
        # constraint-less tables
        return canonical_number(int(value))
    if isinstance(value, float):
        if value != value:
            return "__nan__"
        return canonical_number(value)
    if isinstance(value, int):
        return canonical_number(value)
    if isinstance(value, decimal.Decimal):
        if value.is_nan():
            return "__nan__"
        return canonical_number(value)
    if isinstance(value, (datetime.date, datetime.datetime)):
        return str(value)
    if isinstance(value, bytearray):
        return bytes(value)
    return value


class SQLiteConnector(BaseConnector):
    """Auto-loader over a live SQLite database file (or ``:memory:``).

    Parameters
    ----------
    spark:
        Session used for the DataFrame side of the lifecycle (dedup,
        null-safe key merge, compare validation) — the database side
        runs on the stdlib ``sqlite3`` driver.
    db_path:
        Database file; defaults to in-memory.
    allow_custom_dtypes:
        Pass-through of the reference's adapter/converter opt-in
        (sqlite_connector.py:156-193): enables
        ``PARSE_DECLTYPES | PARSE_COLNAMES`` so ``sqlite3`` adapters
        registered by the user apply on reads and writes.
    """

    _quote = '"'

    def __init__(
        self,
        spark: SparkSession,
        db_path: str = ":memory:",
        *,
        allow_custom_dtypes: bool = False,
    ) -> None:
        self.spark = spark
        detect = (
            sqlite3.PARSE_DECLTYPES | sqlite3.PARSE_COLNAMES
            if allow_custom_dtypes
            else 0
        )
        self.connection = sqlite3.connect(db_path, detect_types=detect)
        self.connection.execute("PRAGMA foreign_keys = ON")
        self.schema = self.get_schema()

    # -- transactions ---------------------------------------------------------

    def __enter__(self):  # noqa: ANN204 - Self on 3.11 via base
        return self

    def __exit__(self, exc_type: object, *exception: object) -> None:
        if exc_type is None:
            self.connection.commit()
        else:
            self.connection.rollback()

    def close(self) -> None:
        self.connection.close()

    # -- DDL / metadata -------------------------------------------------------

    def execute_ddl(self, script: str) -> None:
        """Run a DDL script and re-introspect (reference C5 passthrough,
        connector.py:167-173)."""
        self.connection.executescript(script)
        self.connection.commit()
        self.update_schema()

    def fetch_schema(self) -> tuple[list[TableDict], list[ReferenceDict]]:
        cur = self.connection.cursor()
        names = [
            row[0]
            for row in cur.execute(
                "SELECT name FROM sqlite_master WHERE type = 'table' "
                "AND name NOT LIKE 'sqlite_%' ORDER BY name"
            )
        ]
        tables: list[TableDict] = []
        references: list[ReferenceDict] = []
        pk_by_table: dict[str, str] = {}
        pending: list[tuple[str, str, str, str | None]] = []

        for table in names:
            cols = cur.execute(f'PRAGMA table_info("{table}")').fetchall()
            #      (cid, name, declared_type, notnull, default, pk_position)
            pk_cols = [c[1] for c in cols if c[5]]
            if len(pk_cols) > 1:
                msg = (
                    f"table '{table}' declares a composite primary key "
                    f"{pk_cols}; only single-column keys are supported "
                    "(reference sqlite_connector.py:132)."
                )
                raise InvalidTableError(msg)
            primary_key = pk_cols[0] if pk_cols else ""
            pk_by_table[table] = primary_key

            fk_rows = cur.execute(
                f'PRAGMA foreign_key_list("{table}")'
            ).fetchall()
            #      (id, seq, target_table, from_col, to_col, ...)
            foreign_keys = []
            for fk in fk_rows:
                foreign_keys.append(fk[3])
                # to_col is None for `REFERENCES t` (implicit target PK)
                pending.append((table, fk[3], fk[2], fk[4]))

            unique_constraints: list[list[str]] = []
            for idx in cur.execute(f'PRAGMA index_list("{table}")').fetchall():
                #  (seq, index_name, is_unique, origin, partial)
                if not idx[2] or idx[3] != "u":
                    continue  # only UNIQUE-constraint indexes
                members = [
                    r[2]
                    for r in cur.execute(
                        f'PRAGMA index_info("{idx[1]}")'
                    ).fetchall()
                ]
                unique_constraints.append(members)

            tables.append(
                {
                    "name": table,
                    "columns": [
                        c[1]
                        for c in cols
                        if c[1] != primary_key and c[1] not in foreign_keys
                    ],
                    "primary_key": primary_key,
                    "foreign_keys": foreign_keys,
                    "unique_constraints": unique_constraints,
                }
            )

        for from_table, from_key, to_table, to_key in pending:
            references.append(
                {
                    "from_table": from_table,
                    "from_key": from_key,
                    "to_table": to_table,
                    "to_key": to_key or pk_by_table.get(to_table, ""),
                }
            )
        return tables, references

    # -- physical primitives --------------------------------------------------

    def _declared_types(self, table: str) -> dict[str, str]:
        return {
            row[1]: row[2]
            for row in self.connection.execute(
                f'PRAGMA table_info("{table}")'
            ).fetchall()
        }

    def _read_table(self, table: str) -> DataFrame:
        declared = self._declared_types(table)
        cur = self.connection.execute(f'SELECT * FROM "{table}"')
        cols = [d[0] for d in cur.description]
        fields = [
            StructField(c, _affinity(declared.get(c)), nullable=True)
            for c in cols
        ]
        schema = StructType(fields)
        try:
            rows = [
                tuple(
                    _coerce(v, f.dataType)
                    for v, f in zip(row, fields, strict=True)
                )
                for row in cur.fetchall()
            ]
        except (TypeError, ValueError) as e:
            # dynamically-typed SQLite column holding values its declared
            # affinity cannot represent -> typed load error, not a bare
            # ValueError mid-compare
            msg = (
                f"Reading table '{table}' failed: a value does not fit its "
                f"column's declared affinity:\n\t{e!s}"
            )
            raise MatchDatatypesError(msg) from e
        return self.spark.createDataFrame(rows, schema)

    def _write_new_rows(
        self,
        table: str,
        new_rows: DataFrame,
        columns: list[str],
        *,
        payload_bound: int | None = None,
    ) -> None:
        """Idempotent insert, two layers deep:

        1. rows already present (all inserted columns equal, NULLs
           treated as equal — Python tuple equality mirrors the
           engine's null-safe set semantics) are filtered out first, so
           re-loading identical data never grows constraint-less
           tables — the same guarantee the Spark sink's anti-join gives;
        2. the remainder goes through ``INSERT OR IGNORE`` so REAL
           ``UNIQUE`` constraints arbitrate genuine conflicts (same key,
           different payload), exactly like the reference
           (sqlite_connector.py:10-25).
        """
        quoted = ", ".join(f'"{c}"' for c in columns)
        binds = ", ".join("?" for _ in columns)
        existing = {
            tuple(_norm_cell(v) for v in row)
            for row in self.connection.execute(
                f'SELECT DISTINCT {quoted} FROM "{table}"'
            )
        }
        # bind-canonicalize AFTER filtering, and build the full list
        # BEFORE executemany: a typed rejection (NaN) must fire with
        # nothing partially written
        rows = [
            tuple(r[c] for c in columns)
            for r in new_rows.select(*columns).collect()
        ]
        normed = self._norm_payload_rows(table, columns, rows)
        payload = [
            tuple(_bind_cell(v) for v in row)
            for row, norm in zip(rows, normed, strict=True)
            if norm not in existing
        ]
        self.connection.executemany(
            f'INSERT OR IGNORE INTO "{table}" ({quoted}) VALUES ({binds})',
            payload,
        )

    def _norm_payload_rows(
        self, table: str, columns: list[str], rows: list[tuple]
    ) -> list[tuple]:
        """Idempotency-filter norm of PAYLOAD rows, affinity-aware.

        Round 12 (found by the type-lattice fuzz): a Decimal with more
        than 15 significant digits bound as text into a NUMERIC-affinity
        column is converted to REAL by SQLite — the docs' rule is
        "lossless and reversible if the first 15 significant decimal
        digits are preserved", so the conversion is *deliberately*
        lossy beyond digit 15 — while the same text in a TEXT column
        stays full-precision text.  A value-only norm can match at most
        one of those, and mismatching means every re-load grows the
        table.  Instead of replicating the engine's conversion rule
        (version-dependent, subtle), ask the engine: probe what SQLite
        physically stores for each distinct (declared type, decimal)
        pair and norm the payload cell to THAT stored form.  One probe
        per distinct pair per write — payloads on this sink are
        driver-sized by design.
        """
        declared = self._declared_types(table)
        cache: dict[tuple[str, str], object] = {}
        out = []
        for row in rows:
            normed = []
            for column, value in zip(columns, row, strict=True):
                if isinstance(value, decimal.Decimal) and not value.is_nan():
                    key = (
                        declared.get(column) or "",
                        canonical_number(value),
                    )
                    if key not in cache:
                        cache[key] = _norm_cell(self._stored_form(*key))
                    normed.append(cache[key])
                else:
                    normed.append(_norm_cell(value))
            out.append(tuple(normed))
        return out

    def _stored_form(self, declared: str, text: str) -> object:
        """What SQLite physically stores when *text* lands in a column
        declared as *declared* — asked of the engine itself via a
        throwaway temp-table round trip, so the norm tracks the exact
        affinity-conversion semantics of the linked SQLite version."""
        con = self.connection
        con.execute('DROP TABLE IF EXISTS temp."__al_probe"')
        decl = f" {declared}" if declared else ""
        con.execute(f'CREATE TEMP TABLE "__al_probe" (v{decl})')
        try:
            con.execute('INSERT INTO "__al_probe" (v) VALUES (?)', (text,))
            (stored,) = con.execute('SELECT v FROM "__al_probe"').fetchone()
        finally:
            con.execute('DROP TABLE IF EXISTS temp."__al_probe"')
        return stored

    def _execute_compare_query(self, query: str) -> DataFrame:
        cur = self.connection.execute(query)
        cols = [d[0] for d in cur.description]
        rows = [tuple(r) for r in cur.fetchall()]
        return self._frame_from_rows(rows, cols)

    def _frame_from_rows(
        self, rows: list[tuple], cols: list[str]
    ) -> DataFrame:
        """Land driver-side rows as a DataFrame; columns whose type can't
        be inferred (all-NULL, or no rows at all) fall back to string —
        ``ops.match_dtypes`` re-casts against the user frame downstream."""
        fields = []
        for i, name in enumerate(cols):
            sample = next(
                (row[i] for row in rows if row[i] is not None), None
            )
            if isinstance(sample, bool) or sample is None:
                dtype: DataType = StringType()
            elif isinstance(sample, int):
                dtype = LongType()
            elif isinstance(sample, float):
                dtype = DoubleType()
            elif isinstance(sample, (bytes, bytearray)):
                dtype = BinaryType()
            else:
                dtype = StringType()
            fields.append(StructField(name, dtype, nullable=True))
        # heterogeneous columns (SQLite enforces no affinity) fall back
        # to string rather than raising int('abc') mid-compare
        for i, f in enumerate(fields):
            if isinstance(f.dataType, (LongType, DoubleType)):
                try:
                    for row in rows:
                        _coerce(row[i], f.dataType)
                except (TypeError, ValueError):
                    fields[i] = StructField(f.name, StringType(), True)
        coerced = [
            tuple(
                _coerce(v, f.dataType)
                for v, f in zip(row, fields, strict=True)
            )
            for row in rows
        ]
        return self.spark.createDataFrame(coerced, StructType(fields))
