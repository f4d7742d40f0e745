"""Minimal pure-Python PostgreSQL client + embedded server harness.

Why this exists: the reference ships a first-class Postgres connector
(reference postgres/postgres_connector.py:160-254, psycopg-backed), but
this container has neither ``psycopg`` nor a Postgres JDBC jar — only
the server binaries themselves (``initdb``/``pg_ctl``/``postgres``).
The frontend/backend wire protocol v3 is a public, stable format
(https://www.postgresql.org/docs/current/protocol.html), and the subset
the loader lifecycle needs — startup with trust auth, the simple query
protocol, text-format results — is small, so we speak it directly over
a unix socket with the standard library.  That turns the Postgres path
from "dialect SQL golden-pinned against DuckDB's information_schema"
into *live execution against a real PostgreSQL server*.

Scope and deliberate non-goals:

- **Simple query protocol plus COPY-in** ('Q' messages; the COPY
  FROM STDIN subprotocol for bulk loads).  Parameters are
  rendered as SQL literals by :func:`pg_literal` (the server reports
  ``standard_conforming_strings=on``, asserted at connect time, so
  quoting is the single ``'' `` escape plus hex ``bytea``).  The
  extended protocol (Parse/Bind/Execute) buys nothing here: small
  payloads go as multi-row ``VALUES`` lists, bulk payloads through
  ``COPY`` — the fastest ingest path PostgreSQL offers and the one
  every executor of a distributed write uses concurrently.
- **Trust auth over a private unix socket (or loopback TCP) by
  default, plus SCRAM-SHA-256 and md5 password auth.**  The embedded
  server defaults to no TCP listener (``listen_addresses=''``) with an
  owner-private socket directory, the correct posture for an ephemeral
  test/CI database; ``tcp=True`` adds a loopback listener so the
  host/port connection path Spark executors use on a real cluster is
  exercised too, and ``auth="scram-sha-256", password=...`` runs the
  server the way production deployments run (PostgreSQL's default auth
  since v14).  The client implements the SCRAM-SHA-256 exchange (RFC
  7677, incl. server-signature verification) and md5 in pure stdlib,
  plus TLS via the SSLRequest/STARTTLS handshake (``tls=True`` =
  sslmode=require, ``tls_ca=`` = verify-ca; ``ssl=True`` runs the
  embedded server with a generated self-signed cert).  Channel-bound
  SCRAM-…-PLUS stays out of scope — plain SCRAM works over TLS.
- **Text result format.**  Values decode by type OID into the Python
  types ``spark.createDataFrame`` expects; OIDs this module does not
  know stay strings and are re-cast downstream by ``ops.match_dtypes``
  exactly like the SQLite connector's affinity fallback.
"""

from __future__ import annotations

import base64
import datetime
import decimal
import hashlib
import hmac
import os
import pwd
import re
import shutil
import socket
import stringprep
import struct
import subprocess
import tempfile
import time
import unicodedata
from dataclasses import dataclass, field

__all__ = [
    "EmbeddedPostgres",
    "PGWireClient",
    "PGWireError",
    "ResultSet",
    "UnstorableTextError",
    "copy_text_parse",
    "copy_text_row",
    "pg_literal",
]


class UnstorableTextError(ValueError):
    """A Python ``str`` contains a lone UTF-16 surrogate
    (U+D800–U+DFFF), which has NO UTF-8 encoding — PostgreSQL cannot
    store such a value in text at all, in any client.  The codec
    rejects it eagerly with value context instead of letting the
    ``.encode()`` die mid-COPY on an executor with staging already
    created and an opaque ``UnicodeEncodeError``.  Callers that know
    the column layout (the COPY writer, the VALUES renderer) re-raise
    with the column name attached.  Callers who want the value anyway
    must scrub it first (e.g. ``errors='replace'`` re-decode) — a
    silent pass-through cannot exist, so the contract is loud.

    Attributes: ``cell_index`` (position in the offending row, or None
    when raised for a scalar) and ``value`` (the offending string).
    """

    def __init__(
        self,
        message: str,
        *,
        cell_index: int | None = None,
        value: str | None = None,
    ) -> None:
        super().__init__(message)
        self.cell_index = cell_index
        self.value = value


def _surrogate_error(
    values: tuple, exc: UnicodeEncodeError
) -> UnstorableTextError:
    """Locate which cell of *values* carries the lone surrogate and
    build the descriptive rejection."""
    for i, v in enumerate(values):
        if isinstance(v, str):
            try:
                v.encode()
            except UnicodeEncodeError:
                snippet = v.encode("utf-8", "backslashreplace")[:80]
                return UnstorableTextError(
                    f"cell {i} contains a lone UTF-16 surrogate "
                    f"(U+{ord(exc.object[exc.start]):04X}): "
                    f"{snippet!r} — PostgreSQL cannot store lone "
                    "surrogates in UTF-8 text; scrub or drop the value "
                    "before loading",
                    cell_index=i,
                    value=v,
                )
    # unreachable for well-formed input, but never mask the original
    return UnstorableTextError(str(exc))


class PGWireError(Exception):
    """An ErrorResponse from the backend, raised after the protocol has
    drained to ReadyForQuery (the connection stays usable)."""

    def __init__(self, fields: dict[str, str]) -> None:
        self.fields = fields
        self.sqlstate = fields.get("C", "")
        super().__init__(
            f"{fields.get('S', 'ERROR')} {self.sqlstate}: "
            f"{fields.get('M', '(no message)')}"
        )


@dataclass
class ResultSet:
    """One SELECT-shaped result: column names, type OIDs, atttypmods,
    and rows decoded to Python values."""

    columns: list[str] = field(default_factory=list)
    oids: list[int] = field(default_factory=list)
    typmods: list[int] = field(default_factory=list)
    rows: list[tuple] = field(default_factory=list)


_TZ_SHORT_OFFSET = re.compile(r"([+-]\d{2})$")


def _decode_timestamptz(text: str) -> datetime.datetime:
    # PG emits ISO with a possibly-short offset ('+00'); pad for older
    # fromisoformat implementations.
    return datetime.datetime.fromisoformat(_TZ_SHORT_OFFSET.sub(r"\1:00", text))


#: OID -> text-format decoder.  Public OID assignments from
#: pg_catalog.pg_type (stable since PG 7.x).
_DECODERS = {
    16: lambda s: s == "t",  # bool
    17: lambda s: bytes.fromhex(s[2:]),  # bytea, '\x...' hex output
    20: int,  # int8
    21: int,  # int2
    23: int,  # int4
    26: int,  # oid
    700: float,  # float4
    701: float,  # float8
    1082: datetime.date.fromisoformat,  # date
    1114: datetime.datetime.fromisoformat,  # timestamp
    1184: _decode_timestamptz,  # timestamptz
    1700: decimal.Decimal,  # numeric
}


def decode_value(text: str | None, oid: int):  # noqa: ANN201 - dynamic
    """Decode one text-format column value by type OID; unknown OIDs
    (uuid, json, enums, ...) stay strings for downstream re-casting."""
    if text is None:
        return None
    decoder = _DECODERS.get(oid)
    return decoder(text) if decoder else text


def pg_literal(value: object) -> str:
    """Render a Python value as a PostgreSQL SQL literal.

    Requires ``standard_conforming_strings=on`` (the server default
    since 9.1; asserted at connect) so a backslash inside a string is
    literal and the only escape is doubling single quotes.
    """
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        if value != value:
            return "'NaN'::float8"
        if value == float("inf"):
            return "'Infinity'::float8"
        if value == float("-inf"):
            return "'-Infinity'::float8"
        return repr(value)
    if isinstance(value, decimal.Decimal):
        return f"'{value}'::numeric"
    if isinstance(value, (bytes, bytearray)):
        return f"'\\x{bytes(value).hex()}'::bytea"
    if isinstance(value, datetime.datetime):
        if value.tzinfo is not None:
            return f"'{value.isoformat(sep=' ')}'::timestamptz"
        return f"'{value.isoformat(sep=' ')}'::timestamp"
    if isinstance(value, datetime.date):
        return f"'{value.isoformat()}'::date"
    if isinstance(value, str):
        try:  # reject here, not in the statement's wire encode
            value.encode()
        except UnicodeEncodeError as exc:
            snippet = value.encode("utf-8", "backslashreplace")[:80]
            raise UnstorableTextError(
                "string literal contains a lone UTF-16 surrogate "
                f"(U+{ord(exc.object[exc.start]):04X}): {snippet!r} — "
                "PostgreSQL cannot store lone surrogates in UTF-8 "
                "text; scrub or drop the value before loading",
                value=value,
            ) from None
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    msg = f"no SQL literal rendering for {type(value).__name__}"
    raise TypeError(msg)


_COPY_ESCAPES = str.maketrans(
    {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}
)


def _copy_text_cell(value: object) -> str:
    """Render one value in COPY text format (NULL is handled by the
    caller).  The server casts each cell to the target column's type,
    so the rendering only has to be an unambiguous text form."""
    if isinstance(value, bool):
        return "t" if value else "f"
    if isinstance(value, float):
        if value != value:
            return "NaN"
        if value == float("inf"):
            return "Infinity"
        if value == float("-inf"):
            return "-Infinity"
        return repr(value)
    if isinstance(value, (bytes, bytearray)):
        # bytea hex input is '\x…'; the backslash itself must be
        # escaped in COPY text format
        return "\\\\x" + bytes(value).hex()
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, (datetime.date, decimal.Decimal, int)):
        return str(value)
    if isinstance(value, str):
        return value.translate(_COPY_ESCAPES)
    msg = f"no COPY text rendering for {type(value).__name__}"
    raise TypeError(msg)


def copy_text_row(values: tuple) -> bytes:
    r"""One COPY text-format line: tab-separated cells, ``\N`` for
    NULL, newline-terminated.  UTF-8 encoded, ready for CopyData.

    Raises :class:`UnstorableTextError` when a cell carries a lone
    UTF-16 surrogate (hot path pays nothing: the check is the encode
    itself, and the cell hunt runs only on the failure path).
    """
    line = (
        "\t".join(
            "\\N" if v is None else _copy_text_cell(v) for v in values
        )
        + "\n"
    )
    try:
        return line.encode()
    except UnicodeEncodeError as exc:
        raise _surrogate_error(values, exc) from None


#: COPY text-format output escapes (what the server EMITS; octal/hex
#: forms are accepted on input only and never produced)
_COPY_UNESCAPE_MAP = {
    "\\": "\\",
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "v": "\v",
}


def _copy_unescape(text: str) -> str:
    out: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "\\" and i + 1 < n:
            nxt = text[i + 1]
            out.append(_COPY_UNESCAPE_MAP.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def copy_text_parse(line: bytes, oids: list[int]) -> tuple:
    r"""Decode one ``COPY ... TO STDOUT`` text-format line (as yielded
    by :meth:`PGWireClient.copy_out`, newline already stripped) into
    Python values by column OID — the read twin of
    :func:`copy_text_row`.  A raw tab always separates cells (data tabs
    arrive escaped as ``\t``); ``\N`` is NULL; ``timestamptz`` decodes
    AWARE so re-entry into Spark is timezone-proof."""
    cells = line.split(b"\t")
    out = []
    for cell, oid in zip(cells, oids, strict=True):
        if cell == b"\\N":
            out.append(None)
            continue
        text = cell.decode()
        if "\\" in text:
            text = _copy_unescape(text)
        out.append(decode_value(text, oid))
    return tuple(out)


#: RFC 4013 prohibited-output tables (C.1.2 cannot survive the space
#: mapping but is listed for fidelity to the RFC's §2.3 enumeration)
_SASLPREP_PROHIBITED = (
    stringprep.in_table_c12,
    stringprep.in_table_c21,
    stringprep.in_table_c22,
    stringprep.in_table_c3,
    stringprep.in_table_c4,
    stringprep.in_table_c5,
    stringprep.in_table_c6,
    stringprep.in_table_c7,
    stringprep.in_table_c8,
    stringprep.in_table_c9,
    stringprep.in_table_a1,  # unassigned: prohibited in stored strings
)


def _saslprep(s: str) -> str:
    """RFC 4013 SASLprep of a SCRAM password (RFC 5802 §5.1).

    Mapping (B.1 to nothing, C.1.2 to SPACE), NFKC normalization,
    prohibited-output rejection, and the RFC 3454 §6 bidi checks.
    ASCII printable passwords — the overwhelmingly common case — pass
    through unchanged on a fast path."""
    if s.isascii() and all(" " <= c <= "~" for c in s):
        return s
    mapped = "".join(
        " " if stringprep.in_table_c12(c) else c
        for c in s
        if not stringprep.in_table_b1(c)
    )
    out = unicodedata.normalize("NFKC", mapped)
    for c in out:
        if any(table(c) for table in _SASLPREP_PROHIBITED):
            msg = (
                f"SASLprep-prohibited character U+{ord(c):04X} in the "
                "password"
            )
            raise ValueError(msg)
    if any(stringprep.in_table_d1(c) for c in out):
        if any(stringprep.in_table_d2(c) for c in out):
            msg = "SASLprep: password mixes RTL and LTR characters"
            raise ValueError(msg)
        if not (
            stringprep.in_table_d1(out[0])
            and stringprep.in_table_d1(out[-1])
        ):
            msg = (
                "SASLprep: RTL password must start and end with RTL "
                "characters"
            )
            raise ValueError(msg)
    return out


class PGWireClient:
    """One connection speaking protocol v3 over a unix socket or TCP.

    With ``sock_dir`` the connection goes over the unix socket
    ``<sock_dir>/.s.PGSQL.<port>`` (the driver-side default for the
    embedded server); with ``host`` it goes over TCP — the path Spark
    executors use to reach a warehouse from other machines.

    Authentication: trust (AuthenticationOk), ``md5``, and
    ``SCRAM-SHA-256`` (RFC 7677, PostgreSQL's default since v14) — the
    last two need ``password=``.  SCRAM runs without channel binding
    (``n,,``), which PostgreSQL accepts on non-SSL connections; the
    ``SCRAM-SHA-256-PLUS`` variant requires TLS and is out of scope
    like TLS itself.
    """

    def __init__(
        self,
        sock_dir: str | None = None,
        port: int = 5432,
        *,
        host: str | None = None,
        user: str = "postgres",
        database: str = "postgres",
        password: str | None = None,
        tls: bool = False,
        tls_ca: str | None = None,
        tls_verify_hostname: bool = False,
    ) -> None:
        self.user = user
        self.database = database
        self.password = password
        self.parameters: dict[str, str] = {}
        #: command tag of the most recent CommandComplete ('COMMIT',
        #: 'ROLLBACK', 'SELECT 5', ...).  PostgreSQL reports an implicit
        #: rollback of an aborted transaction ONLY through this tag (a
        #: COMMIT sent to an aborted transaction succeeds protocol-wise
        #: but completes as 'ROLLBACK') — callers that must know commit
        #: durability check it.
        self.last_tag: str | None = None
        #: running count of DataRow messages decoded on this connection —
        #: a diagnostic for scale assertions ("the happy-path validate
        #: moved O(1) rows over the driver wire").
        self.data_rows: int = 0
        if tls_verify_hostname and tls_ca is None:
            msg = "tls_verify_hostname= requires tls_ca= (verify-full)"
            raise ValueError(msg)
        if host is not None:
            self._sock = socket.create_connection((host, port))
            if tls or tls_ca is not None:
                self._sock = self._tls_wrap(
                    self._sock, host, tls_ca, tls_verify_hostname
                )
        else:
            if sock_dir is None:
                msg = "pass either sock_dir= (unix socket) or host= (TCP)"
                raise ValueError(msg)
            if tls or tls_ca is not None:
                msg = "tls= applies to TCP (host=) connections only"
                raise ValueError(msg)
            self.sock_path = os.path.join(sock_dir, f".s.PGSQL.{port}")
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(self.sock_path)
        self._rfile = self._sock.makefile("rb")
        self._startup()

    @staticmethod
    def _tls_wrap(  # noqa: ANN205
        sock,  # noqa: ANN001
        host: str,
        tls_ca: str | None,
        verify_hostname: bool = False,
    ):
        """SSLRequest handshake + TLS wrap (the protocol's STARTTLS).

        Without ``tls_ca`` the session is encrypted but the certificate
        is NOT verified — libpq's ``sslmode=require`` semantics, the
        posture for self-signed warehouse certs.  With ``tls_ca`` the
        server certificate must chain to it (``sslmode=verify-ca``);
        add ``verify_hostname`` and the certificate's SAN/CN must also
        match *host* (``sslmode=verify-full``, the posture that defeats
        an on-path attacker holding ANY cert the CA signed)."""
        import ssl

        sock.sendall(struct.pack("!ii", 8, 80877103))  # SSLRequest
        answer = sock.recv(1)
        if answer != b"S":
            msg = f"server refused TLS (answered {answer!r}); ssl=on needed"
            raise ConnectionError(msg)
        context = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        if tls_ca is not None:
            context.load_verify_locations(tls_ca)
            context.check_hostname = verify_hostname
        else:
            context.check_hostname = False
            context.verify_mode = ssl.CERT_NONE
        return context.wrap_socket(sock, server_hostname=host)

    # -- protocol plumbing --------------------------------------------------

    def _send(self, type_byte: bytes, payload: bytes) -> None:
        self._sock.sendall(
            type_byte + struct.pack("!i", len(payload) + 4) + payload
        )

    def _read_message(self) -> tuple[bytes, bytes]:
        head = self._rfile.read(5)
        if len(head) < 5:
            msg = "server closed the connection"
            raise ConnectionError(msg)
        (length,) = struct.unpack("!i", head[1:5])
        payload = self._rfile.read(length - 4)
        return head[:1], payload

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        offset = 0
        while offset < len(payload) and payload[offset : offset + 1] != b"\0":
            code = payload[offset : offset + 1].decode()
            end = payload.index(b"\0", offset + 1)
            fields[code] = payload[offset + 1 : end].decode("utf-8", "replace")
            offset = end + 1
        return fields

    def _startup(self) -> None:
        body = struct.pack("!i", 196608)  # protocol 3.0
        for key, val in (("user", self.user), ("database", self.database)):
            body += key.encode() + b"\0" + val.encode() + b"\0"
        body += b"\0"
        self._sock.sendall(struct.pack("!i", len(body) + 4) + body)
        while True:
            mtype, payload = self._read_message()
            if mtype == b"R":
                self._authenticate(payload)
            elif mtype == b"S":
                key, val, _ = payload.split(b"\0", 2)
                self.parameters[key.decode()] = val.decode()
            elif mtype == b"E":
                raise PGWireError(self._error_fields(payload))
            elif mtype == b"Z":
                break
            # 'K' BackendKeyData and notices are irrelevant here
        if self.parameters.get("standard_conforming_strings") != "on":
            msg = "server must run with standard_conforming_strings=on"
            raise ConnectionError(msg)

    # -- authentication -------------------------------------------------------

    def _authenticate(self, payload: bytes) -> None:
        """Handle one AuthenticationRequest ('R') message."""
        (auth,) = struct.unpack("!i", payload[:4])
        if auth == 0:  # AuthenticationOk
            return
        if auth == 3:  # AuthenticationCleartextPassword
            self._send(b"p", self._require_password().encode() + b"\0")
            return
        if auth == 5:  # AuthenticationMD5Password
            salt = payload[4:8]
            inner = hashlib.md5(  # noqa: S324 - the protocol's algorithm
                self._require_password().encode() + self.user.encode()
            ).hexdigest()
            outer = hashlib.md5(  # noqa: S324
                inner.encode() + salt
            ).hexdigest()
            self._send(b"p", b"md5" + outer.encode() + b"\0")
            return
        if auth == 10:  # AuthenticationSASL: mechanism list follows
            mechanisms = payload[4:].split(b"\0")
            if b"SCRAM-SHA-256" not in mechanisms:
                msg = f"no supported SASL mechanism in {mechanisms!r}"
                raise ConnectionError(msg)
            self._scram_sha_256()
            return
        msg = (
            f"server requested auth method {auth}; supported: trust, "
            "md5, SCRAM-SHA-256 (pass password= for the latter two)"
        )
        raise ConnectionError(msg)

    def _require_password(self) -> str:
        if self.password is None:
            msg = "server requires a password; pass password="
            raise ConnectionError(msg)
        return self.password

    def _scram_sha_256(self) -> None:
        """SCRAM-SHA-256 client (RFC 5802/7677), no channel binding.
        The password is SASLprep'd (RFC 5802 §5.1 mandates RFC 4013) so
        non-ASCII passwords agree with spec-compliant servers; when the
        password cannot be prepped, fall back to the RAW password —
        exactly what PostgreSQL's own pg_saslprep and libpq do on prep
        failure, so a password the server accepted at ALTER ROLE time
        (e.g. containing an emoji, which Python's Unicode-3.2
        stringprep tables class as unassigned) still authenticates.

        Known table-skew corner: a post-3.2 codepoint WITH an NFKC
        mapping (e.g. U+1F100 → '0.') that a NEWER server preps
        successfully authenticates there via the mapped form, while
        this client's tables call it unassigned and send the raw form
        — the server then reports a plain auth failure.  Rotate such a
        password to prepped-or-ASCII form; the failure mode is
        identical to libpq built against older Unicode tables."""
        raw = self._require_password()
        try:
            password = _saslprep(raw).encode()
        except ValueError:
            try:
                password = raw.encode()
            except UnicodeEncodeError as exc:
                msg = (
                    "password contains a lone UTF-16 surrogate — it "
                    "has no UTF-8 form, so no PostgreSQL server could "
                    "hold a matching SCRAM secret"
                )
                raise ConnectionError(msg) from exc
        nonce = base64.b64encode(os.urandom(18)).decode()
        # RFC 5802 saslname escaping; length fields count BYTES
        user = self.user.replace("=", "=3D").replace(",", "=2C")
        client_first_bare = f"n={user},r={nonce}"
        first_bytes = client_first_bare.encode()
        initial = (
            b"SCRAM-SHA-256\0"
            + struct.pack("!i", len(first_bytes) + 3)
            + b"n,,"
            + first_bytes
        )
        self._send(b"p", initial)  # SASLInitialResponse

        mtype, payload = self._read_message()
        if mtype == b"E":
            raise PGWireError(self._error_fields(payload))
        (code,) = struct.unpack("!i", payload[:4])
        if mtype != b"R" or code != 11:  # AuthenticationSASLContinue
            msg = f"expected SASLContinue, got {mtype!r}/{code}"
            raise ConnectionError(msg)
        server_first = payload[4:].decode()
        fields = dict(f.split("=", 1) for f in server_first.split(","))
        full_nonce, salt, iters = (
            fields["r"],
            base64.b64decode(fields["s"]),
            int(fields["i"]),
        )
        if not full_nonce.startswith(nonce):
            msg = "server nonce does not extend the client nonce"
            raise ConnectionError(msg)

        salted = hashlib.pbkdf2_hmac("sha256", password, salt, iters)
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        # 'biws' = b64('n,,'), the gs2 header echoed in the final message
        client_final_bare = f"c=biws,r={full_nonce}"
        auth_message = ",".join(
            (client_first_bare, server_first, client_final_bare)
        ).encode()
        signature = hmac.new(stored_key, auth_message, hashlib.sha256).digest()
        proof = bytes(k ^ s for k, s in zip(client_key, signature))
        self._send(
            b"p",
            (
                f"{client_final_bare},p="
                f"{base64.b64encode(proof).decode()}"
            ).encode(),
        )

        mtype, payload = self._read_message()
        if mtype == b"E":
            raise PGWireError(self._error_fields(payload))
        (code,) = struct.unpack("!i", payload[:4])
        if mtype != b"R" or code != 12:  # AuthenticationSASLFinal
            msg = f"expected SASLFinal, got {mtype!r}/{code}"
            raise ConnectionError(msg)
        # verify the SERVER too (mutual auth): v= must be
        # HMAC(ServerKey, AuthMessage)
        server_final = dict(
            f.split("=", 1) for f in payload[4:].decode().split(",")
        )
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        expected = hmac.new(server_key, auth_message, hashlib.sha256).digest()
        if base64.b64decode(server_final.get("v", "")) != expected:
            msg = "server signature verification failed (not the real server?)"
            raise ConnectionError(msg)

    # -- public API ---------------------------------------------------------

    def query(self, sql: str) -> ResultSet | None:
        """Run *sql* (possibly multi-statement) via the simple query
        protocol; returns the LAST result set, or None if no statement
        returned rows.  Raises :class:`PGWireError` on the first server
        error (after draining to ReadyForQuery)."""
        self._send(b"Q", sql.encode() + b"\0")
        current: ResultSet | None = None
        last: ResultSet | None = None
        error: dict[str, str] | None = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"T":
                current = ResultSet()
                (nfields,) = struct.unpack("!h", payload[:2])
                offset = 2
                for _ in range(nfields):
                    end = payload.index(b"\0", offset)
                    current.columns.append(payload[offset:end].decode())
                    offset = end + 1
                    _, _, oid, _, typmod, _ = struct.unpack(
                        "!ihihih", payload[offset : offset + 18]
                    )
                    offset += 18
                    current.oids.append(oid)
                    current.typmods.append(typmod)
            elif mtype == b"D" and current is not None:
                self.data_rows += 1
                (ncols,) = struct.unpack("!h", payload[:2])
                offset = 2
                row = []
                for i in range(ncols):
                    (ln,) = struct.unpack("!i", payload[offset : offset + 4])
                    offset += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(
                            decode_value(
                                payload[offset : offset + ln].decode(),
                                current.oids[i],
                            )
                        )
                        offset += ln
                current.rows.append(tuple(row))
            elif mtype == b"C":
                self.last_tag = payload.rstrip(b"\0").decode()
                if current is not None:
                    last, current = current, None
            elif mtype == b"E" and error is None:
                error = self._error_fields(payload)
            elif mtype == b"Z":
                break
            # 'C' without rows, 'N' notices, 'I' empty query: skip
        if error is not None:
            raise PGWireError(error)
        return last

    def execute(self, sql: str) -> None:
        """:meth:`query` for statements whose rows are irrelevant."""
        self.query(sql)

    def copy_in(self, sql: str, chunks) -> int:  # noqa: ANN001 - iterable of bytes
        """Bulk-load via the COPY FROM STDIN subprotocol.

        *sql* is a ``COPY table (cols) FROM STDIN`` statement; *chunks*
        yields byte buffers of COPY text-format lines (see
        :func:`copy_text_row`).  Returns the server-reported row count.

        After the server errors mid-stream it discards further CopyData
        without replying, so streaming the remainder cannot deadlock;
        the error surfaces once the stream finishes and the protocol
        drains to ReadyForQuery.
        """
        self._send(b"Q", sql.encode() + b"\0")
        error: dict[str, str] | None = None
        # wait for CopyInResponse (or an immediate error, e.g. bad table)
        in_copy = False
        while True:
            mtype, payload = self._read_message()
            if mtype == b"G":
                in_copy = True
                break
            if mtype == b"E":
                error = self._error_fields(payload)
            elif mtype == b"Z":
                break
        rows = 0
        if in_copy:
            try:
                for chunk in chunks:
                    if chunk:
                        self._send(b"d", chunk)
            except BaseException:
                # the PRODUCER failed mid-stream (e.g. an unrenderable
                # Python value): abort the COPY with CopyFail and drain
                # to ReadyForQuery so the connection stays usable for a
                # long-lived caller, then surface the producer's error
                self._send(b"f", b"client aborted: chunk producer raised\0")
                while True:
                    mtype, _ = self._read_message()
                    if mtype == b"Z":
                        break
                raise
            self._send(b"c", b"")  # CopyDone
            while True:
                mtype, payload = self._read_message()
                if mtype == b"C":
                    tag = payload.rstrip(b"\0").decode()
                    self.last_tag = tag
                    if tag.startswith("COPY "):
                        rows = int(tag.split()[1])
                elif mtype == b"E" and error is None:
                    error = self._error_fields(payload)
                elif mtype == b"Z":
                    break
        if error is not None:
            raise PGWireError(error)
        return rows

    def copy_out(self, sql: str):  # noqa: ANN201 - generator of bytes
        """Stream a ``COPY ... TO STDOUT`` — yields one COPY text-format
        line (newline-stripped bytes) per table row.

        The generator MUST be consumed to exhaustion: protocol state
        (CopyOut → CommandComplete → ReadyForQuery) only drains as it is
        iterated, so abandoning it mid-stream leaves the connection
        wedged.  The intended consumers — executor-side partition
        readers — always drain their range and close the socket in a
        ``finally``.  A server error surfaces as :class:`PGWireError`
        after the drain, like :meth:`query`.
        """
        self._send(b"Q", sql.encode() + b"\0")
        error: dict[str, str] | None = None
        in_copy = False
        while True:
            mtype, payload = self._read_message()
            if mtype == b"H":
                in_copy = True
                break
            if mtype == b"E":
                error = self._error_fields(payload)
            elif mtype == b"Z":
                break
        if in_copy:
            # CopyData message boundaries are NOT meaningful in the
            # protocol — buffer and split on newlines (a data newline is
            # always escaped as '\\n' in COPY text format)
            buffer = bytearray()
            while True:
                mtype, payload = self._read_message()
                if mtype == b"d":
                    buffer += payload
                    if b"\n" in payload:
                        lines = bytes(buffer).split(b"\n")
                        buffer = bytearray(lines.pop())
                        for line in lines:
                            self.data_rows += 1
                            yield line
                elif mtype == b"C":
                    self.last_tag = payload.rstrip(b"\0").decode()
                elif mtype == b"E" and error is None:
                    error = self._error_fields(payload)
                elif mtype == b"Z":
                    break
                # 'c' CopyDone carries nothing
        if error is not None:
            raise PGWireError(error)

    def close(self) -> None:
        try:
            self._send(b"X", b"")  # Terminate
        except OSError:
            pass
        self._rfile.close()
        self._sock.close()


def _pg_binaries() -> dict[str, str | None]:
    return {name: shutil.which(name) for name in ("initdb", "pg_ctl")}


class EmbeddedPostgres:
    """Lifecycle manager for a throwaway single-purpose PostgreSQL
    server: ``initdb`` into a temp dir, unix-socket-only listen, trust
    auth, durability off (fsync/synchronous_commit — it is a test
    database).  When the current process is root (PostgreSQL refuses to
    run as root) every server command is re-executed as the ``postgres``
    system user via ``runuser`` and the directories are chown'd over.
    """

    @staticmethod
    def free_port() -> int:
        """An OS-assigned free TCP port (bind 0, read, release).

        Default when no ``port=`` is given: a FIXED port collides with
        leaked servers from killed runs or a parallel test/bench session
        on the same host and fails the handshake rather than the code
        under test (round-10 advice; two suites had even pinned the
        same number).  A tiny claim race remains between release and
        the server's own bind; ``start()`` recovers by detecting the
        bind failure and retrying with a fresh port (auto-assigned
        ports only — a caller-pinned port still fails loudly).  For
        unix-socket-only servers the number merely names the socket
        file inside a per-instance temp dir, so any value is
        collision-free."""
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    def __init__(
        self,
        base_dir: str | None = None,
        *,
        port: int | None = None,
        tcp: bool = False,
        auth: str = "trust",
        password: str | None = None,
        ssl: bool = False,
    ) -> None:
        if auth != "trust" and password is None:
            msg = f"auth={auth!r} needs a password="
            raise ValueError(msg)
        if ssl and not tcp:
            msg = "ssl=True needs tcp=True (TLS is a TCP-listener feature)"
            raise ValueError(msg)
        self.auth = auth
        self.password = password
        self.ssl = ssl
        self.base_dir = base_dir or tempfile.mkdtemp(prefix="pgemb-")
        self.data_dir = os.path.join(self.base_dir, "data")
        self.sock_dir = os.path.join(self.base_dir, "sock")
        self.log_path = os.path.join(self.base_dir, "server.log")
        #: auto-assigned ports may be re-claimed between release and the
        #: postmaster's own bind (the documented TOCTOU); start()
        #: detects the bind failure and retries with a fresh port —
        #: only for auto-assigned ports, never one the caller pinned
        self._auto_port = port is None
        self.port = port if port is not None else self.free_port()
        #: loopback TCP listener (initdb -A trust covers 127.0.0.1/32 in
        #: pg_hba.conf) — exercises the host/port path cluster executors use
        self.host: str | None = "127.0.0.1" if tcp else None
        self.run_as: str | None = None
        if os.geteuid() == 0:
            self.run_as = "postgres"
        self._started = False

    @staticmethod
    def available() -> bool:
        """True when the server binaries (and, for root, the runuser
        escape hatch + postgres system user) are present."""
        binaries = _pg_binaries()
        if not all(binaries.values()):
            return False
        if os.geteuid() == 0:
            if shutil.which("runuser") is None:
                return False
            try:
                pwd.getpwnam("postgres")
            except KeyError:
                return False
        return True

    def _run(self, args: list[str]) -> subprocess.CompletedProcess:
        if self.run_as:
            args = ["runuser", "-u", self.run_as, "--", *args]
        return subprocess.run(  # noqa: S603 - fixed binaries, no shell
            args,
            cwd=self.base_dir,
            capture_output=True,
            text=True,
            check=False,
            timeout=60,
        )

    def _chown_tree(self) -> None:
        if not self.run_as:
            return
        uid = pwd.getpwnam(self.run_as).pw_uid
        for root, dirs, files in os.walk(self.base_dir):
            os.chown(root, uid, -1)
            for name in dirs + files:
                os.chown(os.path.join(root, name), uid, -1)

    def start(self) -> "EmbeddedPostgres":
        os.makedirs(self.sock_dir, exist_ok=True)
        # trust auth means the socket directory IS the access control:
        # keep the tree private to its owner (the postgres run-as user
        # when root; the current user otherwise).  A root-owned client
        # process bypasses the mode bits, so the driver still connects.
        # NOTE tcp=True adds a loopback listener that mode bits cannot
        # protect — anything reaching 127.0.0.1 connects as superuser;
        # only use it for throwaway test/CI databases.
        os.chmod(self.base_dir, 0o700)
        needs_init = not os.path.exists(
            os.path.join(self.data_dir, "PG_VERSION")
        )
        if needs_init:
            os.makedirs(self.data_dir, exist_ok=True)
        self._chown_tree()
        if needs_init:
            args = [
                "initdb",
                "-D",
                self.data_dir,
                "-U",
                "postgres",
                "-A",
                self.auth,
                "--no-sync",
                "-E",
                "UTF8",
            ]
            pwfile = None
            if self.password is not None:
                pwfile = os.path.join(self.base_dir, ".pgpass_init")
                with open(pwfile, "w") as fh:
                    fh.write(self.password + "\n")
                os.chmod(pwfile, 0o600)
                self._chown_tree()
                args += ["--pwfile", pwfile]
            proc = self._run(args)
            if pwfile is not None:
                os.unlink(pwfile)
            if proc.returncode != 0:
                msg = f"initdb failed:\n{proc.stdout}\n{proc.stderr}"
                raise RuntimeError(msg)
        # up to 3 fresh ports when the bind loses the free_port() TOCTOU
        # race (another process claimed the number between release and
        # the postmaster's own bind) — retry only on bind failures of
        # AUTO-assigned ports, never a port the caller pinned
        for attempt in range(3):
            # the server log accumulates across attempts (and prior
            # start/stop cycles): classify each failure by THIS
            # attempt's output only, or a stale 'could not bind' line
            # would misread a later unrelated failure as a lost race
            log_offset = (
                os.path.getsize(self.log_path)
                if os.path.exists(self.log_path)
                else 0
            )
            options = (
                f"-c listen_addresses='{self.host or ''}' "
                f"-c unix_socket_directories={self.sock_dir} "
                f"-c port={self.port} "
                "-c fsync=off -c synchronous_commit=off "
                "-c full_page_writes=off"
            )
            if self.ssl:
                options += self._ssl_options()
            proc = self._run(
                [
                    "pg_ctl",
                    "-D",
                    self.data_dir,
                    "-l",
                    self.log_path,
                    "-o",
                    options,
                    "-w",
                    "start",
                ]
            )
            if proc.returncode == 0:
                break
            log_tail = ""
            if os.path.exists(self.log_path):
                with open(self.log_path) as fh:
                    fh.seek(log_offset)
                    log_tail = "".join(fh.readlines()[-20:])
            bind_lost = (
                "could not bind" in log_tail
                or "Address already in use" in log_tail
            )
            if self._auto_port and bind_lost and attempt < 2:
                self.port = self.free_port()
                continue
            msg = f"pg_ctl start failed:\n{proc.stderr}\n{log_tail}"
            raise RuntimeError(msg)
        deadline = time.monotonic() + 30
        sock_path = os.path.join(self.sock_dir, f".s.PGSQL.{self.port}")
        while not os.path.exists(sock_path):
            if time.monotonic() > deadline:
                msg = f"server socket {sock_path} never appeared"
                raise RuntimeError(msg)
            time.sleep(0.05)
        self._started = True
        return self

    def _ssl_options(self) -> str:
        """Generate a self-signed cert (once) and return the server's
        ssl options.  PostgreSQL requires the key file be 0600 and owned
        by the server user; the cert doubles as the ``tls_ca`` for a
        verify-ca client."""
        self.cert_path = os.path.join(self.base_dir, "server.crt")
        key_path = os.path.join(self.base_dir, "server.key")
        if not os.path.exists(self.cert_path):
            proc = subprocess.run(  # noqa: S603 - fixed binary, no shell
                [
                    "openssl",
                    "req",
                    "-x509",
                    "-newkey",
                    "rsa:2048",
                    "-nodes",
                    "-keyout",
                    key_path,
                    "-out",
                    self.cert_path,
                    "-days",
                    "2",
                    "-subj",
                    "/CN=localhost",
                    # SAN so a verify-full client (check_hostname) can
                    # match 'localhost' — Python's ssl ignores the CN.
                    # Deliberately NO IP SAN: connecting by 127.0.0.1
                    # under verify-full must FAIL (the mismatch test).
                    "-addext",
                    "subjectAltName=DNS:localhost",
                ],
                capture_output=True,
                text=True,
                check=False,
                timeout=60,
            )
            if proc.returncode != 0:
                msg = f"openssl cert generation failed:\n{proc.stderr}"
                raise RuntimeError(msg)
            os.chmod(key_path, 0o600)
            self._chown_tree()
        return (
            f" -c ssl=on -c ssl_cert_file={self.cert_path}"
            f" -c ssl_key_file={key_path}"
        )

    def stop(self) -> None:
        if self._started:
            self._run(["pg_ctl", "-D", self.data_dir, "-m", "immediate", "stop"])
            self._started = False

    def destroy(self) -> None:
        self.stop()
        shutil.rmtree(self.base_dir, ignore_errors=True)

    def client(
        self, database: str = "postgres", *, user: str = "postgres"
    ) -> PGWireClient:
        return PGWireClient(
            self.sock_dir,
            self.port,
            user=user,
            database=database,
            password=self.password,
        )

    def createdb(self, name: str) -> None:
        admin = self.client()
        try:
            admin.execute(f'CREATE DATABASE "{name}"')
        finally:
            admin.close()

    def __enter__(self) -> "EmbeddedPostgres":
        return self.start()

    def __exit__(self, *exception: object) -> None:
        self.destroy()
