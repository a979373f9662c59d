"""Minimal PostgreSQL v3 wire-protocol client (pure stdlib sockets).

The reference's production sink is a PostgreSQL connection executing
the generated CREATE/INSERT/DELETE statements one by one
(/root/reference/src/db_client.rs:78-117 pool, :147-303 statement
execution). This container has no PG server, no JDBC driver jar, and
no Python PG client — so the statement-execution seam was previously
pinned only as generated-SQL string equality (tests/test_ingest.py
TestDialectDDL). This module closes the seam with a from-spec
implementation of the FRONTEND half of the PostgreSQL Frontend/Backend
protocol (v3.0, the public `protocol.html` spec): StartupMessage →
AuthenticationOk → ReadyForQuery, then simple-Query messages with
CommandComplete/ErrorResponse handling — enough to drive every
statement the PG dialect emits over a REAL socket, asserted against an
in-process fake listener in tests (TestPgWireSmoke).

Deliberately NOT implemented: authentication methods beyond trust
(AuthenticationOk), the extended query protocol, COPY, TLS (an
SSLRequest is never sent). A production deployment would use a real
driver; this client exists so the dialect's wire behavior is a tested
contract instead of prose.
"""

from __future__ import annotations

import socket
import struct

_PROTOCOL_V3 = 196608  # (3 << 16) | 0


class PgWireError(RuntimeError):
    """Server sent ErrorResponse; carries the field map (S/C/M...)."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')}: {fields.get('M', '(no message)')} "
            f"(sqlstate {fields.get('C', '?')})"
        )


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("server closed the connection mid-message")
        buf += chunk
    return buf


def _read_message(sock: socket.socket) -> tuple[bytes, bytes]:
    """One backend message: (type byte, payload). The length field on
    the wire INCLUDES itself (4 bytes) but not the type byte."""
    t = _recv_exact(sock, 1)
    (length,) = struct.unpack("!i", _recv_exact(sock, 4))
    return t, _recv_exact(sock, length - 4)


def _cstrings(payload: bytes) -> list[str]:
    return [p.decode("utf-8") for p in payload.split(b"\x00") if p]


class PgWireClient:
    """One connection speaking the simple-query flavor of the v3
    protocol. Usage::

        with PgWireClient(host, port, user="cdl", database="cdl") as c:
            c.execute("CREATE TABLE ...")
            tag = c.execute("INSERT INTO ... VALUES (...)")
    """

    def __init__(
        self,
        host: str,
        port: int,
        user: str = "cdl",
        database: str = "cdl",
        timeout: float = 10.0,
    ):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self.parameters: dict[str, str] = {}
        self.backend_pid: int | None = None
        try:
            self._startup(user, database)
        except BaseException:
            # a failed startup raises from __init__, so no context
            # manager ever runs close() — reclaim the socket here or a
            # retry loop against an md5/scram server leaks fds
            self._sock.close()
            raise

    # -- protocol ------------------------------------------------------

    def _startup(self, user: str, database: str) -> None:
        body = struct.pack("!i", _PROTOCOL_V3)
        for k, v in (("user", user), ("database", database)):
            body += k.encode() + b"\x00" + v.encode() + b"\x00"
        body += b"\x00"
        self._sock.sendall(struct.pack("!i", len(body) + 4) + body)
        authed = False
        while True:
            t, payload = _read_message(self._sock)
            if t == b"R":
                (code,) = struct.unpack("!i", payload[:4])
                if code != 0:
                    raise PgWireError(
                        {"S": "FATAL", "C": "28000",
                         "M": f"unsupported auth method {code} "
                              "(this client speaks trust only)"}
                    )
                authed = True
            elif t == b"S":  # ParameterStatus
                kv = _cstrings(payload)
                if len(kv) == 2:
                    self.parameters[kv[0]] = kv[1]
            elif t == b"K":  # BackendKeyData
                self.backend_pid = struct.unpack("!ii", payload)[0]
            elif t == b"E":
                raise PgWireError(self._error_fields(payload))
            elif t == b"Z":  # ReadyForQuery
                if not authed:
                    raise PgWireError(
                        {"S": "FATAL", "C": "08P01",
                         "M": "ready before AuthenticationOk"}
                    )
                return
            # anything else (NoticeResponse, ...) is skipped

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        i = 0
        while i < len(payload) and payload[i : i + 1] != b"\x00":
            code = payload[i : i + 1].decode()
            j = payload.index(b"\x00", i + 1)
            fields[code] = payload[i + 1 : j].decode("utf-8", "replace")
            i = j + 1
        return fields

    def execute(self, sql: str) -> str:
        """Run one statement via simple Query; returns the
        CommandComplete tag (e.g. ``INSERT 0 1``). Result rows
        (RowDescription/DataRow) are drained and discarded — the
        import path only issues DDL/DML. Raises :class:`PgWireError`
        on ErrorResponse (after draining to ReadyForQuery, so the
        connection stays usable — the protocol's error recovery
        rule)."""
        body = sql.encode("utf-8") + b"\x00"
        self._sock.sendall(b"Q" + struct.pack("!i", len(body) + 4) + body)
        tag, err = "", None
        while True:
            t, payload = _read_message(self._sock)
            if t == b"C":
                tag = payload.rstrip(b"\x00").decode()
            elif t == b"E":
                err = self._error_fields(payload)
            elif t == b"Z":
                if err is not None:
                    raise PgWireError(err)
                return tag
            # 'T' (RowDescription), 'D' (DataRow), 'I' (EmptyQuery),
            # 'N' (Notice) — drained

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + struct.pack("!i", 4))
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "PgWireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def apply_statements(
    host: str,
    port: int,
    statements: list[str],
    user: str = "cdl",
    database: str = "cdl",
) -> list[str]:
    """Execute the dialect's generated statements in order over one
    connection — the reference's import motion (create table, then
    per-record delete+insert, db_client.rs:119-145) as a wire-level
    call. Returns the CommandComplete tags, one per statement."""
    with PgWireClient(host, port, user=user, database=database) as c:
        return [c.execute(s) for s in statements]
