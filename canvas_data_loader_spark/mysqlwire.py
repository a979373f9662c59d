"""Minimal MySQL client/server wire-protocol client (pure stdlib).

The reference's second production sink is a MySQL connection pool
executing the generated CREATE/INSERT/DELETE statements one by one
(/root/reference/src/mysql_pool/pool.rs:8-49 pool construction,
src/db_client.rs:305-504 statement execution). This container has no
MySQL server and no Python MySQL client — so, as with PostgreSQL
before round 13's ``pgwire.py``, the statement-execution seam was
pinned only as generated-SQL string equality (tests/test_ingest.py
TestDialectDDL). This module closes the seam the same way: a
from-spec implementation of the CLIENT half of the MySQL
Client/Server protocol (the public dev.mysql.com internals manual) —
Initial Handshake v10 → HandshakeResponse41 with REAL
``mysql_native_password`` scramble arithmetic → OK, then COM_QUERY
commands with OK/ERR handling — enough to drive every statement the
MySQL dialect emits over a REAL socket, asserted against an
in-process fake listener that VERIFIES the auth token
(TestMySqlWireSmoke).

Deliberately NOT implemented: caching_sha2_password / auth plugin
switching, TLS, compression, the prepared-statement (binary) protocol,
multi-statement/multi-resultset mode. A production deployment would
use a real driver; this client exists so the dialect's wire behavior
— including the scramble, which the serverless DDL goldens cannot
exercise — is a tested contract instead of prose.
"""

from __future__ import annotations

import hashlib
import socket
import struct

# capability flags (protocol constants from the public manual)
CLIENT_CONNECT_WITH_DB = 0x00000008
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000

_CLIENT_CAPS = (
    CLIENT_PROTOCOL_41
    | CLIENT_SECURE_CONNECTION
    | CLIENT_CONNECT_WITH_DB
    | CLIENT_PLUGIN_AUTH
)

COM_QUIT = 0x01
COM_QUERY = 0x03


class MySqlWireError(RuntimeError):
    """Server sent an ERR packet; carries errno + sqlstate + message."""

    def __init__(self, errno: int, sqlstate: str, message: str):
        self.errno = errno
        self.sqlstate = sqlstate
        self.message = message
        super().__init__(f"({errno}, {sqlstate}): {message}")


def native_password_scramble(password: str, nonce: bytes) -> bytes:
    """``mysql_native_password`` token, exactly as the manual states:
    ``SHA1(password) XOR SHA1(nonce + SHA1(SHA1(password)))`` over the
    20-byte handshake nonce. Empty password -> empty token."""
    if not password:
        return b""
    p1 = hashlib.sha1(password.encode("utf-8")).digest()
    p2 = hashlib.sha1(p1).digest()
    mask = hashlib.sha1(nonce + p2).digest()
    return bytes(a ^ b for a, b in zip(p1, mask))


def _lenenc(payload: bytes, i: int) -> tuple[int, int]:
    """Decode a length-encoded integer at offset i -> (value, next_i)."""
    first = payload[i]
    if first < 0xFB:
        return first, i + 1
    if first == 0xFC:
        return int.from_bytes(payload[i + 1 : i + 3], "little"), i + 3
    if first == 0xFD:
        return int.from_bytes(payload[i + 1 : i + 4], "little"), i + 4
    if first == 0xFE:
        return int.from_bytes(payload[i + 1 : i + 9], "little"), i + 9
    raise MySqlWireError(2027, "HY000", f"malformed lenenc 0x{first:02x}")


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("server closed the connection mid-packet")
        buf += chunk
    return buf


class MySqlWireClient:
    """One connection speaking the text (COM_QUERY) protocol. Usage::

        with MySqlWireClient(host, port, user="cdl", password="s3",
                             database="cdl") as c:
            c.execute("CREATE TABLE ...")
            affected = c.execute("INSERT INTO ... VALUES (...)")
    """

    def __init__(
        self,
        host: str,
        port: int,
        user: str = "cdl",
        password: str = "",
        database: str = "cdl",
        timeout: float = 10.0,
    ):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._seq = 0
        self.server_version: str | None = None
        self.thread_id: int | None = None
        self.last_info: str = ""
        try:
            self._handshake(user, password, database)
        except BaseException:
            # a failed handshake raises from __init__, so no context
            # manager ever runs close() — reclaim the socket here or a
            # retry loop against a misconfigured server leaks fds
            self._sock.close()
            raise

    # -- packet framing -----------------------------------------------

    def _read_packet(self) -> bytes:
        head = _recv_exact(self._sock, 4)
        length = int.from_bytes(head[:3], "little")
        self._seq = (head[3] + 1) & 0xFF
        return _recv_exact(self._sock, length)

    def _send_packet(self, payload: bytes) -> None:
        if len(payload) >= 0xFFFFFF:  # pragma: no cover — DDL/DML only
            raise MySqlWireError(2020, "HY000", "packet too large")
        self._sock.sendall(
            len(payload).to_bytes(3, "little")
            + bytes([self._seq])
            + payload
        )
        self._seq = (self._seq + 1) & 0xFF

    # -- protocol ------------------------------------------------------

    def _handshake(self, user: str, password: str, database: str) -> None:
        greet = self._read_packet()
        if greet and greet[0] == 0xFF:
            raise self._err(greet)
        if not greet or greet[0] != 0x0A:
            raise MySqlWireError(
                2012,
                "HY000",
                f"unsupported handshake protocol {greet[:1]!r} "
                "(this client speaks v10 only)",
            )
        nul = greet.index(b"\x00", 1)
        self.server_version = greet[1:nul].decode("utf-8", "replace")
        i = nul + 1
        self.thread_id = int.from_bytes(greet[i : i + 4], "little")
        i += 4
        nonce = greet[i : i + 8]  # auth-plugin-data-part-1
        i += 8 + 1  # + filler
        caps = int.from_bytes(greet[i : i + 2], "little")
        i += 2
        if len(greet) > i:
            i += 1 + 2  # charset, status flags
            caps |= int.from_bytes(greet[i : i + 2], "little") << 16
            i += 2
            auth_len = greet[i]
            i += 1 + 10  # + reserved
            if caps & CLIENT_SECURE_CONNECTION:
                # part-2 is max(13, auth_len - 8) bytes; exactly the
                # first 12 join the nonce (the 13th is a terminating
                # NUL) — rstrip would corrupt a nonce whose own tail
                # bytes are legitimately zero
                part2 = greet[i : i + max(13, auth_len - 8)]
                nonce += part2[:12]
        if not caps & CLIENT_PROTOCOL_41:
            raise MySqlWireError(
                2007, "HY000", "server does not speak protocol 4.1"
            )
        token = native_password_scramble(password, nonce)
        body = struct.pack("<II", _CLIENT_CAPS, 1 << 24)
        body += bytes([45])  # utf8mb4_general_ci
        body += b"\x00" * 23
        body += user.encode("utf-8") + b"\x00"
        body += bytes([len(token)]) + token
        body += database.encode("utf-8") + b"\x00"
        body += b"mysql_native_password\x00"
        self._send_packet(body)
        reply = self._read_packet()
        if reply and reply[0] == 0xFF:
            raise self._err(reply)
        if reply and reply[0] == 0xFE:
            raise MySqlWireError(
                2059,
                "HY000",
                "server requested an auth plugin switch (this client "
                "speaks mysql_native_password only)",
            )
        if not reply or reply[0] != 0x00:
            raise MySqlWireError(
                2027, "HY000", f"unexpected auth reply 0x{reply[:1].hex()}"
            )

    @staticmethod
    def _err(payload: bytes) -> MySqlWireError:
        errno = int.from_bytes(payload[1:3], "little")
        i = 3
        sqlstate = "HY000"
        if len(payload) > 3 and payload[3:4] == b"#":
            sqlstate = payload[4:9].decode("ascii", "replace")
            i = 9
        return MySqlWireError(
            errno, sqlstate, payload[i:].decode("utf-8", "replace")
        )

    def _parse_ok(self, payload: bytes) -> int:
        affected, i = _lenenc(payload, 1)
        _, i = _lenenc(payload, i)  # last insert id
        i += 2 + 2  # status flags, warnings
        self.last_info = payload[i:].decode("utf-8", "replace")
        return affected

    def execute(self, sql: str) -> int:
        """Run one statement via COM_QUERY; returns the affected-row
        count from the OK packet (the MySQL analog of PG's
        CommandComplete tag; human text, if any, lands in
        ``last_info``). Result sets are drained and discarded — the
        import path only issues DDL/DML. Raises
        :class:`MySqlWireError` on an ERR packet; unlike PG there is
        nothing to drain afterwards (one response per command), so the
        connection stays usable."""
        self._seq = 0  # sequence resets per command
        self._send_packet(bytes([COM_QUERY]) + sql.encode("utf-8"))
        reply = self._read_packet()
        if reply and reply[0] == 0xFF:
            raise self._err(reply)
        if reply and reply[0] == 0x00:
            return self._parse_ok(reply)
        # result set: column count, column defs, EOF, rows, EOF —
        # drain until the row-phase EOF (0xfe, len < 9)
        eofs = 0
        while eofs < 2:
            p = self._read_packet()
            if p and p[0] == 0xFF:
                raise self._err(p)
            if p and p[0] == 0xFE and len(p) < 9:
                eofs += 1
        return 0

    def close(self) -> None:
        try:
            self._seq = 0
            self._send_packet(bytes([COM_QUIT]))
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "MySqlWireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def apply_statements(
    host: str,
    port: int,
    statements: list[str],
    user: str = "cdl",
    password: str = "",
    database: str = "cdl",
) -> list[int]:
    """Execute the dialect's generated statements in order over one
    connection — the reference's import motion (create table, then
    per-record delete+insert, db_client.rs:305-504) as a wire-level
    call. Returns the affected-row counts, one per statement."""
    with MySqlWireClient(
        host, port, user=user, password=password, database=database
    ) as c:
        return [c.execute(s) for s in statements]
