"""Minimal PostgreSQL frontend for logical-replication sessions, stdlib
sockets only — the transport layer under ``PgReplicationConnection``.

Implements just enough of the public wire protocol (PostgreSQL docs,
"Frontend/Backend Protocol" + "Streaming Replication Protocol") to hold
the same session the reference holds through pgstream
(``internal/cdc/source/postgres/reader.go:56-140``):

    StartupMessage (replication=database)
      → AuthenticationOk | cleartext | MD5         ('R')
      → ParameterStatus* / BackendKeyData          ('S' / 'K')
      → ReadyForQuery                              ('Z')
    Query: START_REPLICATION SLOT <slot> LOGICAL <lsn>
           (proto_version '1', publication_names '<pub>')
      → CopyBothResponse                           ('W')
      → CopyData frames (XLogData / keepalive)     ('d')
      ← CopyData standby status updates            ('d' wrapping 'r')

Authentication beyond MD5 (SCRAM) is out of scope here — a production
deployment fronts the connection with a auth proxy or uses the Debezium/
Kafka adapter; the protocol framing below is identical either way.
"""

from __future__ import annotations

import hashlib
import socket
import struct
from typing import Iterator

_PROTO_V3 = 196608  # protocol 3.0


def parse_dsn(dsn: str) -> dict[str, str]:
    """``key=value`` space-separated conninfo (the libpq keyword form)."""
    out: dict[str, str] = {}
    for tok in dsn.split():
        if "=" not in tok:
            raise ValueError(f"bad conninfo token {tok!r}")
        k, _, v = tok.partition("=")
        out[k] = v
    return out


class PgProtocolError(RuntimeError):
    pass


class PgServerError(RuntimeError):
    """ErrorResponse from the backend, with the severity/code/message
    fields flattened."""

    def __init__(self, fields: dict[str, str]) -> None:
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '')}: "
            f"{fields.get('M', 'unknown server error')}"
        )


class PgWireClient:
    """One socket, one session. Messages are length-prefixed; every recv
    path goes through ``_recv_message`` so partial reads are handled in
    exactly one place."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str,
        database: str,
        password: str | None = None,
        replication: str | None = "database",
        timeout: float = 10.0,
    ) -> None:
        self.host, self.port = host, port
        self.user, self.database, self.password = user, database, password
        self.replication = replication
        self.timeout = timeout
        self._sock: socket.socket | None = None
        self._buf = b""
        self.copy_ended = False

    # -- byte transport ------------------------------------------------------

    def _recv_exact(self, n: int) -> bytes:
        assert self._sock is not None
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgProtocolError("server closed the connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _recv_message(self) -> tuple[bytes, bytes]:
        """(type byte, body) — length field includes itself, not the type."""
        head = self._recv_exact(5)
        kind = head[:1]
        (length,) = struct.unpack(">I", head[1:5])
        if length < 4:
            raise PgProtocolError(f"bad message length {length}")
        return kind, self._recv_exact(length - 4)

    def _send_message(self, kind: bytes, body: bytes) -> None:
        assert self._sock is not None
        self._sock.sendall(kind + struct.pack(">I", len(body) + 4) + body)

    # -- session setup -------------------------------------------------------

    def connect(self) -> None:
        self._sock = socket.create_connection((self.host, self.port), self.timeout)
        params = {"user": self.user, "database": self.database}
        if self.replication:
            params["replication"] = self.replication
        body = struct.pack(">I", _PROTO_V3)
        for k, v in params.items():
            body += k.encode() + b"\x00" + v.encode() + b"\x00"
        body += b"\x00"
        # StartupMessage has no type byte
        self._sock.sendall(struct.pack(">I", len(body) + 4) + body)
        self._auth_loop()

    def _auth_loop(self) -> None:
        while True:
            kind, body = self._recv_message()
            if kind == b"R":
                (code,) = struct.unpack_from(">I", body)
                if code == 0:  # AuthenticationOk
                    continue
                if code == 3:  # cleartext password
                    if self.password is None:
                        raise PgProtocolError("server wants a password")
                    self._send_message(b"p", self.password.encode() + b"\x00")
                    continue
                if code == 5:  # MD5: md5(md5(password+user) + salt)
                    if self.password is None:
                        raise PgProtocolError("server wants a password")
                    salt = body[4:8]
                    inner = hashlib.md5(
                        self.password.encode() + self.user.encode()
                    ).hexdigest()
                    digest = hashlib.md5(inner.encode() + salt).hexdigest()
                    self._send_message(b"p", b"md5" + digest.encode() + b"\x00")
                    continue
                raise PgProtocolError(f"unsupported auth method {code}")
            elif kind in (b"S", b"K", b"N"):  # ParameterStatus/KeyData/Notice
                continue
            elif kind == b"Z":  # ReadyForQuery
                return
            elif kind == b"E":
                raise PgServerError(_error_fields(body))
            else:
                raise PgProtocolError(f"unexpected message {kind!r} during auth")

    # -- replication ---------------------------------------------------------

    def start_replication(
        self, slot: str, publication: str, start_lsn_text: str, proto_version: int = 1
    ) -> None:
        sql = (
            f"START_REPLICATION SLOT {slot} LOGICAL {start_lsn_text} "
            f"(proto_version '{proto_version}', "
            f"publication_names '{publication}')"
        )
        self._send_message(b"Q", sql.encode() + b"\x00")
        while True:
            kind, body = self._recv_message()
            if kind == b"W":  # CopyBothResponse — the stream is live
                return
            if kind in (b"S", b"N"):
                continue
            if kind == b"E":
                raise PgServerError(_error_fields(body))
            raise PgProtocolError(f"expected CopyBothResponse, got {kind!r}")

    def copy_frames(self) -> Iterator[bytes]:
        """Yield CopyData payloads (XLogData / keepalive frames) until the
        server ends the COPY (CopyDone) or the stream errors."""
        while True:
            kind, body = self._recv_message()
            if kind == b"d":
                yield body
            elif kind == b"c":  # CopyDone: acknowledge and stop
                self._send_message(b"c", b"")
                self.copy_ended = True
                return
            elif kind in (b"C", b"Z", b"S", b"N"):  # end-of-command chatter
                if kind == b"Z":
                    self.copy_ended = True
                    return
            elif kind == b"E":
                raise PgServerError(_error_fields(body))
            else:
                raise PgProtocolError(f"unexpected message {kind!r} in COPY")

    def send_copy(self, payload: bytes) -> None:
        """Wrap a standby-status/etc payload in a CopyData message."""
        self._send_message(b"d", payload)

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._send_message(b"X", b"")  # Terminate
            except OSError:
                pass
            self._sock.close()
            self._sock = None


def _error_fields(body: bytes) -> dict[str, str]:
    fields: dict[str, str] = {}
    for part in body.split(b"\x00"):
        if part:
            fields[chr(part[0])] = part[1:].decode("utf-8", "replace")
    return fields
