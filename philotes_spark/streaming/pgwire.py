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

Auth methods: cleartext, MD5, and SCRAM-SHA-256 (RFC 5802/7677 over the
SASL message flow of the PG docs "SASL Authentication" section) — the
default of every modern PostgreSQL. SCRAM-SHA-256-PLUS (TLS channel
binding) is not offered since this client doesn't speak TLS; the gs2
header is therefore always ``n,,``.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import hmac
import secrets
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


class ScramClient:
    """SCRAM-SHA-256 client state machine (RFC 5802 mechanics, RFC 7677
    hash parameters), gs2 header fixed to ``n,,`` (no channel binding).

    PostgreSQL ignores the ``n=`` username attribute (the startup-message
    user wins), so like libpq we send it empty. Passwords are used as
    UTF-8; full SASLprep normalization (RFC 4013) is a no-op for the
    ASCII passwords this client targets."""

    def __init__(self, password: str, nonce: str | None = None) -> None:
        self._password = password
        self._client_nonce = nonce or base64.b64encode(
            secrets.token_bytes(18)
        ).decode()
        self.client_first_bare = f"n=,r={self._client_nonce}"
        self._server_signature: str | None = None

    def client_first(self) -> str:
        return "n,," + self.client_first_bare

    def client_final(self, server_first: str) -> str:
        attrs = _scram_attrs(server_first)
        missing = [k for k in ("r", "s", "i") if k not in attrs]
        if missing:
            raise PgProtocolError(
                f"SCRAM server-first missing attribute(s) {missing}: {server_first!r}"
            )
        nonce = attrs["r"]
        if not nonce.startswith(self._client_nonce) or nonce == self._client_nonce:
            raise PgProtocolError("SCRAM server nonce must extend the client nonce")
        try:
            salt = base64.b64decode(attrs["s"], validate=True)
            iterations = int(attrs["i"])
        except (binascii.Error, ValueError) as exc:
            raise PgProtocolError(
                f"SCRAM server-first malformed s/i attribute: {exc}"
            ) from exc
        salted = hashlib.pbkdf2_hmac(
            "sha256", self._password.encode(), salt, iterations
        )
        client_key = hmac.digest(salted, b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        without_proof = f"c=biws,r={nonce}"  # biws = base64("n,,")
        auth_message = ",".join(
            [self.client_first_bare, server_first, without_proof]
        ).encode()
        client_sig = hmac.digest(stored_key, auth_message, "sha256")
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        server_key = hmac.digest(salted, b"Server Key", "sha256")
        self._server_signature = base64.b64encode(
            hmac.digest(server_key, auth_message, "sha256")
        ).decode()
        return f"{without_proof},p={base64.b64encode(proof).decode()}"

    def verify_server_final(self, server_final: str) -> None:
        """Mutual auth: the server must prove it holds ServerKey."""
        attrs = _scram_attrs(server_final)
        if "e" in attrs:
            raise PgProtocolError(f"SCRAM server error: {attrs['e']}")
        if self._server_signature is None:
            raise PgProtocolError("SCRAM final before client-final was sent")
        if not hmac.compare_digest(attrs.get("v", ""), self._server_signature):
            raise PgProtocolError("SCRAM server signature mismatch")


def _scram_attrs(message: str) -> dict[str, str]:
    """``k=v,...`` SCRAM attribute list (values may contain '=')."""
    out: dict[str, str] = {}
    for part in message.split(","):
        if len(part) >= 2 and part[1] == "=":
            out[part[0]] = part[2:]
    return out


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
        scram: ScramClient | None = None
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
                if code == 10:  # AuthenticationSASL: pick SCRAM-SHA-256
                    if self.password is None:
                        raise PgProtocolError("server wants a password")
                    mechanisms = [
                        m.decode() for m in body[4:].split(b"\x00") if m
                    ]
                    if "SCRAM-SHA-256" not in mechanisms:
                        raise PgProtocolError(
                            f"no supported SASL mechanism in {mechanisms} "
                            "(only SCRAM-SHA-256 without channel binding)"
                        )
                    scram = ScramClient(self.password)
                    first = scram.client_first().encode()
                    self._send_message(
                        b"p",
                        b"SCRAM-SHA-256\x00"
                        + struct.pack(">I", len(first))
                        + first,
                    )
                    continue
                if code == 11:  # AuthenticationSASLContinue
                    if scram is None:
                        raise PgProtocolError("SASLContinue before SASL start")
                    final = scram.client_final(body[4:].decode())
                    self._send_message(b"p", final.encode())
                    continue
                if code == 12:  # AuthenticationSASLFinal: mutual auth check
                    if scram is None:
                        raise PgProtocolError("SASLFinal before SASL start")
                    scram.verify_server_final(body[4:].decode())
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

    # -- simple query --------------------------------------------------------

    def simple_query(self, sql: str) -> list[tuple]:
        """Simple-query protocol ('Q'): run one statement, return DataRow
        values as text tuples (None for SQL NULL). Used for control-session
        DDL/DML and for walsender commands (CREATE_REPLICATION_SLOT,
        IDENTIFY_SYSTEM) on a replication session — the same dual use the
        reference gets from pgstream (reader.go:56-140). On a server
        error the stream is drained to ReadyForQuery before raising, so
        the session stays usable."""
        self._send_message(b"Q", sql.encode() + b"\x00")
        rows: list[tuple] = []
        err: PgServerError | None = None
        while True:
            kind, body = self._recv_message()
            if kind == b"D":
                (n,) = struct.unpack_from(">H", body)
                off = 2
                vals: list[str | None] = []
                for _ in range(n):
                    (ln,) = struct.unpack_from(">i", body, off)
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(body[off : off + ln].decode("utf-8", "replace"))
                        off += ln
                rows.append(tuple(vals))
            elif kind in (b"T", b"C", b"S", b"N", b"I"):
                # RowDescription / CommandComplete / ParameterStatus /
                # Notice / EmptyQueryResponse — positional chatter
                continue
            elif kind == b"E":
                err = PgServerError(_error_fields(body))
            elif kind == b"Z":
                if err is not None:
                    raise err
                return rows
            else:
                raise PgProtocolError(
                    f"unexpected message {kind!r} in simple query"
                )

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
