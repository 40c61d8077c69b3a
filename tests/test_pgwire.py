"""End-to-end wire tests for the live replication path: a localhost mock
walsender serves canned COPY-BOTH frames over a real TCP socket, and
``PgReplicationConnection`` drives the full chain

    socket → PgWireClient → parse_copy_data → PgoutputDecoder
           → drain_feed_to_wal → WAL segment → WalStreamReader

mirroring the reference's live session (reader.go:56-140) from
bytes-on-a-socket, not an injected feed.
"""

from __future__ import annotations

import hashlib
import json
import socket
import struct
import threading

import pytest

from philotes_spark.streaming.pgoutput import (
    PgReplicationConnection,
    drain_feed_to_wal,
)
from philotes_spark.streaming.pgwire import (
    PgServerError,
    PgWireClient,
    parse_dsn,
)
from tests.test_pgoutput import _frames


class _Reader:
    """Buffered exact-n reads (recv returns whatever is in flight; the
    leftover must carry over to the next read or framing desyncs)."""

    def __init__(self, conn: socket.socket) -> None:
        self.conn = conn
        self.buf = b""

    def exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.conn.recv(65536)
            if not chunk:
                raise ConnectionError("client closed")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def msg(self) -> tuple[bytes, bytes]:
        head = self.exact(5)
        (length,) = struct.unpack(">I", head[1:5])
        return head[:1], self.exact(length - 4)


def _send_msg(conn: socket.socket, kind: bytes, body: bytes) -> None:
    conn.sendall(kind + struct.pack(">I", len(body) + 4) + body)


def _scram_server_exchange(
    conn: socket.socket, rd: "_Reader", password: str, tamper_signature: bool = False
) -> None:
    """Server side of the RFC 7677 SCRAM-SHA-256 exchange over the PG
    SASL message flow — a real verifier (derives StoredKey/ServerKey via
    PBKDF2 and checks the client proof), not a rubber stamp."""
    import base64
    import hmac as hmac_mod
    import hashlib as hl

    # AuthenticationSASL with the mechanism list
    _send_msg(conn, b"R", struct.pack(">I", 10) + b"SCRAM-SHA-256\x00\x00")
    kind, body = rd.msg()
    assert kind == b"p", kind
    mech, rest = body.split(b"\x00", 1)
    assert mech == b"SCRAM-SHA-256", mech
    (ilen,) = struct.unpack_from(">I", rest)
    client_first = rest[4 : 4 + ilen].decode()
    assert client_first.startswith("n,,"), client_first
    client_bare = client_first[3:]
    client_nonce = dict(
        p.split("=", 1) for p in client_bare.split(",")
    )["r"]

    salt, iterations = b"pepper-salt-0123", 4096
    server_nonce = client_nonce + "SRVNONCE"
    server_first = (
        f"r={server_nonce},s={base64.b64encode(salt).decode()},i={iterations}"
    )
    _send_msg(conn, b"R", struct.pack(">I", 11) + server_first.encode())

    kind, body = rd.msg()
    assert kind == b"p", kind
    client_final = body.decode()
    attrs = dict(p.split("=", 1) for p in client_final.split(",") if "=" in p)
    assert attrs["c"] == "biws", attrs  # base64("n,,") — no channel binding
    assert attrs["r"] == server_nonce, attrs
    without_proof = client_final[: client_final.rindex(",p=")]
    auth_message = ",".join([client_bare, server_first, without_proof]).encode()

    salted = hl.pbkdf2_hmac("sha256", password.encode(), salt, iterations)
    client_key = hmac_mod.digest(salted, b"Client Key", "sha256")
    stored_key = hl.sha256(client_key).digest()
    client_sig = hmac_mod.digest(stored_key, auth_message, "sha256")
    proof = base64.b64decode(attrs["p"])
    recovered_key = bytes(a ^ b for a, b in zip(proof, client_sig))
    assert hl.sha256(recovered_key).digest() == stored_key, "SCRAM proof mismatch"

    server_key = hmac_mod.digest(salted, b"Server Key", "sha256")
    server_sig = hmac_mod.digest(server_key, auth_message, "sha256")
    if tamper_signature:
        server_sig = bytes(b ^ 0xFF for b in server_sig)
    _send_msg(
        conn,
        b"R",
        struct.pack(">I", 12) + b"v=" + base64.b64encode(server_sig),
    )


class MockWalsender(threading.Thread):
    """Single-connection walsender: handshake, optional MD5 or SCRAM
    auth, one START_REPLICATION, canned CopyData frames, CopyDone, then
    drains the client's standby-status CopyData messages until
    disconnect."""

    def __init__(
        self,
        frames: list[bytes],
        md5_auth: tuple[str, str] | None = None,
        scram_password: str | None = None,
        scram_tamper: bool = False,
    ):
        super().__init__(daemon=True)
        self.frames = frames
        self.md5_auth = md5_auth  # (user, password) to verify
        self.scram_password = scram_password
        self.scram_tamper = scram_tamper
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(1)
        self.port = self.listener.getsockname()[1]
        self.startup_params: dict[str, str] = {}
        self.query_sql: str | None = None
        self.statuses: list[bytes] = []
        self.error: Exception | None = None

    def run(self) -> None:
        try:
            conn, _ = self.listener.accept()
            conn.settimeout(10)
            with conn:
                self._session(conn)
        except Exception as e:  # surfaced by the test thread
            self.error = e
        finally:
            self.listener.close()

    def _session(self, conn: socket.socket) -> None:
        rd = _Reader(conn)
        # StartupMessage: length + proto + k\0v\0...\0 (no type byte)
        (length,) = struct.unpack(">I", rd.exact(4))
        body = rd.exact(length - 4)
        (proto,) = struct.unpack_from(">I", body)
        assert proto == 196608, proto
        parts = body[4:].split(b"\x00")
        it = iter(p.decode() for p in parts if p)
        self.startup_params = dict(zip(it, it))

        if self.md5_auth is not None:
            user, password = self.md5_auth
            salt = b"\x01\x02\x03\x04"
            _send_msg(conn, b"R", struct.pack(">I", 5) + salt)
            kind, pbody = rd.msg()
            assert kind == b"p", kind
            inner = hashlib.md5(password.encode() + user.encode()).hexdigest()
            want = b"md5" + hashlib.md5(inner.encode() + salt).hexdigest().encode()
            assert pbody.rstrip(b"\x00") == want, "md5 digest mismatch"
        elif self.scram_password is not None:
            _scram_server_exchange(
                conn, rd, self.scram_password, tamper_signature=self.scram_tamper
            )
        _send_msg(conn, b"R", struct.pack(">I", 0))  # AuthenticationOk
        _send_msg(conn, b"S", b"server_version\x0016.0\x00")
        _send_msg(conn, b"K", struct.pack(">II", 1234, 5678))
        _send_msg(conn, b"Z", b"I")

        kind, qbody = rd.msg()
        assert kind == b"Q", kind
        self.query_sql = qbody.rstrip(b"\x00").decode()
        _send_msg(conn, b"W", b"\x00\x00\x00")  # CopyBothResponse
        for frame in self.frames:
            _send_msg(conn, b"d", frame)
        _send_msg(conn, b"c", b"")  # CopyDone

        # drain client: status updates ('d'), CopyDone ack ('c'),
        # Terminate ('X') / EOF
        while True:
            try:
                kind, body = rd.msg()
            except (ConnectionError, socket.timeout):
                return
            if kind == b"d":
                self.statuses.append(body)
            elif kind == b"X":
                return


def test_dsn_parsing():
    info = parse_dsn("host=10.0.0.1 port=5433 user=repl dbname=app password=s3c")
    assert info == {
        "host": "10.0.0.1",
        "port": "5433",
        "user": "repl",
        "dbname": "app",
        "password": "s3c",
    }
    with pytest.raises(ValueError):
        parse_dsn("host 10.0.0.1")


def test_socket_session_end_to_end(tmp_path):
    """bytes-on-a-socket → decoded events in a WalStreamReader-compatible
    segment, with flush LSNs acked back over the same socket."""
    server = MockWalsender(_frames())
    server.start()
    conn = PgReplicationConnection(
        f"host=127.0.0.1 port={server.port} user=repl dbname=app",
        slot="slot1",
        publication="pub1",
        start_lsn=0,
    )
    n, last = drain_feed_to_wal(conn, str(tmp_path), flush_every=2)
    conn.close()
    server.join(timeout=10)
    assert server.error is None, server.error
    assert (n, last) == (4, 0x1_0000_0040)

    # session shape matches the reference's (reader.go:56-140)
    assert server.startup_params["replication"] == "database"
    assert server.startup_params["user"] == "repl"
    assert server.startup_params["database"] == "app"
    assert server.query_sql == (
        "START_REPLICATION SLOT slot1 LOGICAL 0/0 "
        "(proto_version '1', publication_names 'pub1')"
    )
    # two mid-stream flush acks arrived over the wire ('r' standby status);
    # the post-CopyDone final ack is correctly suppressed
    assert len(server.statuses) == 2
    for st in server.statuses:
        assert st[0:1] == b"r"
    recv, flushed, _applied = struct.unpack_from(">QQQ", server.statuses[-1], 1)
    assert recv == flushed == 0x1_0000_0040

    # the segment replays through the tested Spark-facing source path
    seg = tmp_path / "wal-pgoutput-000001.jsonl"
    events = [json.loads(l) for l in seg.read_text().splitlines()]
    assert [e["operation"] for e in events] == [
        "INSERT",
        "UPDATE",
        "DELETE",
        "TRUNCATE",
    ]


def test_segment_from_socket_feeds_wal_source(tmp_path):
    from philotes_spark.streaming.wal_source import WalStreamReader

    server = MockWalsender(_frames())
    server.start()
    conn = PgReplicationConnection(
        f"host=127.0.0.1 port={server.port} user=repl dbname=app", "s", "p"
    )
    drain_feed_to_wal(conn, str(tmp_path))
    conn.close()
    server.join(timeout=10)
    reader = WalStreamReader({"path": str(tmp_path)})
    parts = reader.partitions(reader.initialOffset(), reader.latestOffset())
    rows = [r for p in parts for r in reader.read(p)]
    assert len(rows) == 4


def test_md5_auth_round_trip(tmp_path):
    server = MockWalsender(_frames(), md5_auth=("repl", "hunter2"))
    server.start()
    conn = PgReplicationConnection(
        f"host=127.0.0.1 port={server.port} user=repl dbname=app password=hunter2",
        "s",
        "p",
    )
    n, _ = drain_feed_to_wal(conn, str(tmp_path))
    conn.close()
    server.join(timeout=10)
    assert server.error is None, server.error
    assert n == 4


def test_scram_auth_round_trip(tmp_path):
    """Full SCRAM-SHA-256 session against a real verifier (the server
    derives StoredKey via PBKDF2 and checks the proof, the client checks
    the server signature — mutual auth), then replication proceeds."""
    server = MockWalsender(_frames(), scram_password="s3cret-pw")
    server.start()
    conn = PgReplicationConnection(
        f"host=127.0.0.1 port={server.port} user=repl dbname=app password=s3cret-pw",
        "s",
        "p",
    )
    n, _ = drain_feed_to_wal(conn, str(tmp_path))
    conn.close()
    server.join(timeout=10)
    assert server.error is None, server.error
    assert n == 4


def test_scram_wrong_password_rejected():
    server = MockWalsender(_frames(), scram_password="right-pw")
    server.start()
    client = PgWireClient(
        "127.0.0.1", server.port, "repl", "app", password="wrong-pw"
    )
    with pytest.raises(Exception):  # server-side proof assertion trips
        client.connect()
    client.close()
    server.join(timeout=10)
    assert server.error is not None  # the mock's proof check fired


def test_scram_tampered_server_signature_rejected():
    """Mutual auth: a server that cannot produce ServerSignature (e.g. a
    MITM without the verifier) must be rejected by the client."""
    from philotes_spark.streaming.pgwire import PgProtocolError

    server = MockWalsender(_frames(), scram_password="pw", scram_tamper=True)
    server.start()
    client = PgWireClient("127.0.0.1", server.port, "repl", "app", password="pw")
    with pytest.raises(PgProtocolError, match="server signature"):
        client.connect()
    client.close()
    server.join(timeout=10)


def test_scram_client_vectors():
    """RFC 7677 §3 test vectors for the client side (user 'user',
    password 'pencil', the published nonces/salt)."""
    from philotes_spark.streaming.pgwire import ScramClient

    c = ScramClient("pencil", nonce="rOprNGfwEbeRWgbNEkqO")
    assert c.client_first() == "n,,n=,r=rOprNGfwEbeRWgbNEkqO"
    # server-first from the RFC vector
    server_first = (
        "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    # RFC 7677 uses n=user; PG (and this client) send n= empty, so the
    # proof differs from the RFC's — but it must verify against an
    # independent PBKDF2 derivation of the same AuthMessage:
    final = c.client_final(server_first)
    import base64
    import hmac as hmac_mod
    import hashlib as hl

    attrs = dict(p.split("=", 1) for p in final.split(",") if "=" in p)
    without_proof = final[: final.rindex(",p=")]
    auth_message = ",".join(
        ["n=,r=rOprNGfwEbeRWgbNEkqO", server_first, without_proof]
    ).encode()
    salted = hl.pbkdf2_hmac(
        "sha256", b"pencil", base64.b64decode("W22ZaJ0SNY7soEsUEjb6gQ=="), 4096
    )
    client_key = hmac_mod.digest(salted, b"Client Key", "sha256")
    stored_key = hl.sha256(client_key).digest()
    client_sig = hmac_mod.digest(stored_key, auth_message, "sha256")
    proof = base64.b64decode(attrs["p"])
    assert bytes(a ^ b for a, b in zip(proof, client_sig)) == client_key
    # and the client must reject a non-extending server nonce
    c2 = ScramClient("pencil", nonce="abc")
    from philotes_spark.streaming.pgwire import PgProtocolError

    with pytest.raises(PgProtocolError, match="nonce"):
        c2.client_final("r=zzz,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")


def test_scram_malformed_server_first_raises_protocol_error():
    """A server-first missing r/s/i (or with undecodable s / non-integer
    i) must surface as PgProtocolError with context, not a bare
    KeyError/binascii.Error (ADVICE r05)."""
    from philotes_spark.streaming.pgwire import PgProtocolError, ScramClient

    for bad, pat in [
        ("s=V2Fs,i=4096", "missing attribute"),  # no r
        ("r=abcXYZ,i=4096", "missing attribute"),  # no s
        ("r=abcXYZ,s=V2Fs", "missing attribute"),  # no i
        ("r=abcXYZ,s=!!notb64!!,i=4096", "malformed s/i"),
        ("r=abcXYZ,s=V2Fs,i=many", "malformed s/i"),
    ]:
        c = ScramClient("pw", nonce="abc")
        with pytest.raises(PgProtocolError, match=pat):
            c.client_final(bad)


def test_simple_query_rows_nulls_and_error_recovery():
    """The simple-query surface used by the live E2E (DDL, slot
    creation): DataRow decode incl. SQL NULL, and a server error drains
    to ReadyForQuery so the session stays usable for the next query."""

    class QueryServer(MockWalsender):
        def _session(self, conn):
            rd = _Reader(conn)
            (length,) = struct.unpack(">I", rd.exact(4))
            rd.exact(length - 4)
            _send_msg(conn, b"R", struct.pack(">I", 0))
            _send_msg(conn, b"Z", b"I")
            # query 1: two rows, second has a NULL
            kind, q = rd.msg()
            assert kind == b"Q" and b"SELECT" in q
            _send_msg(conn, b"T", struct.pack(">H", 2) + b"junkdesc")
            _send_msg(
                conn,
                b"D",
                struct.pack(">H", 2)
                + struct.pack(">i", 4) + b"slot"
                + struct.pack(">i", 9) + b"0/15D6A80",
            )
            _send_msg(
                conn,
                b"D",
                struct.pack(">H", 2)
                + struct.pack(">i", 2) + b"s2"
                + struct.pack(">i", -1),
            )
            _send_msg(conn, b"C", b"SELECT 2\x00")
            _send_msg(conn, b"Z", b"I")
            # query 2: error, then ReadyForQuery
            rd.msg()
            _send_msg(
                conn, b"E", b"SERROR\x00C42P01\x00Mrelation missing\x00\x00"
            )
            _send_msg(conn, b"Z", b"I")
            # query 3: session still usable
            rd.msg()
            _send_msg(conn, b"C", b"CREATE TABLE\x00")
            _send_msg(conn, b"Z", b"I")
            # drain Terminate
            try:
                rd.msg()
            except (ConnectionError, socket.timeout):
                pass

    server = QueryServer([])
    server.start()
    client = PgWireClient("127.0.0.1", server.port, "u", "db", replication=None)
    client.connect()
    assert client.simple_query("SELECT slot, lsn FROM x") == [
        ("slot", "0/15D6A80"),
        ("s2", None),
    ]
    with pytest.raises(PgServerError, match="relation missing"):
        client.simple_query("SELECT * FROM missing")
    assert client.simple_query("CREATE TABLE t (id int)") == []
    client.close()
    server.join(timeout=10)
    assert server.error is None, server.error


def test_server_error_surfaces():
    class ErrWalsender(MockWalsender):
        def _session(self, conn):
            rd = _Reader(conn)
            (length,) = struct.unpack(">I", rd.exact(4))
            rd.exact(length - 4)
            _send_msg(conn, b"R", struct.pack(">I", 0))
            _send_msg(conn, b"Z", b"I")
            rd.msg()  # the START_REPLICATION query
            _send_msg(
                conn,
                b"E",
                b"SERROR\x00C42704\x00Mreplication slot does not exist\x00\x00",
            )

    server = ErrWalsender([])
    server.start()
    client = PgWireClient("127.0.0.1", server.port, "u", "db")
    client.connect()
    with pytest.raises(PgServerError, match="slot does not exist"):
        client.start_replication("nope", "pub", "0/0")
    client.close()
    server.join(timeout=10)
