"""PostgreSQL logical-replication ``pgoutput`` decoder (SURVEY §2A A1's
last mile).

The reference consumes logical replication through pgstream
(``internal/cdc/source/postgres/reader.go:56-140``) and converts WAL
events to engine CDC events (``reader.go:172-253``: operation mapping
I/U/D/T, before/after extraction, key columns from the replica
identity). This module implements the same conversion directly from the
**public wire protocol** (PostgreSQL docs: protocol-logicalrep-message-
formats + streaming-replication COPY-BOTH framing), all the way down to
the TCP session (``pgwire.PgWireClient``; mock-walsender-tested):

    frame ('w' XLogData | 'k' keepalive)          parse_copy_data
      → pgoutput message (B/C/R/I/U/D/T)          PgoutputDecoder.decode
      → engine CDC event dict                     PgoutputDecoder.to_cdc_event
      → wal-*.jsonl segment                       drain_feed_to_wal
      → WalStreamReader (streaming/wal_source.py) — the tested Spark path

The feed is injectable (``ReplicationFeed``): tests drive canned protocol
bytes directly or through a localhost mock walsender; against a live
Postgres, ``PgReplicationConnection`` opens the same session over the
stdlib socket client (START_REPLICATION SLOT ... LOGICAL ... pgoutput).
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Iterable, Iterator

# PostgreSQL timestamps in the replication protocol are µs since 2000-01-01.
_PG_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)


def _pg_ts(micros: int) -> datetime:
    return _PG_EPOCH + timedelta(microseconds=micros)


def lsn_to_text(lsn: int) -> str:
    """64-bit LSN → the canonical ``X/Y`` hex text form (pg_lsn)."""
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


# --- COPY-BOTH framing ------------------------------------------------------


@dataclass
class XLogData:
    wal_start: int
    wal_end: int
    send_time: datetime
    payload: bytes


@dataclass
class Keepalive:
    wal_end: int
    send_time: datetime
    reply_requested: bool


def parse_copy_data(frame: bytes) -> XLogData | Keepalive:
    """One CopyData payload from the walsender: ``w`` = XLogData (carries a
    pgoutput message), ``k`` = primary keepalive."""
    kind = frame[:1]
    if kind == b"w":
        start, end, ts = struct.unpack_from(">QQQ", frame, 1)
        return XLogData(start, end, _pg_ts(ts), frame[25:])
    if kind == b"k":
        end, ts, reply = struct.unpack_from(">QQB", frame, 1)
        return Keepalive(end, _pg_ts(ts), bool(reply))
    raise ValueError(f"unknown copy-data kind {kind!r}")


def encode_standby_status(
    received: int, flushed: int, applied: int, reply_requested: bool = False
) -> bytes:
    """Standby status update (``r``) — the client's flush-position ack, the
    write side of the reference's confirmed-flush LSN tracking."""
    now = int((datetime.now(timezone.utc) - _PG_EPOCH).total_seconds() * 1_000_000)
    return b"r" + struct.pack(
        ">QQQQB", received, flushed, applied, now, int(reply_requested)
    )


# --- pgoutput logical messages ----------------------------------------------


@dataclass
class RelationColumn:
    name: str
    type_oid: int
    is_key: bool  # flags bit 0: part of the replica identity / PK


@dataclass
class Relation:
    relation_id: int
    namespace: str
    name: str
    replica_identity: str  # 'd' default, 'n' nothing, 'f' full, 'i' index
    columns: list[RelationColumn]


@dataclass
class Begin:
    final_lsn: int
    commit_time: datetime
    xid: int


@dataclass
class Commit:
    commit_lsn: int
    end_lsn: int
    commit_time: datetime


@dataclass
class RowChange:
    kind: str  # INSERT | UPDATE | DELETE
    relation_id: int
    old_tuple: list | None  # from 'K' (key) or 'O' (full old row)
    old_kind: str | None  # 'K' or 'O'
    new_tuple: list | None


@dataclass
class Truncate:
    relation_ids: list[int]
    cascade: bool
    restart_identity: bool


def _cstr(buf: bytes, off: int) -> tuple[str, int]:
    end = buf.index(b"\x00", off)
    return buf[off:end].decode(), end + 1


def _tuple_data(buf: bytes, off: int) -> tuple[list, int]:
    """TupleData: n cols of 'n' (null) | 'u' (unchanged TOAST) | 't' text.
    Returns python values: None for null, ``...`` (Ellipsis) for unchanged
    TOAST (caller keeps the previous value), str for text."""
    (ncols,) = struct.unpack_from(">H", buf, off)
    off += 2
    out: list = []
    for _ in range(ncols):
        kind = buf[off : off + 1]
        off += 1
        if kind == b"n":
            out.append(None)
        elif kind == b"u":
            out.append(...)
        elif kind in (b"t", b"b"):
            (ln,) = struct.unpack_from(">I", buf, off)
            off += 4
            raw = buf[off : off + ln]
            off += ln
            out.append(raw.decode() if kind == b"t" else raw)
        else:
            raise ValueError(f"unknown tuple column kind {kind!r}")
    return out, off


def decode_message(payload: bytes):
    """One pgoutput message → typed dataclass (B/C/R/I/U/D/T; O=origin and
    Y=type messages are skipped as the reference does with non-row events)."""
    tag, body = payload[:1], payload
    if tag == b"B":
        final_lsn, ts, xid = struct.unpack_from(">QQI", body, 1)
        return Begin(final_lsn, _pg_ts(ts), xid)
    if tag == b"C":
        _flags, commit_lsn, end_lsn, ts = struct.unpack_from(">BQQQ", body, 1)
        return Commit(commit_lsn, end_lsn, _pg_ts(ts))
    if tag == b"R":
        (relid,) = struct.unpack_from(">I", body, 1)
        off = 5
        namespace, off = _cstr(body, off)
        name, off = _cstr(body, off)
        replident = body[off : off + 1].decode()
        off += 1
        (ncols,) = struct.unpack_from(">H", body, off)
        off += 2
        cols = []
        for _ in range(ncols):
            flags = body[off]
            off += 1
            cname, off = _cstr(body, off)
            type_oid, _type_mod = struct.unpack_from(">II", body, off)
            off += 8
            cols.append(RelationColumn(cname, type_oid, bool(flags & 1)))
        return Relation(relid, namespace, name, replident, cols)
    if tag == b"I":
        (relid,) = struct.unpack_from(">I", body, 1)
        if body[5:6] != b"N":
            raise ValueError(f"insert without new tuple: {body[5:6]!r}")
        new, _ = _tuple_data(body, 6)
        return RowChange("INSERT", relid, None, None, new)
    if tag == b"U":
        (relid,) = struct.unpack_from(">I", body, 1)
        off = 5
        old, old_kind = None, None
        marker = body[off : off + 1]
        if marker in (b"K", b"O"):
            old_kind = marker.decode()
            old, off = _tuple_data(body, off + 1)
            marker = body[off : off + 1]
        if marker != b"N":
            raise ValueError(f"update without new tuple: {marker!r}")
        new, _ = _tuple_data(body, off + 1)
        return RowChange("UPDATE", relid, old, old_kind, new)
    if tag == b"D":
        (relid,) = struct.unpack_from(">I", body, 1)
        marker = body[5:6]
        if marker not in (b"K", b"O"):
            raise ValueError(f"delete without old tuple: {marker!r}")
        old, _ = _tuple_data(body, 6)
        return RowChange("DELETE", relid, old, marker.decode(), None)
    if tag == b"T":
        nrels, options = struct.unpack_from(">IB", body, 1)
        relids = list(struct.unpack_from(f">{nrels}I", body, 6))
        return Truncate(relids, bool(options & 1), bool(options & 2))
    if tag in (b"O", b"Y", b"M"):  # origin / type / logical message
        return None
    raise ValueError(f"unknown pgoutput message tag {tag!r}")


# --- message → engine CDC event (reader.go:172-253 semantics) ---------------


class PgoutputDecoder:
    """Stateful stream decoder: tracks the relation registry and the open
    transaction, and emits engine CDC event dicts in the exact JSON shape
    ``WalStreamReader`` replays (streaming/wal_source.py).

    Conversion parity with the reference (``reader.go:195-253``):
    operation I/U/D/T → INSERT/UPDATE/DELETE/TRUNCATE; INSERT carries
    ``after``; UPDATE ``before`` (old/key tuple when the replica identity
    provides one) + ``after``; DELETE ``before``; TRUNCATE no row data.
    ``key_columns`` come from the relation's identity columns; conversion
    failures skip the event rather than failing the stream."""

    def __init__(self) -> None:
        self.relations: dict[int, Relation] = {}
        self._xid: int | None = None
        self._commit_time: datetime | None = None

    def feed(self, frame: bytes) -> Iterator[dict]:
        msg = parse_copy_data(frame)
        if isinstance(msg, Keepalive):
            return  # position-only, matches processWALEvent's nil-data path
        decoded = decode_message(msg.payload)
        if decoded is None:
            return
        if isinstance(decoded, Begin):
            self._xid, self._commit_time = decoded.xid, decoded.commit_time
            return
        if isinstance(decoded, Commit):
            self._xid, self._commit_time = None, None
            return
        if isinstance(decoded, Relation):
            self.relations[decoded.relation_id] = decoded
            return
        if isinstance(decoded, Truncate):
            for relid in decoded.relation_ids:
                ev = self._event_base(msg, relid, "TRUNCATE")
                if ev is not None:
                    yield ev
            return
        ev = self._row_event(msg, decoded)
        if ev is not None:
            yield ev

    # -- helpers -------------------------------------------------------------

    def _event_base(self, msg: XLogData, relid: int, op: str) -> dict | None:
        rel = self.relations.get(relid)
        if rel is None:  # unknown relation: skip, don't fail (reader.go:186)
            return None
        ts = self._commit_time or msg.send_time
        return {
            "id": str(uuid.uuid4()),
            "lsn": lsn_to_text(msg.wal_start),
            "lsn_int": msg.wal_start,
            "transaction_id": self._xid or 0,
            "event_time": ts.replace(tzinfo=None).isoformat(),
            "schema_name": rel.namespace,
            "table_name": rel.name,
            "operation": op,
            "before": None,
            "after": None,
            "key_columns": [c.name for c in rel.columns if c.is_key] or None,
            "metadata": {"commit_position": lsn_to_text(msg.wal_end)},
        }

    def _row_event(self, msg: XLogData, row: RowChange) -> dict | None:
        ev = self._event_base(msg, row.relation_id, row.kind)
        if ev is None:
            return None
        rel = self.relations[row.relation_id]

        def named(values: list | None) -> dict | None:
            if values is None:
                return None
            # unchanged-TOAST (Ellipsis) columns are omitted: the value
            # was not transmitted, same as pgstream's column extraction.
            # Binary-mode columns ('b') surface hex-encoded so events stay
            # JSON-serializable end-to-end (drain_feed_to_wal).
            return {
                c.name: (v.hex() if isinstance(v, bytes) else v)
                for c, v in zip(rel.columns, values)
                if v is not ...
            }

        if row.kind == "INSERT":
            ev["after"] = named(row.new_tuple)
        elif row.kind == "UPDATE":
            ev["before"] = named(row.old_tuple)
            ev["after"] = named(row.new_tuple)
        elif row.kind == "DELETE":
            ev["before"] = named(row.old_tuple)
        return ev


# --- feed interface ----------------------------------------------------------


class ReplicationFeed:
    """Anything that yields CopyData frames and accepts status updates.
    The decode path is identical for canned bytes and a live socket."""

    def frames(self) -> Iterable[bytes]:  # pragma: no cover - interface
        raise NotImplementedError

    def send_status(self, status: bytes) -> None:  # pragma: no cover
        pass


class CannedReplicationFeed(ReplicationFeed):
    """Test/replay feed over pre-recorded protocol frames."""

    def __init__(self, frames: list[bytes]) -> None:
        self._frames = list(frames)
        self.statuses: list[bytes] = []

    def frames(self) -> Iterable[bytes]:
        return iter(self._frames)

    def send_status(self, status: bytes) -> None:
        self.statuses.append(status)


class PgReplicationConnection(ReplicationFeed):
    """Live walsender session over a raw TCP socket — the same COPY-BOTH
    session the reference holds (``reader.go:56-140``), via the stdlib
    wire client in :mod:`philotes_spark.streaming.pgwire`:

        replication=database dbname=<db> user=<user>
        START_REPLICATION SLOT <slot> LOGICAL <lsn>
            (proto_version '1', publication_names '<pub>')

    CopyData payloads stream out of ``frames()`` (ready for
    ``parse_copy_data`` → ``PgoutputDecoder``) and flush positions are
    acked through ``send_status`` wrapped in CopyData — end-to-end from
    bytes-on-a-socket, exercised in tests against a local mock walsender
    (``tests/test_pgwire.py``); cleartext, MD5 and SCRAM-SHA-256 auth are
    all supported by the wire client. Slot creation
    (CREATE_REPLICATION_SLOT, first run) is a plain simple-query on the
    same session kind (``PgWireClient.simple_query``); the opt-in
    live-server E2E is ``tests/test_pg_live.py``."""

    def __init__(
        self, dsn: str, slot: str, publication: str, start_lsn: int = 0
    ) -> None:
        self.dsn, self.slot, self.publication, self.start_lsn = (
            dsn,
            slot,
            publication,
            start_lsn,
        )
        self._client = None

    def _connect(self):
        from philotes_spark.streaming.pgwire import PgWireClient, parse_dsn

        info = parse_dsn(self.dsn)
        client = PgWireClient(
            host=info.get("host", "localhost"),
            port=int(info.get("port", "5432")),
            user=info.get("user", "postgres"),
            database=info.get("dbname", info.get("database", "postgres")),
            password=info.get("password"),
        )
        client.connect()
        client.start_replication(
            self.slot, self.publication, lsn_to_text(self.start_lsn)
        )
        return client

    def frames(self) -> Iterable[bytes]:
        if self._client is None:
            self._client = self._connect()
        try:
            yield from self._client.copy_frames()
        except BaseException:
            self.close()
            raise
        # normal end (CopyDone): keep the session so the caller's final
        # close() can run; further status sends are dropped — the COPY
        # sub-protocol has ended and CopyData is no longer valid.

    def send_status(self, status: bytes) -> None:
        if self._client is not None and not self._client.copy_ended:
            self._client.send_copy(status)

    def close(self) -> None:
        if self._client is not None:
            self._client.close()
            self._client = None


def drain_feed_to_wal(
    feed: ReplicationFeed,
    wal_dir: str,
    segment: str = "wal-pgoutput-000001.jsonl",
    flush_every: int = 100,
) -> tuple[int, int]:
    """Decode a feed into a ``wal-*.jsonl`` segment that the tested
    ``WalStreamReader`` replays into Spark — the glue between the wire
    decoder and the Spark-facing source. Acks the flushed LSN with a
    standby status update every ``flush_every`` events (the reference's
    confirmed-flush cadence). Returns (events_written, last_lsn).

    Idempotent under replay: on open, the segment's current max LSN is
    recovered and events at or below it are skipped, so re-draining a
    feed that replays from an older start position (the normal
    at-least-once case after a crash before the final ack) does not
    append duplicates for ``WalStreamReader`` to re-emit."""
    os.makedirs(wal_dir, exist_ok=True)
    dec = PgoutputDecoder()
    path = os.path.join(wal_dir, segment)
    resume_lsn = 0
    if os.path.exists(path):
        with open(path) as prior:
            for line in prior:
                try:
                    resume_lsn = max(resume_lsn, json.loads(line)["lsn_int"])
                except (ValueError, KeyError):
                    continue  # torn tail line from a crashed writer
    n, last_lsn = 0, resume_lsn
    with open(path, "a") as out:
        for frame in feed.frames():
            for ev in dec.feed(frame):
                last_lsn = max(last_lsn, ev["lsn_int"])
                if ev["lsn_int"] <= resume_lsn:
                    continue  # already durable from a previous drain
                out.write(json.dumps(ev) + "\n")
                n += 1
                if n % flush_every == 0:
                    out.flush()
                    feed.send_status(
                        encode_standby_status(last_lsn, last_lsn, last_lsn)
                    )
    feed.send_status(encode_standby_status(last_lsn, last_lsn, last_lsn))
    return n, last_lsn
