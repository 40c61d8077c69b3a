"""Minimal Apache Avro binary codec + Object Container File (OCF)
reader/writer, stdlib only.

Iceberg's interop contract stores manifest lists and manifest files as
Avro OCFs (Iceberg table spec, "Manifests"; Avro 1.11 spec, "Object
Container Files") — an external reader (pyiceberg / Trino / Spark's
Iceberg runtime) loads a table by decoding exactly these files, so the
REST publish path needs a real Avro writer, not a JSON stand-in. This
module implements the subset of Avro the two Iceberg manifest schemas
need — null/boolean/int/long/float/double/bytes/string, records,
arrays, maps, unions, fixed — from the public specification. Reference
parity: the reference serializes the same structures through its Go
Avro dependency (`internal/iceberg/types.go:77-93`).

Scale note: manifests are metadata (KBs per thousands of data files);
encode/decode runs driver-side at commit/publish, never in a Spark job.
"""

from __future__ import annotations

import io
import json
import os
import struct

MAGIC = b"Obj\x01"


# --- primitive encoders -------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("unexpected end of avro data")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated avro bytes")
    return data


# --- schema-driven value codec ------------------------------------------------


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def encode(buf: io.BytesIO, schema, value) -> None:
    """Encode ``value`` per ``schema`` (parsed Avro schema JSON)."""
    t = _type_name(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                write_long(buf, i)
                encode(buf, branch, value)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema}")
    if t == "null":
        if value is not None:
            raise ValueError(f"non-null {value!r} for null schema")
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError(f"fixed size {len(data)} != {schema['size']}")
        buf.write(data)
    elif t == "record":
        for f in schema["fields"]:
            try:
                encode(buf, f["type"], value[f["name"]])
            except KeyError:
                raise ValueError(
                    f"record value missing field {f['name']!r}"
                ) from None
    elif t == "array":
        items = list(value)
        if items:
            write_long(buf, len(items))
            for it in items:
                encode(buf, schema["items"], it)
        write_long(buf, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, k.encode("utf-8"))
                encode(buf, schema["values"], v)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def _matches(branch, value) -> bool:
    t = _type_name(branch)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    return False


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    """Read exactly ``n`` bytes or raise — a truncated manifest must fail
    loudly, never decode to short bytes / garbage structs (ADVICE r07:
    the fixed/float/double/boolean paths tolerated short reads)."""
    data = buf.read(n)
    if len(data) != n:
        raise EOFError(f"truncated avro data: wanted {n} bytes, got {len(data)}")
    return data


def decode(buf: io.BytesIO, schema):
    """Decode one value per ``schema``; records come back as dicts."""
    t = _type_name(schema)
    if t == "union":
        return decode(buf, schema[read_long(buf)])
    if t == "null":
        return None
    if t == "boolean":
        return _read_exact(buf, 1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", _read_exact(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _read_exact(buf, 8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return _read_exact(buf, schema["size"])
    if t == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode(buf, schema["values"])
    raise ValueError(f"unsupported avro type {t!r}")


# --- Object Container File ----------------------------------------------------


def write_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
) -> int:
    """Write an Avro OCF (null codec): magic, file-metadata map
    (``avro.schema`` + ``avro.codec`` + caller extras — Iceberg stores
    its own table schema / partition spec / format-version here), a
    random-ish but deterministic sync marker, and one data block.
    Returns the file length in bytes (Iceberg manifest-list entries
    carry ``manifest_length``)."""
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    # deterministic per-path sync marker (content-addressed files would
    # also do); uniqueness across files is what block resyncing needs
    import hashlib

    sync = hashlib.md5(path.encode() + b"philotes-avro").digest()
    buf = io.BytesIO()
    buf.write(MAGIC)
    write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode())
        _write_bytes(buf, v)
    write_long(buf, 0)
    buf.write(sync)
    block = io.BytesIO()
    for rec in records:
        encode(block, schema, rec)
    payload = block.getvalue()
    if records:
        write_long(buf, len(records))
        write_long(buf, len(payload))
        buf.write(payload)
        buf.write(sync)
    data = buf.getvalue()
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)
    return len(data)


def read_ocf(path: str) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Read an Avro OCF → (writer schema, file metadata, records)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    sync = _read_exact(buf, 16)  # a file cut mid-marker must not read as empty
    records: list[dict] = []
    while True:
        try:
            count = read_long(buf)
        except EOFError:
            break
        size = read_long(buf)
        payload = _read_exact(buf, size)
        if codec == b"deflate":
            import zlib

            payload = zlib.decompress(payload, -15)
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(decode(block, schema))
        if _read_exact(buf, 16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
