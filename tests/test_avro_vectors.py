"""External validation of the stdlib Avro codec against hand-derived
byte vectors from the Apache Avro 1.11 specification, plus truncation
hardening (VERDICT r07 next-round #6/#7, ADVICE r07 #3).

The round-trip tests elsewhere decode with the engine's own reader —
self-referential. These vectors are constructed BY HAND from the public
spec (the binary-encoding worked example, and an Object Container File
laid out field-by-field per the "Object Container Files" section), so a
codec bug that is symmetric in encode/decode cannot hide.
"""

from __future__ import annotations

import io
import json

import pytest


# --- the Avro spec's binary-encoding worked example ---------------------------
# Spec, "Binary Encoding > Complex Types > Records": the record schema
#   {"type":"record","name":"test","fields":
#     [{"name":"a","type":"long"},{"name":"b","type":"string"}]}
# with value {"a": 27, "b": "foo"} "would be encoded as the bytes
# 36 06 66 6f 6f" (zigzag(27)=0x36; len("foo")=3 -> zigzag 0x06; UTF-8).
SPEC_RECORD_SCHEMA = {
    "type": "record",
    "name": "test",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": "string"},
    ],
}
SPEC_RECORD_VALUE = {"a": 27, "b": "foo"}
SPEC_RECORD_BYTES = bytes.fromhex("360666 6f6f".replace(" ", ""))


def test_spec_worked_example_encodes_byte_exact():
    from philotes_spark.sources.avro import encode

    buf = io.BytesIO()
    encode(buf, SPEC_RECORD_SCHEMA, SPEC_RECORD_VALUE)
    assert buf.getvalue() == SPEC_RECORD_BYTES


def test_spec_worked_example_decodes():
    from philotes_spark.sources.avro import decode

    got = decode(io.BytesIO(SPEC_RECORD_BYTES), SPEC_RECORD_SCHEMA)
    assert got == SPEC_RECORD_VALUE


# --- a hand-built Object Container File ---------------------------------------


def _hand_built_ocf() -> bytes:
    """An OCF assembled field-by-field per the spec's file layout —
    NOT via write_ocf — carrying two records of the spec example schema:
    {"a": 27, "b": "foo"} and {"a": -2, "b": "hi"}."""
    schema_json = json.dumps(SPEC_RECORD_SCHEMA).encode()

    def vlong(n: int) -> bytes:  # independent zigzag-varint, spec formula
        z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n) * 2) - 1
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    sync = b"0123456789abcdef"  # any 16 bytes
    out = bytearray()
    out += b"Obj\x01"  # magic
    out += vlong(2)  # file-metadata map: one block of 2 entries
    out += vlong(len(b"avro.schema")) + b"avro.schema"
    out += vlong(len(schema_json)) + schema_json
    out += vlong(len(b"avro.codec")) + b"avro.codec"
    out += vlong(4) + b"null"
    out += vlong(0)  # map terminator
    out += sync
    # one data block: count=2, byte size, payload, sync
    payload = (
        bytes.fromhex("36")  # a=27
        + bytes.fromhex("06") + b"foo"  # b="foo"
        + bytes.fromhex("03")  # a=-2 (zigzag 3)
        + bytes.fromhex("04") + b"hi"  # b="hi"
    )
    out += vlong(2) + vlong(len(payload)) + payload + sync
    return bytes(out)


def test_hand_built_ocf_decodes(tmp_path):
    from philotes_spark.sources.avro import read_ocf

    path = tmp_path / "vector.avro"
    path.write_bytes(_hand_built_ocf())
    schema, meta, records = read_ocf(str(path))
    assert schema == SPEC_RECORD_SCHEMA
    assert meta["avro.codec"] == b"null"
    assert records == [{"a": 27, "b": "foo"}, {"a": -2, "b": "hi"}]


def test_own_writer_output_matches_hand_layout(tmp_path):
    """write_ocf's bytes, parsed by the same field-by-field walk used to
    BUILD the vector above (magic, metadata map, sync, block framing) —
    asserts our writer follows the spec layout, not just that our reader
    can read our writer."""
    from philotes_spark.sources.avro import write_ocf

    path = str(tmp_path / "ours.avro")
    write_ocf(
        path, SPEC_RECORD_SCHEMA,
        [{"a": 27, "b": "foo"}, {"a": -2, "b": "hi"}],
    )
    raw = open(path, "rb").read()
    assert raw[:4] == b"Obj\x01"
    buf = io.BytesIO(raw[4:])

    def rlong() -> int:
        shift = acc = 0
        while True:
            b = buf.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return (acc >> 1) ^ -(acc & 1)
            shift += 7

    meta = {}
    n = rlong()
    while n:
        for _ in range(abs(n)):
            k = buf.read(rlong()).decode()
            meta[k] = buf.read(rlong())
        n = rlong()
    assert json.loads(meta["avro.schema"]) == SPEC_RECORD_SCHEMA
    assert meta["avro.codec"] == b"null"
    sync = buf.read(16)
    assert rlong() == 2  # block record count
    size = rlong()
    payload = buf.read(size)
    assert payload == (
        b"\x36\x06foo" + b"\x03\x04hi"
    )
    assert buf.read(16) == sync
    assert buf.read() == b""  # nothing after the last block


# --- truncation hardening ------------------------------------------------------


TRUNC_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "fx", "type": {"type": "fixed", "name": "fx8", "size": 8}},
        {"name": "s", "type": "string"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "opt", "type": ["null", "long"]},
    ],
}
TRUNC_VALUE = {
    "l": 300, "f": 1.5, "d": -2.25, "flag": True, "fx": b"12345678",
    "s": "hé", "arr": [1, -1, 64], "opt": 7,
}


def test_every_strict_prefix_raises():
    """Truncating an encoded record at ANY byte offset must raise a clean
    EOFError — never return short bytes or garbage structs (ADVICE r07:
    boolean/float/double/fixed tolerated short reads)."""
    from philotes_spark.sources.avro import decode, encode

    buf = io.BytesIO()
    encode(buf, TRUNC_SCHEMA, TRUNC_VALUE)
    full = buf.getvalue()
    # sanity: the full encoding still decodes
    assert decode(io.BytesIO(full), TRUNC_SCHEMA)["l"] == 300
    for cut in range(len(full)):
        with pytest.raises(EOFError):
            decode(io.BytesIO(full[:cut]), TRUNC_SCHEMA)


def test_truncated_ocf_raises(tmp_path):
    """An OCF cut anywhere inside its data block must fail loudly."""
    from philotes_spark.sources.avro import read_ocf, write_ocf

    path = str(tmp_path / "t.avro")
    write_ocf(path, TRUNC_SCHEMA, [TRUNC_VALUE, TRUNC_VALUE])
    full = open(path, "rb").read()
    # find where the single data block starts: after metadata + 16-byte sync
    # (the block is count + size + payload + sync = the last section)
    for frac in (0.99, 0.9, 0.7):
        cut = int(len(full) * frac)
        trunc_path = str(tmp_path / f"cut{cut}.avro")
        open(trunc_path, "wb").write(full[:cut])
        with pytest.raises((EOFError, ValueError)):
            read_ocf(trunc_path)
