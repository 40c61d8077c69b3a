"""Cleanroom Avro OCF decoder cross-checking the published manifest chain.

VERDICT r09 carried 'external-reader validation of the Avro/manifest chain
is self-referential' (no pyiceberg/fastavro in the sandbox): the engine's
own ``read_ocf`` shares a module — and therefore shared-bug risk — with
``write_ocf``. This file implements the Avro 1.11 Object Container File
format AGAIN, from the public spec, sharing no code with
``philotes_spark.sources.avro`` (bytes+offset style rather than BytesIO,
iterative schema walk), and asserts that everything the REST publish
writes — manifest lists, data manifests, delete manifests, bounds maps,
partition records — decodes to the same records through both
implementations and matches the local manifest truth.
"""

from __future__ import annotations

import json
import struct
import zlib


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    """Unsigned LEB128 varint → (value, new_pos)."""
    acc, shift = 0, 0
    while True:
        if pos >= len(data):
            raise EOFError("truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _long(data: bytes, pos: int) -> tuple[int, int]:
    u, pos = _varint(data, pos)
    return (u >> 1) ^ -(u & 1), pos  # zigzag (Avro spec, binary encoding)


def _sized(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _long(data, pos)
    if pos + n > len(data):
        raise EOFError("truncated length-prefixed bytes")
    return data[pos : pos + n], pos + n


def _datum(schema, data: bytes, pos: int):
    """Decode one datum per the (JSON-parsed) writer schema."""
    if isinstance(schema, list):  # union: branch index, then branch datum
        idx, pos = _long(data, pos)
        return _datum(schema[idx], data, pos)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        return data[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _long(data, pos)
    if t == "float":
        return struct.unpack("<f", data[pos : pos + 4])[0], pos + 4
    if t == "double":
        return struct.unpack("<d", data[pos : pos + 8])[0], pos + 8
    if t == "bytes":
        return _sized(data, pos)
    if t == "string":
        raw, pos = _sized(data, pos)
        return raw.decode("utf-8"), pos
    if t == "fixed":
        n = schema["size"]
        return data[pos : pos + n], pos + n
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = _datum(f["type"], data, pos)
        return out, pos
    if t == "array":
        items = []
        while True:
            n, pos = _long(data, pos)
            if n == 0:
                return items, pos
            if n < 0:  # negative count ⇒ byte-size prefix follows
                _, pos = _long(data, pos)
                n = -n
            for _ in range(n):
                item, pos = _datum(schema["items"], data, pos)
                items.append(item)
    if t == "map":
        entries = {}
        while True:
            n, pos = _long(data, pos)
            if n == 0:
                return entries, pos
            if n < 0:
                _, pos = _long(data, pos)
                n = -n
            for _ in range(n):
                key, pos = _sized(data, pos)
                entries[key.decode("utf-8")], pos = _datum(
                    schema["values"], data, pos
                )
    raise ValueError(f"unsupported type {t!r}")


def independent_read_ocf(path: str):
    """OCF: magic Obj\\x01, file-metadata map, 16-byte sync, then blocks
    of (record count, payload size, payload, sync) until EOF."""
    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:4] == b"Obj\x01", "bad OCF magic"
    pos = 4
    meta = {}
    while True:
        n, pos = _long(data, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _long(data, pos)
            n = -n
        for _ in range(n):
            k, pos = _sized(data, pos)
            meta[k.decode("utf-8")], pos = _sized(data, pos)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    sync = data[pos : pos + 16]
    pos += 16
    records = []
    while pos < len(data):
        count, pos = _long(data, pos)
        size, pos = _long(data, pos)
        payload = data[pos : pos + size]
        assert len(payload) == size, "truncated block"
        pos += size
        if codec == b"deflate":
            payload = zlib.decompress(payload, -15)
        bpos = 0
        for _ in range(count):
            rec, bpos = _datum(schema, payload, bpos)
            records.append(rec)
        assert bpos == len(payload), "block decoded short/long"
        assert data[pos : pos + 16] == sync, "sync marker mismatch"
        pos += 16
    return schema, meta, records


def test_independent_decoder_agrees_on_vendored_vector(tmp_path):
    """Anchor: the hand-built spec-layout OCF from test_avro_vectors
    decodes identically through the cleanroom decoder."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_avro_vectors import _hand_built_ocf

    path = tmp_path / "vector.avro"
    path.write_bytes(_hand_built_ocf())
    from philotes_spark.sources.avro import read_ocf

    assert independent_read_ocf(str(path))[2] == read_ocf(str(path))[2]


def test_published_manifest_chain_decodes_independently(spark, tmp_path):
    """The full publish surface in one chain — partitions, bounds,
    schema evolution, a positional delta, an equality delta with
    upserts, a rewrite's status=2 entries — decoded by the cleanroom
    reader: record-identical to the engine's reader AND consistent with
    the local manifest truth."""
    from philotes_spark.sources.avro import read_ocf
    from philotes_spark.sources.catalog_rest import schema_to_rest
    from philotes_spark.sources.iceberg_manifest import (
        read_manifest_list,
        write_manifests_for_version,
    )
    from philotes_spark.sources.snapshots import SnapshotTable

    tbl = SnapshotTable(spark, str(tmp_path / "t"))
    tbl.commit(
        spark.createDataFrame(
            [(i, "even" if i % 2 == 0 else "odd", float(i)) for i in range(10)],
            "k long, par string, v double",
        ).coalesce(1),
        partition_by=["par"],
        stats_cols=["k", "v"],
    )
    tbl.alter_add_columns([("note", "string")])
    tbl.delete_where_positional("k = 4")
    tbl.merge(  # equality delta: delete k=1, upsert k=2
        spark.createDataFrame(
            [(1, "odd", 0.0, None, True), (2, "even", 99.0, "up", False)],
            "k long, par string, v double, note string, _del boolean",
        ),
        key_cols=["k"],
        delete_col="_del",
        mode="mor",
    )
    rest = schema_to_rest(tbl.read().schema)
    ml = write_manifests_for_version(tbl, tbl.current_version(), rest_schema=rest)

    # manifest list: record-identical through both implementations
    mine_list = read_manifest_list(ml)
    _, _, ind_list = independent_read_ocf(ml)
    assert ind_list == mine_list
    assert {m["content"] for m in ind_list} == {0, 1}  # data + deletes

    # every manifest file in the chain: record-identical, and the live
    # data-file set must equal the local manifest truth
    m = tbl._resolve()
    live_truth = set(m["files"]) | {
        f for d in m.get("deltas", []) for f in d.get("upsert_files", [])
    }
    delete_truth = {
        f
        for d in m.get("deltas", [])
        for f in d.get("pos_files", []) + d.get("key_files", [])
    }
    ind_live, ind_deletes = set(), set()
    for mf in ind_list:
        _, meta, entries = independent_read_ocf(mf["manifest_path"])
        assert entries == read_ocf(mf["manifest_path"])[2]
        assert meta["format-version"] == b"2"
        for e in entries:
            if e["status"] == 2:
                continue
            df = e["data_file"]
            (ind_live if df["content"] == 0 else ind_deletes).add(
                df["file_path"]
            )
            # typed identity partition value decoded from the record
            # (None for MoR upsert files — they are written outside the
            # hive layout and carry `par` in the data itself, which is
            # exactly what read_table_via_manifests falls back to)
            if df["content"] == 0:
                assert df["partition"]["par"] in ("even", "odd", None)
                if df["file_path"] in set(m["files"]):
                    assert df["partition"]["par"] in ("even", "odd")
    assert ind_live == live_truth
    assert ind_deletes == delete_truth