"""Depth E2E for the WAL chain (VERDICT r02 #5): pgoutput-shaped WAL
segments → ``read_wal_stream`` (custom DataSourceStreamReader) →
normalize → per-table fan-out writer → snapshot table → latest_view,
with a crash injected mid-stream and a restart from checkpoint.

The correctness oracle is plain Python over the same event list: exact
event count (no loss, no duplication across the kill) and the exact
latest-state map per key.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from philotes_spark.operators.cdc import latest_view
from philotes_spark.sources.snapshots import SnapshotTable
from philotes_spark.sources.writer import read_lake_table, write_batch_per_table
from philotes_spark.streaming.wal_source import read_wal_stream

N_KEYS = 20
N_EVENTS = 120  # several versions per key


def _events():
    """INSERT/UPDATE stream over N_KEYS user rows, one LSN apart."""
    evs = []
    for i in range(1, N_EVENTS + 1):
        key = i % N_KEYS
        evs.append(
            {
                "id": f"ev-{i}",
                "lsn": f"0/{i:X}",
                "lsn_int": i,
                "transaction_id": 7,
                "event_time": f"2024-03-01T12:{i // 60:02d}:{i % 60:02d}",
                "schema_name": "public",
                "table_name": "users",
                "operation": "INSERT" if i <= N_KEYS else "UPDATE",
                "before": None,
                "after": {"id": key, "name": f"v{i}"},
                "key_columns": ["id"],
                "metadata": {"commit_position": str(i)},
            }
        )
    return evs


def _write_segments(wal_dir, evs, per_segment=40):
    os.makedirs(wal_dir, exist_ok=True)
    for s in range(0, len(evs), per_segment):
        with open(os.path.join(wal_dir, f"wal-{s // per_segment:06d}.jsonl"), "w") as f:
            for e in evs[s : s + per_segment]:
                f.write(json.dumps(e) + "\n")


class _CrashOnce(Exception):
    pass


def _count(spark, path) -> int:
    """Lake row count, tolerant of a mid-write directory (no files yet)."""
    if not os.path.isdir(path):
        return -1
    try:
        return read_lake_table(spark, path).count()
    except Exception:
        return -1


def test_wal_chain_with_midstream_kill_and_restart(spark, tmp_path):
    from philotes_spark.streaming.ingest import CdcIngestPipeline

    wal_dir, lake_dir = str(tmp_path / "wal"), str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    evs = _events()
    # present only the first 80 events; the last segment arrives mid-stream
    _write_segments(wal_dir, evs[:80])

    crashed = {"done": False}
    LATE_LSN = 80

    def crashing_sink(batch_df, epoch_id):
        norm = CdcIngestPipeline.normalize(batch_df)
        late = batch_df.filter(F.col("id").isin([f"ev-{i}" for i in range(81, 121)]))
        if not crashed["done"] and late.take(1):
            # crash BEFORE writing the batch that carries the late segment:
            # the failed epoch re-runs whole on restart — the
            # no-loss/no-duplication contract under test
            crashed["done"] = True
            raise _CrashOnce(f"injected crash at epoch {epoch_id}")
        write_batch_per_table(norm, lake_dir)

    import time

    q = (
        read_wal_stream(spark, wal_dir)
        .writeStream.foreachBatch(crashing_sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    users_path = os.path.join(lake_dir, "public.users")
    # wait for epoch 0 (the 80-event catch-up) to commit
    for _ in range(120):
        if _count(spark, users_path) >= 80:
            break
        time.sleep(0.5)
    assert _count(spark, users_path) == 80

    # late segment lands while the query is running → next epoch crashes
    _write_segments(wal_dir, evs)  # rewrites first two + adds wal-000002
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)
        raise AssertionError("query should have failed on the injected crash")
    assert crashed["done"], "crash must have fired mid-stream"
    assert _count(spark, users_path) == 80, "failed epoch must not have written"

    # phase 2: restart from the same checkpoint — the engine replays the
    # failed epoch and continues; nothing is lost, nothing duplicated
    q2 = (
        read_wal_stream(spark, wal_dir)
        .writeStream.foreachBatch(
            lambda df, _e: write_batch_per_table(
                CdcIngestPipeline.normalize(df), lake_dir
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    for _ in range(120):
        if _count(spark, users_path) >= N_EVENTS:
            break
        time.sleep(0.5)
    q2.stop()

    users = read_lake_table(spark, os.path.join(lake_dir, "public.users"))
    assert users.count() == N_EVENTS, "exact count across kill/restart"
    ids = [r.id for r in users.select("id").collect()]
    assert len(set(ids)) == N_EVENTS, "no duplicated events"

    # chain into the snapshot table (A17) and serve the B10 latest view
    snap_path = str(tmp_path / "snap_users")
    tbl = SnapshotTable(spark, snap_path)
    version = tbl.commit(users, operation="append")
    assert version == 1

    latest = latest_view(
        tbl.read(version=1).withColumn(
            "key", F.get_json_object("after", "$.id").cast("int")
        ),
        key_cols=["key"],
        order_cols=[F.col("_cdc_lsn_int")],
    )
    got = {
        r.key: json.loads(r.after)["name"]
        for r in latest.select("key", "after").collect()
    }

    # python oracle: last write per key
    expect = {}
    for e in _events():
        expect[e["after"]["id"]] = e["after"]["name"]
    assert got == expect, "latest-state map must match the event-log oracle"


def test_wal_chain_clean_run_matches_oracle_count(spark, tmp_path):
    """Control run (no kill): same chain, same oracle."""
    from philotes_spark.streaming.ingest import CdcIngestPipeline

    wal_dir, lake_dir = str(tmp_path / "wal"), str(tmp_path / "lake")
    evs = _events()[:40]
    _write_segments(wal_dir, evs)

    q = (
        read_wal_stream(spark, wal_dir)
        .writeStream.foreachBatch(
            lambda df, _e: write_batch_per_table(
                CdcIngestPipeline.normalize(df), lake_dir
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    users = read_lake_table(spark, os.path.join(lake_dir, "public.users"))
    assert users.count() == 40
