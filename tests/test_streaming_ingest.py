"""E2E streaming-ingest tests (SURVEY §3.1): file-source CDC feed →
normalize → per-table lake write + quarantine, with checkpoint/restart
semantics (exactly-once per file source) and the A23 state machine.
Mirrors what the reference's pipeline/buffer/batch tests cover, but as a
real end-to-end dataflow instead of mocked units.
"""

import datetime as dt
import os

import pytest

from philotes_spark.sources.writer import read_lake_table
from philotes_spark.streaming.ingest import CdcIngestPipeline, IngestConfig, StateMachine
from philotes_spark.streaming.reliability import RetryPolicy, quarantine, retry
from philotes_spark.types import CDC_EVENT_SCHEMA

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _event(i, op="INSERT", table="users", lsn_hi=0, after='{"id": 1}'):
    return (
        f"ev-{i}",
        f"{lsn_hi:X}/{i:X}",
        1000 + i,
        TS + dt.timedelta(minutes=i),
        "public",
        table,
        op,
        None,
        after if op != "DELETE" else None,
        ["id"],
        {"commit_position": str(i)},
    )


def _write_events(spark, path, events, filename_salt):
    df = spark.createDataFrame(events, CDC_EVENT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)
    _ = filename_salt  # parquet part-file names are already unique per write


@pytest.fixture()
def dirs(tmp_path):
    return IngestConfig(
        source_dir=str(tmp_path / "feed"),
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        dlq_dir=str(tmp_path / "dlq"),
    )


def test_ingest_end_to_end(spark, dirs):
    events = [
        _event(1, "INSERT", "users", after='{"id": 1, "name": "a"}'),
        _event(2, "UPDATE", "users", after='{"id": 1, "name": "b"}'),
        _event(3, "INSERT", "orders", after='{"id": 10, "total": 5.5}'),
        _event(4, "DELETE", "users"),
        _event(5, "BOGUS_OP", "users"),  # → quarantine
    ]
    _write_events(spark, dirs.source_dir, events, 1)

    pipe = CdcIngestPipeline(spark, dirs)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    pipe.stop()

    users = read_lake_table(spark, os.path.join(dirs.lake_dir, "public.users"))
    orders = read_lake_table(spark, os.path.join(dirs.lake_dir, "public.orders"))
    assert users.count() == 3  # INSERT + UPDATE + DELETE; bogus quarantined
    assert orders.count() == 1
    # CDC system columns + day partition present
    for c in ("_cdc_operation", "_cdc_timestamp", "_cdc_lsn", "_cdc_lsn_int", "_cdc_date"):
        assert c in users.columns, c
    # partition directory layout: day(_cdc_timestamp)
    assert any(
        p.startswith("_cdc_date=2024-03-01")
        for p in os.listdir(os.path.join(dirs.lake_dir, "public.users"))
    )
    # quarantine captured the bogus op with the DLQ envelope
    dlq = spark.read.parquet(dirs.dlq_dir)
    assert dlq.count() == 1
    row = dlq.collect()[0]
    assert row.error_type == "validation" and "BOGUS_OP" in row.event_data


def test_restart_from_checkpoint_no_duplicates(spark, dirs):
    _write_events(spark, dirs.source_dir, [_event(1), _event(2)], 1)
    pipe = CdcIngestPipeline(spark, dirs)
    q = pipe.start(available_now=True)
    q.awaitTermination(120)
    pipe.stop()

    users_path = os.path.join(dirs.lake_dir, "public.users")
    assert read_lake_table(spark, users_path).count() == 2

    # second feed file arrives while "paused"; restart from checkpoint
    _write_events(spark, dirs.source_dir, [_event(3), _event(4)], 2)
    pipe2 = CdcIngestPipeline(spark, dirs)
    q2 = pipe2.start(available_now=True)
    q2.awaitTermination(120)
    pipe2.stop()

    out = read_lake_table(spark, users_path)
    assert out.count() == 4, "restart must process only the new file — no replays"
    ids = sorted(r.id for r in out.select("id").collect())
    assert ids == ["ev-1", "ev-2", "ev-3", "ev-4"]


def test_schema_evolution_across_batches(spark, dirs):
    # batch 1: {id,name}; batch 2 adds `age` — additive evolution via
    # mergeSchema read (A12). Typed projection happens lake-side.
    _write_events(
        spark, dirs.source_dir, [_event(1, after='{"id": 1, "name": "a"}')], 1
    )
    pipe = CdcIngestPipeline(spark, dirs)
    pipe.start(available_now=True).awaitTermination(120)
    pipe.stop()
    _write_events(
        spark,
        dirs.source_dir,
        [_event(2, after='{"id": 2, "name": "b", "age": 30}')],
        2,
    )
    pipe2 = CdcIngestPipeline(spark, dirs)
    pipe2.start(available_now=True).awaitTermination(120)
    pipe2.stop()

    users = read_lake_table(spark, os.path.join(dirs.lake_dir, "public.users"))
    assert users.count() == 2
    # payload is carried as JSON in flight; both payload versions landed
    afters = sorted(r.after for r in users.select("after").collect())
    assert '"age": 30' in afters[1]


def test_metrics_listener_counts(spark, dirs):
    _write_events(spark, dirs.source_dir, [_event(i) for i in range(1, 6)], 1)
    pipe = CdcIngestPipeline(spark, dirs)
    pipe.start(available_now=True).awaitTermination(120)
    # listener is async; poll briefly
    import time

    for _ in range(40):
        if pipe.listener.metrics.events_total >= 5:
            break
        time.sleep(0.25)
    pipe.stop()
    m = pipe.listener.metrics
    assert m.events_total >= 5 and m.batches_total >= 1
    assert pipe.health()["state"] == "stopped"


# --- A23 state machine ------------------------------------------------------


def test_state_machine_valid_path():
    sm = StateMachine()
    for s in ("starting", "running", "paused", "running", "stopping", "stopped"):
        sm.transition(s)
    assert sm.state == "stopped"


def test_state_machine_rejects_invalid():
    sm = StateMachine()
    with pytest.raises(ValueError, match="invalid transition"):
        sm.transition("paused")  # stopped → paused is not a legal edge
    with pytest.raises(ValueError, match="unknown state"):
        sm.transition("warp")


def test_can_process_gate():
    sm = StateMachine()
    assert not sm.can_process()
    sm.transition("starting")
    sm.transition("running")
    assert sm.can_process()


# --- A20 retry --------------------------------------------------------------


def test_retry_succeeds_after_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    policy = RetryPolicy(max_attempts=3, initial_backoff=0.01, max_backoff=0.02)
    assert retry(flaky, policy, seed=7) == "ok"
    assert len(calls) == 3


def test_retry_exhausts_and_raises():
    def always_fails():
        raise RuntimeError("permanent")

    policy = RetryPolicy(max_attempts=2, initial_backoff=0.01, max_backoff=0.02)
    with pytest.raises(RuntimeError, match="permanent"):
        retry(always_fails, policy, seed=7)


def test_backoff_bounds():
    import random

    policy = RetryPolicy()
    rng = random.Random(42)
    for attempt in range(5):
        b = policy.backoff(attempt, rng)
        base = min(policy.initial_backoff * policy.multiplier**attempt, 30.0)
        assert base * 0.75 <= b <= base * 1.25


# --- A21 quarantine envelope -------------------------------------------------


def test_quarantine_envelope(spark):
    df = spark.createDataFrame([("e1", "BAD")], ["id", "operation"])
    out = quarantine(df, "bad op", "validation").collect()[0]
    assert out.error_message == "bad op"
    assert out.retry_count == 0
    assert (out.expires_at - out.created_at).days == 7
    assert '"operation":"BAD"' in out.event_data


def test_quarantine_rejects_unknown_class(spark):
    df = spark.createDataFrame([("e1",)], ["id"])
    with pytest.raises(ValueError):
        quarantine(df, "x", "catastrophic")
