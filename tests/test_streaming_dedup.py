"""dedup_stream (dropDuplicatesWithinWatermark) E2E, beyond the
stream-equals-batch check in test_streaming_windows.py: redeliveries inside the watermark
horizon are dropped (across micro-batches, through the checkpoint), and
a redelivery after the key's state expired re-emits — the documented
at-least-once tail that makes the state bound honest.
"""

import datetime as dt

import pytest

from philotes_spark.streaming.windows import dedup_stream

T0 = dt.datetime(2024, 5, 1, 10, 0, 0)

SCHEMA = "event_id long, ts timestamp, value double"


def _run(spark, feed_dir, ckpt):
    rows: list = []
    stream = spark.readStream.schema(SCHEMA).parquet(feed_dir)
    q = (
        dedup_stream(stream, ["event_id"], ts_col="ts", watermark="60 seconds")
        .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    return [(r.event_id, r.value) for r in rows]


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    return (
        str(tmp_path_factory.mktemp("dedupfeed")),
        str(tmp_path_factory.mktemp("dedupckpt")),
    )


def test_in_batch_duplicates_collapse(spark, dirs):
    feed, ckpt = dirs
    batch1 = [
        (1, T0, 1.0),
        (1, T0 + dt.timedelta(seconds=5), 1.5),  # same key, within horizon
        (2, T0 + dt.timedelta(seconds=10), 2.0),
    ]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(
        feed, mode="append"
    )
    got = _run(spark, feed, ckpt)
    assert sorted(got) == [(1, 1.0), (2, 2.0)], "first copy wins, dup dropped"


def test_cross_batch_redelivery_dropped_then_expired_reemits(spark, dirs):
    feed, ckpt = dirs
    # run 2: redelivery of key 2 while its state is live → dropped; a new
    # event far in the future advances the watermark past every old key
    batch2 = [
        (2, T0 + dt.timedelta(seconds=10), 2.0),  # redelivery, state live
        (3, T0 + dt.timedelta(seconds=600), 3.0),  # advances watermark
    ]
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(
        feed, mode="append"
    )
    got = _run(spark, feed, ckpt)
    assert sorted(got) == [(3, 3.0)], "live-state redelivery must drop"

    # run 3: watermark is now T0+600-60s, far past key 1's expiry → its
    # state is gone; a redelivery re-emits (the at-least-once tail the
    # bounded state buys — asserting it keeps the bound honest)
    batch3 = [(1, T0 + dt.timedelta(seconds=601), 9.0)]
    spark.createDataFrame(batch3, SCHEMA).coalesce(1).write.parquet(
        feed, mode="append"
    )
    got = _run(spark, feed, ckpt)
    assert got == [(1, 9.0)], "expired key redelivery re-emits"


def test_batch_twin_is_plain_distinct(spark):
    df = spark.createDataFrame(
        [(1, T0, 1.0), (1, T0 + dt.timedelta(seconds=5), 1.5), (2, T0, 2.0)],
        SCHEMA,
    )
    out = dedup_stream(df, ["event_id"])
    assert out.count() == 2
    assert not out.isStreaming
