"""Streaming window/dedup tests: run each operator BOTH as a real
Structured Streaming query (file source → memory sink, availableNow) and
in batch mode, asserting the two agree — that equivalence is how Spark
defines event-time window semantics.
"""

import datetime as dt

import pytest

from philotes_spark.streaming.windows import (
    dedup_stream,
    sessionized_counts,
    windowed_counts,
)

T0 = dt.datetime(2024, 5, 1, 10, 0, 0)

ROWS = [
    # (event_id, ts, user_id, event_type, value)
    (1, T0 + dt.timedelta(seconds=10), 7, "click", 1.0),
    (2, T0 + dt.timedelta(seconds=40), 7, "click", 2.0),
    (3, T0 + dt.timedelta(seconds=70), 8, "view", 3.0),
    (4, T0 + dt.timedelta(seconds=200), 7, "click", 4.0),
    (5, T0 + dt.timedelta(seconds=200), 7, "click", 4.0),  # dup payload, new id
    (2, T0 + dt.timedelta(seconds=40), 7, "click", 2.0),  # exact redelivery
]

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


@pytest.fixture(scope="module")
def feed_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("winfeed"))
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(d, mode="append")
    return d


def _run_stream(spark, feed_dir, transform, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(feed_dir)
    out = transform(stream)
    name = f"win_{abs(hash(ckpt)) % 10**8}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if "dedup" in ckpt else "complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    return spark.table(name).collect()


def test_windowed_counts_stream_equals_batch(spark, feed_dir, tmp_path):
    batch = windowed_counts(spark.createDataFrame(ROWS, SCHEMA)).collect()
    stream = _run_stream(
        spark, feed_dir, lambda s: windowed_counts(s), str(tmp_path / "c1")
    )
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))
    # sanity on content: first minute has 3 click events (incl. redelivery)
    m = {
        (r.window_start, r.event_type): (r.n, r.total_value) for r in batch
    }
    assert m[(T0, "click")] == (3, 5.0)


def test_sliding_windows_overlap(spark):
    out = windowed_counts(
        spark.createDataFrame(ROWS, SCHEMA), window="2 minutes", slide="1 minute"
    ).collect()
    # an event belongs to window_len/slide = 2 overlapping windows
    clicks = [r for r in out if r.event_type == "click"]
    assert sum(r.n for r in clicks) == 2 * 5  # 5 click rows, 2 windows each


def test_sessionized_counts_stream_equals_batch(spark, feed_dir, tmp_path):
    batch = sessionized_counts(spark.createDataFrame(ROWS, SCHEMA), gap="1 minute").collect()
    stream = _run_stream(
        spark,
        feed_dir,
        lambda s: sessionized_counts(s, gap="1 minute"),
        str(tmp_path / "c2"),
    )
    assert sorted(map(tuple, stream)) == sorted(map(tuple, batch))
    by_user = {}
    for r in batch:
        by_user.setdefault(r.user_id, []).append(r)
    # user 7: events at 10s/40s merge into one session; 200s starts another
    assert len(by_user[7]) == 2
    assert {r.n for r in by_user[7]} == {3, 2}


def test_dedup_stream_drops_redelivery(spark, feed_dir, tmp_path):
    rows = _run_stream(
        spark,
        feed_dir,
        lambda s: dedup_stream(s, ["event_id"], watermark="10 minutes"),
        str(tmp_path / "c3_dedup"),
    )
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3, 4, 5], "exact redelivery of id=2 must collapse"


# --- stream-stream interval join (attribution shape) -------------------------

CLICKS = [
    (7, T0 + dt.timedelta(minutes=0), "c1"),
    (7, T0 + dt.timedelta(minutes=30), "c2"),
    (8, T0 + dt.timedelta(minutes=5), "c3"),
    (9, T0 + dt.timedelta(minutes=0), "c4"),  # user with no purchase
]
PURCHASES = [
    (7, T0 + dt.timedelta(minutes=45), "p1"),  # attributes to c1(45m) + c2(15m)
    (8, T0 + dt.timedelta(minutes=90), "p2"),  # c3 is 85m back → outside 1h
]
C_SCHEMA = "user_id long, l_ts timestamp, click_id string"
P_SCHEMA = "user_id long, r_ts timestamp, purchase_id string"


def test_interval_join_stream_equals_batch(spark, tmp_path):
    from philotes_spark.streaming.windows import interval_join

    cdir, pdir = str(tmp_path / "clicks"), str(tmp_path / "purch")
    spark.createDataFrame(CLICKS, C_SCHEMA).coalesce(1).write.parquet(cdir)
    spark.createDataFrame(PURCHASES, P_SCHEMA).coalesce(1).write.parquet(pdir)

    batch = interval_join(
        spark.read.parquet(cdir), spark.read.parquet(pdir), "user_id"
    ).select("click_id", "purchase_id")
    got_batch = sorted(map(tuple, batch.collect()))
    # c1 and c2 both precede p1 within 1h; c3 is 85 minutes before p2
    assert got_batch == [("c1", "p1"), ("c2", "p1")]

    joined = interval_join(
        spark.readStream.schema(C_SCHEMA).parquet(cdir),
        spark.readStream.schema(P_SCHEMA).parquet(pdir),
        "user_id",
    ).select("click_id", "purchase_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got_stream = sorted(map(tuple, spark.table("attr_join").collect()))
    assert got_stream == got_batch, "stream-stream join must equal batch"


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a streaming fact feed enriched against a
    static dimension — the dim is re-read per micro-batch (always
    current) and broadcast-sized; no stream-side state is kept."""
    import datetime as dt

    from pyspark.sql import functions as F

    feed = str(tmp_path / "feed")
    t0 = dt.datetime(2024, 5, 1)
    spark.createDataFrame(
        [(1, t0, 7), (2, t0, 8), (3, t0, 9)],
        "event_id long, ts timestamp, user_id long",
    ).coalesce(1).write.parquet(feed)
    dim = spark.createDataFrame(
        [(7, "gold"), (8, "basic")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long"
    ).parquet(feed)
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {r.event_id: r.tier for r in spark.table("enrich").collect()}
    assert got == {1: "gold", 2: "basic", 3: None}


def test_interval_left_outer_join_emits_unmatched_after_watermark(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: a left row with no match
    emits (left, null) only once the watermark passes its join horizon —
    the subtle half of Spark's stream-stream join semantics."""
    import datetime as dt

    from pyspark.sql import functions as F

    cdir, pdir = str(tmp_path / "lo_clicks"), str(tmp_path / "lo_purch")
    t0 = T0
    c1 = [(7, t0, "c1"), (9, t0 + dt.timedelta(minutes=2), "c4")]
    p1 = [(7, t0 + dt.timedelta(minutes=30), "p1")]
    spark.createDataFrame(c1, C_SCHEMA).coalesce(1).write.parquet(cdir)
    spark.createDataFrame(p1, P_SCHEMA).coalesce(1).write.parquet(pdir)

    clicks = spark.readStream.schema(C_SCHEMA).parquet(cdir).withWatermark(
        "l_ts", "10 minutes"
    )
    purch = spark.readStream.schema(P_SCHEMA).parquet(pdir).withWatermark(
        "r_ts", "10 minutes"
    )
    joined = clicks.join(
        purch,
        (clicks.user_id == purch.user_id)
        & (purch.r_ts >= clicks.l_ts)
        & (purch.r_ts < clicks.l_ts + F.expr("INTERVAL 1 hour")),
        "leftOuter",
    ).select("click_id", "purchase_id")

    rows: list = []

    def drain():
        # foreachBatch: restart-from-checkpoint works (memory sink refuses)
        q = (
            joined.writeStream.foreachBatch(
                lambda df, _id: rows.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "lo_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return sorted((r.click_id, r.purchase_id) for r in rows)

    got = drain()
    # inner match emits; c4's null CANNOT emit yet (its horizon t0+2m+1h
    # is not past the watermark max(t)-10m = t0+20m)
    assert ("c1", "p1") in got
    assert ("c4", None) not in got
    # advance event time far past c4's horizon → the null row emits
    # the GLOBAL watermark is the MIN over both inputs — event time
    # must advance on BOTH streams or left state never expires
    spark.createDataFrame(
        [(99, t0 + dt.timedelta(hours=3), "p_late")], P_SCHEMA
    ).coalesce(1).write.parquet(pdir, mode="append")
    spark.createDataFrame(
        [(99, t0 + dt.timedelta(hours=3), "c_late")], C_SCHEMA
    ).coalesce(1).write.parquet(cdir, mode="append")
    drain()  # this batch ADVANCES the committed watermark...
    spark.createDataFrame(
        [(98, t0 + dt.timedelta(hours=3, minutes=1), "p_late2")], P_SCHEMA
    ).coalesce(1).write.parquet(pdir, mode="append")
    spark.createDataFrame(
        [(98, t0 + dt.timedelta(hours=3, minutes=1), "c_late2")], C_SCHEMA
    ).coalesce(1).write.parquet(cdir, mode="append")
    got = drain()  # ...and the next batch evicts + emits the null row
    assert ("c4", None) in got, "unmatched left must emit after watermark"
