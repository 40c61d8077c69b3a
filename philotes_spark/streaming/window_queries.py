"""Event-time window operators registered for the correctness gate.

Spark defines streaming window semantics by batch equivalence, so the
batch run of the same operators is oracle-checkable: tumbling windows
against DuckDB ``time_bucket``, session windows against a gaps-and-
islands rewrite. The streaming path of the identical functions is
covered by tests/test_streaming_windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from philotes_spark.registry import query
from philotes_spark.sources.catalog import load_table
from philotes_spark.streaming.windows import sessionized_counts, windowed_counts


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type — the canonical
    streaming aggregation, verified here through its batch twin."""
    ev = load_table(spark, sf_dir, "events")
    return windowed_counts(ev, window="1 hour", watermark="2 hours")


@query(
    "stream_session_counts",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    grouped AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           COUNT(*) AS n
    FROM grouped
    GROUP BY user_id, sid
    """,
)
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) per user — Spark's
    session_window vs a DuckDB gaps-and-islands rewrite."""
    ev = load_table(spark, sf_dir, "events")
    return sessionized_counts(ev, gap="30 minutes", watermark="1 hour")


@query(
    "stream_hopping_counts",
    oracle="""
    WITH starts AS (
        SELECT event_type, value,
               time_bucket(INTERVAL '30 minutes', ts)
                   - UNNEST(generate_series(0, 1)) * INTERVAL '30 minutes'
                   AS window_start,
               ts
        FROM events
    )
    SELECT window_start,
           window_start + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value
    FROM starts
    WHERE ts >= window_start AND ts < window_start + INTERVAL '1 hour'
    GROUP BY 1, 2, 3
    """,
)
def stream_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows — 1-hour windows every
    30 minutes, the third built-in window family next to tumbling and
    session. Every event lands in window/slide = 2 windows; Spark's
    ``window(ts, '1 hour', '30 minutes')`` expands rows before ONE
    grouped aggregation (partial map-side). The oracle mirrors the
    expansion with a generate_series of epoch-aligned starts — both
    engines align window origins to the epoch, so starts agree
    exactly."""
    ev = load_table(spark, sf_dir, "events")
    return windowed_counts(
        ev, window="1 hour", slide="30 minutes", watermark="2 hours"
    )


@query(
    "stream_dedup_distinct",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermark-bounded streaming dedup
    (streaming/windows.dedup_stream): first-copy-wins over (user_id, event_type)
    projected to the surviving keys — the batch-equivalence definition of
    ``dropDuplicatesWithinWatermark``, whose streaming path (drop within
    horizon, checkpointed state, re-emit after expiry) is pinned E2E in
    tests/test_streaming_dedup.py. Plan: one hash aggregate on the key
    pair, partial map-side."""
    from philotes_spark.streaming.windows import dedup_stream

    ev = load_table(spark, sf_dir, "events")
    return dedup_stream(ev, ["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


@query(
    "stream_interval_join_attrib",
    oracle="""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, ts AS l_ts
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT event_id AS purchase_id, user_id, ts AS r_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_attributed,
           CAST(COUNT(DISTINCT p.purchase_id) AS BIGINT) AS n_purchases,
           CAST(MIN(c.click_id) AS BIGINT) AS first_click_id
    FROM clicks c JOIN purchases p
      ON c.user_id = p.user_id
     AND c.l_ts <= p.r_ts
     AND c.l_ts > p.r_ts - INTERVAL '15 minutes'
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)
def stream_interval_join_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution through the stream-stream interval join
    (streaming/windows.interval_join — the shape whose streaming state
    stays bounded by watermark + interval): purchases matched to the
    same user's clicks in the preceding 15 minutes, rolled up per user.
    The batch run here IS the streaming semantics (Spark defines
    stream-stream joins by batch equivalence; the streaming path of the
    identical function, including left-outer null emission, is pinned in
    tests/test_streaming_windows.py).

    Scale shape: one user-keyed shuffle join; the time bound is a join
    residual. In streaming mode state expiry bounds the buffer to
    (watermark + 15 min) x arrival rate per side."""
    from pyspark.sql import functions as F

    from philotes_spark.streaming.windows import interval_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("l_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("r_ts")
    )
    joined = interval_join(clicks, purchases, "user_id", within="15 minutes")
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.countDistinct("purchase_id").alias("n_purchases"),
            F.min("click_id").alias("first_click_id"),
        )
        .orderBy("user_id")
    )
