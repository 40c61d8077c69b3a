"""Streaming windowed aggregation + stateful dedup (SURVEY §2B note on
streaming semantics; brief §2C streaming surface).

The reference's stream is ingest-only (append + periodic flush — no
windowed aggregation, no watermark, `SURVEY.md §2B`), so these operators
EXTEND the surface the way a Spark user would expect to query the same
feed live:

- ``windowed_counts``      — tumbling/sliding event-time windows with a
  watermark for late data; state is bounded by (watermark horizon ×
  groups), the canonical Structured Streaming aggregation shape.
- ``sessionized_counts``   — session windows (gap-based), the other
  built-in event-time window family.
- ``dedup_stream``         — watermarked ``dropDuplicatesWithinWatermark``
  keyed like the B10 latest-view: replays/redeliveries inside the
  watermark horizon collapse to one row, the streaming twin of the
  read-side dedup backstop (SURVEY §7.4 risk 3).

All three run identically in batch mode (event-time windows are ordinary
expressions there) — tests exercise both paths, matching how Spark
defines their semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Per-(window, group) event counts + value sums with late-data bound.

    (window_start, window_end, <group>, n, total_value)."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(win.alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n",
            "total_value",
        )
    )


def sessionized_counts(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based session windows per key: (session_start, session_end,
    key, n). State closes ``gap`` after the last event per key."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key_col,
            "n",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once → effectively-once inside the watermark horizon:
    duplicates of (key_cols) arriving within the watermark are dropped
    with bounded state. Batch mode degrades to plain dropDuplicates."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join — the attribution shape:
    each right-side event matches left-side events with the same key
    whose timestamp lies in (right_ts - within, right_ts]. E.g. purchases
    attributed to the clicks that preceded them within the window.

    In streaming mode both sides carry watermarks and the join condition
    is time-bounded, so Spark can expire buffered state once the
    watermark passes a row's match horizon — state is bounded by
    (watermark + within) × arrival rate, never the full history. The
    identical expression runs in batch (tests pin stream ≡ batch).
    """
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (l[left_ts] <= r[right_ts])
        & (l[left_ts] > r[right_ts] - F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond).drop(r[key])
