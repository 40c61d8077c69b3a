"""Registered A27/A28 queries: metric range aggregation + alert-rule
evaluation, demonstrated over a metric-sample stream derived from the
`events` fixture (ts/series-label/value — the same shape the A26
listener export lands in parquet)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from philotes_spark.observability import (
    AlertRule,
    ScalingRule,
    evaluate_rule,
    range_query,
    sustained_windows,
)
from philotes_spark.registry import query
from philotes_spark.sources.catalog import load_table


def _samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → metric samples: one gauge ``event_value`` labeled by
    event_type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "ts",
        F.lit("event_value").alias("name"),
        "event_type",
        "value",
    )


@query(
    "metric_range_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start, event_type,
           ROUND(AVG(value), 2) AS value
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_metric_range_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A27 range query (prometheus.go:100-147 shape): one aggregated
    point per (series, day bucket) for dashboard charts. Tumbling-window
    groupBy — shuffles on (bucket, series) only."""
    out = range_query(
        _samples(spark, sf_dir), "event_value", ["event_type"], "1 day", "avg"
    )
    return out.select(
        "bucket_start", "event_type", F.round("value", 2).alias("value")
    ).orderBy("bucket_start", "event_type")


@query(
    "alert_daily_avg_value",
    oracle="""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS ts, event_type, AVG(value) AS value
        FROM events GROUP BY 1, 2
    ),
    latest AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts DESC) AS rn
        FROM daily
    )
    SELECT 'daily_avg_value_gt_45' AS rule_name, event_type,
           ROUND(value, 4) AS value, value > 45 AS firing
    FROM latest WHERE rn = 1 ORDER BY event_type
    """,
)
def q_alert_daily_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A28 alert evaluation (evaluator.go:64-116): instant query over the
    daily gauge per event_type, compared gt/threshold — every series is
    returned with its ``firing`` flag (false rows are the resolve
    signal). Threshold 45 sits away from every fixture value so the flag
    is float-robust across engines."""
    daily = range_query(
        _samples(spark, sf_dir), "event_value", ["event_type"], "1 day", "avg"
    ).select(
        F.col("bucket_start").alias("ts"),
        F.lit("daily_avg_value").alias("name"),
        "event_type",
        "value",
    )
    rule = AlertRule(
        "daily_avg_value_gt_45", "daily_avg_value", "gt", 45.0,
        group_by=["event_type"],
    )
    return (
        evaluate_rule(daily, rule)
        .select("rule_name", "event_type", F.round("value", 4).alias("value"), "firing")
        .orderBy("event_type")
    )


@query(
    "scaling_sustained_load",
    oracle="""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, COUNT(*) AS n
        FROM events GROUP BY 1
    ),
    hot AS (
        SELECT h, n,
               CAST(epoch(h) / 3600 AS BIGINT)
                   - ROW_NUMBER() OVER (ORDER BY h) AS isl
        FROM hourly WHERE n > 16
    )
    SELECT MIN(h) AS window_start, MAX(h) AS window_end,
           COUNT(*) AS n_buckets, MAX(n) AS peak_value
    FROM hot GROUP BY isl HAVING COUNT(*) >= 3 ORDER BY window_start
    """,
)
def q_scaling_sustained_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A29 scaling-rule evaluation (scaling/evaluator.go:56-216): hourly
    event-rate runs above threshold for ≥3 consecutive hours — the
    pending-duration condition that triggers a scale-up decision.
    Gaps-and-islands over the bucketed series; τ=16 is tuned to the
    sf0.01 fixture's hourly distribution (median 14, max 30 → 4 sustained
    windows; sf0.1 saturates to one long window, sf0.001 is all-quiet)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("value"))
        .select(F.col("w.start").alias("bucket_start"), "value")
    )
    rule = ScalingRule(
        "scale_up_hot_hours", "gt", 16.0, for_buckets=3, bucket_seconds=3600
    )
    return sustained_windows(hourly, rule).orderBy("window_start")
