"""A27/A28 operators over a synthetic metric-sample stream: instant
vectors, counter increase, range queries, and threshold alert rules
(reference: internal/api/services/prometheus.go:55-147,
internal/alerting/evaluator.go:64-116)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from philotes_spark.observability import (
    AlertRule,
    evaluate_rule,
    evaluate_rules,
    increase_over,
    instant_vector,
    range_query,
    sum_by,
)

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def samples(spark):
    rows = []
    # events_total: monotone counter per (source, table) series
    for src, base in (("pg1", 0.0), ("pg2", 100.0)):
        for i in range(10):  # one sample per 15s over 2.5 min
            rows.append(
                (T0 + dt.timedelta(seconds=15 * i), "events_total", src, base + 10.0 * i)
            )
    # lag_seconds: gauge
    rows += [
        (T0 + dt.timedelta(seconds=30), "lag_seconds", "pg1", 2.0),
        (T0 + dt.timedelta(seconds=60), "lag_seconds", "pg1", 9.0),
        (T0 + dt.timedelta(seconds=60), "lag_seconds", "pg2", 1.0),
    ]
    return spark.createDataFrame(
        rows, "ts timestamp, name string, source string, value double"
    )


def test_instant_vector_latest_per_series(samples):
    got = {
        r.source: r.value
        for r in instant_vector(samples, "events_total", ["source"]).collect()
    }
    assert got == {"pg1": 90.0, "pg2": 190.0}


def test_instant_vector_time_travel(samples):
    at = T0 + dt.timedelta(seconds=31)
    got = {
        r.source: r.value
        for r in instant_vector(samples, "events_total", ["source"], at_ts=at).collect()
    }
    assert got == {"pg1": 20.0, "pg2": 120.0}  # 3rd sample (t=30s)


def test_sum_by_collapses_series(samples):
    row = sum_by(samples, "events_total", [], series_labels=["source"]).collect()
    # no grouping labels: a single global sum over each series' latest
    assert len(row) == 1 and row[0].value == 280.0


def test_increase_per_minute(samples):
    got = {
        (r.bucket_start.second + 60 * r.bucket_start.minute, r.source): r.increase
        for r in increase_over(samples, "events_total", ["source"], "1 minute").collect()
    }
    # minute 1: samples at 0/15/30/45s → 30 per series; minute 2 same;
    # minute 3: 120/135s → 10
    for src in ("pg1", "pg2"):
        assert got[(0, src)] == 30.0
        assert got[(60, src)] == 30.0
        assert got[(120, src)] == 10.0


def test_range_query_max_gauge(samples):
    got = {
        (r.bucket_start.minute, r.source): r.value
        for r in range_query(samples, "lag_seconds", ["source"], "1 minute", "max").collect()
    }
    assert got[(0, "pg1")] == 2.0  # only the t=30s sample is in minute 0
    assert got[(1, "pg1")] == 9.0 and got[(1, "pg2")] == 1.0


def test_alert_rule_fire_and_resolve(samples):
    rule = AlertRule("lag_high", "lag_seconds", "gt", 5.0, group_by=["source"])
    got = {r.source: r.firing for r in evaluate_rule(samples, rule).collect()}
    assert got == {"pg1": True, "pg2": False}  # pg2 row IS the resolve signal


def test_alert_rule_global_scalar(samples):
    rule = AlertRule(
        "total_events", "events_total", "gte", 280.0, series_labels=["source"]
    )
    row = evaluate_rule(samples, rule).collect()[0]
    assert row.value == 280.0 and bool(row.firing)


def test_evaluate_rules_unions(samples):
    rules = [
        AlertRule("lag_high", "lag_seconds", "gt", 5.0, group_by=["source"]),
        AlertRule("lag_low", "lag_seconds", "lt", 2.0, group_by=["source"]),
    ]
    out = evaluate_rules(samples, rules)
    assert out.count() == 4
    firing = {(r.rule_name, r.source): r.firing for r in out.collect()}
    assert firing[("lag_high", "pg1")] and firing[("lag_low", "pg2")]
    assert not firing[("lag_high", "pg2")] and not firing[("lag_low", "pg1")]


def test_bad_operator_rejected():
    with pytest.raises(ValueError, match="unknown operator"):
        AlertRule("x", "m", "eq", 1.0)


def test_pipeline_metrics_feed_alert_rules(spark, tmp_path):
    """A26 → A27 → A28 E2E: a real streaming pipeline's listener metrics
    become samples and drive alert evaluation."""
    import datetime as dt2
    import os

    from philotes_spark.observability import metrics_to_samples
    from philotes_spark.streaming.ingest import CdcIngestPipeline, IngestConfig
    from philotes_spark.types import CDC_EVENT_SCHEMA

    cfg = IngestConfig(
        source_dir=str(tmp_path / "feed"),
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    events = [
        (
            f"ev-{i}", f"0/{i:X}", 7, dt2.datetime(2024, 3, 1, 12, 0, i),
            "public", "users", "INSERT", None, '{"id": 1}', ["id"], {},
        )
        for i in range(1, 6)
    ]
    spark.createDataFrame(events, CDC_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(cfg.source_dir)
    pipe = CdcIngestPipeline(spark, cfg)
    pipe.start(available_now=True).awaitTermination(120)
    import time

    for _ in range(40):
        if pipe.listener.metrics.events_total >= 5:
            break
        time.sleep(0.25)
    pipe.stop()

    samples = metrics_to_samples(spark, pipe.listener.metrics, source="cdc1")
    rules = [
        AlertRule("ingest_alive", "events_total", "gte", 1.0, group_by=["source"]),
        AlertRule("error_budget", "errors_total", "gt", 0.0, group_by=["source"]),
    ]
    got = {r.rule_name: r.firing for r in evaluate_rules(samples, rules).collect()}
    assert got == {"ingest_alive": True, "error_budget": False}


# --- A29: sustained-condition windows ----------------------------------------


def _bucketed(spark, values, start=T0, step=60):
    rows = [
        (start + dt.timedelta(seconds=step * i), float(v))
        for i, v in enumerate(values)
        if v is not None  # None = missing bucket (a gap)
    ]
    return spark.createDataFrame(rows, "bucket_start timestamp, value double")


def test_sustained_window_requires_consecutive_run(spark):
    from philotes_spark.observability import ScalingRule, sustained_windows

    #        hot  hot  hot  cold hot  hot
    series = [10, 12, 11, 2, 10, 10]
    rule = ScalingRule("up", "gt", 5.0, for_buckets=3, bucket_seconds=60)
    got = sustained_windows(_bucketed(spark, series), rule).collect()
    # only the first run reaches 3 buckets; the post-dip run is 2 long
    assert len(got) == 1
    assert got[0].n_buckets == 3 and got[0].peak_value == 12.0
    assert got[0].window_start == T0


def test_missing_bucket_breaks_the_run(spark):
    from philotes_spark.observability import ScalingRule, sustained_windows

    series = [10, 10, None, 10, 10]  # gap in the middle
    rule = ScalingRule("up", "gt", 5.0, for_buckets=3, bucket_seconds=60)
    assert sustained_windows(_bucketed(spark, series), rule).count() == 0
    rule2 = ScalingRule("up", "gt", 5.0, for_buckets=2, bucket_seconds=60)
    got = sustained_windows(_bucketed(spark, series), rule2).collect()
    assert len(got) == 2  # two separate 2-bucket runs


def test_sustained_windows_per_series(spark):
    from philotes_spark.observability import ScalingRule, sustained_windows

    rows = []
    for src, vals in (("a", [9, 9, 9]), ("b", [9, 1, 9])):
        for i, v in enumerate(vals):
            rows.append((T0 + dt.timedelta(seconds=60 * i), src, float(v)))
    df = spark.createDataFrame(rows, "bucket_start timestamp, source string, value double")
    rule = ScalingRule("up", "gte", 9.0, for_buckets=3, bucket_seconds=60)
    got = sustained_windows(df, rule, labels=["source"]).collect()
    assert [r.source for r in got] == ["a"]
