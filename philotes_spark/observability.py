"""Metrics aggregation + alert-rule evaluation (SURVEY §2A A27/A28).

The reference pushes these to Prometheus: dashboard stats are PromQL
pushdown (``internal/api/services/prometheus.go:55-147``:
``sum(philotes_cdc_events_total{...})``, ``sum(rate(..[1m]))``,
``max(lag)``, range queries) and alerting is per-rule instant-query +
threshold compare (``internal/alerting/evaluator.go:64-116``:
gt/lt/gte/lte → fire/resolve). On a real deployment Prometheus stays the
right tool; this module serves the same query shapes natively over a
metric-sample table/stream so the engine is self-contained:

    samples(ts timestamp, name string, labels map<string,string>, value double)

— the shape a remote-write dump or a ``StreamingQueryListener`` export
(streaming/reliability.py A26) lands in parquet.

All operators are plain DataFrame aggregations: instant vectors are a
window-dedup to the latest sample per series, ``rate``/``increase`` are
per-series min/max over a time bucket, range queries are tumbling-window
group-bys — every one shuffles on (series, bucket) only and scales like
any other aggregation here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_OPS = {
    "gt": lambda c, t: c > t,
    "gte": lambda c, t: c >= t,
    "lt": lambda c, t: c < t,
    "lte": lambda c, t: c <= t,
}


def _series_key(labels: list[str]) -> list[Column]:
    return [F.col(l) for l in labels]


def instant_vector(
    samples: DataFrame, name: str, labels: list[str], at_ts=None
) -> DataFrame:
    """PromQL instant query: the latest sample ≤ ``at_ts`` per label set
    (``QueryInstant``, prometheus.go:55-98). One window shuffle on the
    series key."""
    df = samples.filter(F.col("name") == name)
    if at_ts is not None:
        df = df.filter(F.col("ts") <= at_ts)
    w = Window.partitionBy(*_series_key(labels)).orderBy(F.desc("ts"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sum_by(
    samples: DataFrame,
    name: str,
    labels: list[str],
    at_ts=None,
    series_labels: list[str] | None = None,
) -> DataFrame:
    """``sum by (labels)(metric)``: latest sample per SERIES, summed per
    grouping label set. ``series_labels`` is the full series identity
    (defaults to ``labels``); pass it when summing across series — e.g.
    ``sum(events_total)`` with series (source, table) must take each
    series' latest sample first, not one global latest row."""
    sl = series_labels if series_labels is not None else labels
    return (
        instant_vector(samples, name, sl, at_ts)
        .groupBy(*labels)
        .agg(F.sum("value").alias("value"))
    )


def increase_over(
    samples: DataFrame, name: str, labels: list[str], bucket: str = "1 minute"
) -> DataFrame:
    """``increase(metric[bucket])`` per series per tumbling bucket:
    max − min of a monotone counter within the window. Counter resets are
    not reconstructed (the listener's counters never reset mid-file);
    PromQL's extrapolation is deliberately not imitated — exact increase
    beats estimated rate when the raw samples are all present."""
    return (
        samples.filter(F.col("name") == name)
        .groupBy(F.window("ts", bucket).alias("w"), *labels)
        .agg((F.max("value") - F.min("value")).alias("increase"))
        .select(
            F.col("w.start").alias("bucket_start"), *labels, "increase"
        )
    )


def counter_increase_resets(
    samples: DataFrame,
    labels: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 day",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Reset-aware counter increase per series per bucket — the full
    PromQL ``increase()`` semantics :func:`increase_over` deliberately
    omits (its max−min is exact only for never-resetting counters): a
    sample rising above its predecessor contributes the delta; a sample
    BELOW its predecessor is a counter restart (process crash, pod
    reschedule — the reference's counters reset exactly this way on a
    worker restart) and contributes its own value, Prometheus's
    assumption that the new counter rose from 0. A series' first-ever
    sample also counts as rising from 0 (the Prometheus client model:
    counters are born at 0 and incremented before first scrape).

    Shape: one ``lag`` window per series + one (series, bucket) hash
    aggregate — the window's shuffle on the label key is reused by the
    aggregate (same partitioning), so one wide exchange total."""
    order = order_cols or [ts_col]
    w = Window.partitionBy(*_series_key(labels)).orderBy(*order)
    prev = F.lag(F.col(value_col)).over(w)
    delta = F.col(value_col) - prev
    contrib = (
        F.when(prev.isNull(), F.col(value_col))
        .when(delta < 0, F.col(value_col))
        .otherwise(delta)
    )
    return (
        samples.withColumn("_contrib", contrib)
        .groupBy(F.window(ts_col, bucket).alias("w"), *labels)
        .agg(F.sum("_contrib").alias("increase"))
        .select(F.col("w.start").alias("bucket_start"), *labels, "increase")
    )


def range_query(
    samples: DataFrame,
    name: str,
    labels: list[str],
    bucket: str = "1 minute",
    agg: str = "avg",
) -> DataFrame:
    """PromQL range query for charts (``QueryRange``, prometheus.go:100-147):
    one aggregated point per (series, bucket)."""
    fn = {"avg": F.avg, "max": F.max, "min": F.min, "sum": F.sum}[agg]
    return (
        samples.filter(F.col("name") == name)
        .groupBy(F.window("ts", bucket).alias("w"), *labels)
        .agg(fn("value").alias("value"))
        .select(F.col("w.start").alias("bucket_start"), *labels, "value")
    )


@dataclass
class AlertRule:
    """A28 rule (``internal/alerting/evaluator.go:24-62``): compare an
    instant aggregate against a threshold."""

    name: str
    metric: str
    op: str  # gt | gte | lt | lte
    threshold: float
    group_by: list[str] = field(default_factory=list)
    # full series identity when it is finer than the grouping (a global
    # rule over per-source counters still sums latest-per-source)
    series_labels: list[str] | None = None

    def __post_init__(self) -> None:
        if self.op not in _OPS:
            raise ValueError(f"unknown operator {self.op!r}; use {sorted(_OPS)}")


def evaluate_rule(samples: DataFrame, rule: AlertRule, at_ts=None) -> DataFrame:
    """One rule → evaluation rows (``Evaluate``, evaluator.go:64-116):
    (rule_name, group labels…, value, firing). Every group is returned —
    ``firing=false`` rows are the resolve signal, same as the reference
    emitting resolved state for rules that stop matching."""
    base = sum_by(
        samples,
        rule.metric,
        rule.group_by,
        at_ts,
        series_labels=rule.series_labels,
    )
    cmp = _OPS[rule.op](F.col("value"), F.lit(rule.threshold))
    return base.select(
        F.lit(rule.name).alias("rule_name"),
        *rule.group_by,
        "value",
        cmp.alias("firing"),
    )


def metrics_to_samples(spark, metrics, source: str, at_ts=None) -> DataFrame:
    """Bridge A26 → A27/A28: one pipeline's ``PipelineMetrics`` (or any
    numeric-field dataclass/dict) becomes sample rows labeled by pipeline
    ``source`` — the same rows a Prometheus remote-write dump lands in
    parquet, so the aggregation/alerting operators run identically over
    live pipelines and archived metric history."""
    import datetime as _dt

    d = metrics if isinstance(metrics, dict) else metrics.__dict__
    ts = at_ts or _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    rows = [
        (ts, k, source, float(v))
        for k, v in d.items()
        if isinstance(v, (int, float)) and not isinstance(v, bool)
    ]
    return spark.createDataFrame(
        rows, "ts timestamp, name string, source string, value double"
    )


@dataclass
class ScalingRule:
    """A29 scaling rule (``internal/scaling/evaluator.go:56-216``):
    condition must hold continuously for ``for_buckets`` consecutive
    buckets before a scale decision fires — the pending-duration
    tracking, expressed over a bucketed series instead of a poll loop.

    ``bucket_seconds`` is REQUIRED and must equal the width of the
    buckets in the series you evaluate (e.g. 60 for a '1 minute'
    range_query): the consecutive-run detection divides timestamps by
    it, so a mismatch would silently fragment every run into 1-bucket
    islands and detect nothing."""

    name: str
    op: str  # gt | gte | lt | lte
    threshold: float
    bucket_seconds: int
    for_buckets: int = 1

    def __post_init__(self) -> None:
        if self.op not in _OPS:
            raise ValueError(f"unknown operator {self.op!r}; use {sorted(_OPS)}")
        if self.bucket_seconds <= 0:
            raise ValueError("bucket_seconds must match the series bucket width")


def sustained_windows(
    bucketed: DataFrame, rule: ScalingRule, labels: list[str] | None = None
) -> DataFrame:
    """Maximal runs of consecutive buckets satisfying the rule, per
    series: (labels…, window_start, window_end, n_buckets, peak_value),
    only runs ≥ ``for_buckets`` long. Input is a bucketed series
    (``bucket_start``, labels…, ``value``) — compose with
    :func:`range_query` / :func:`increase_over`.

    Gaps-and-islands: bucket ordinal − row_number is constant exactly on
    consecutive runs (a missing bucket breaks the run, as it must — no
    data ≠ condition held). The window is partitioned per series and its
    input is already one row per bucket (time-bounded, e.g. 720/month),
    so the single-series ordering is never the scale bottleneck."""
    labels = labels or []
    cond = _OPS[rule.op](F.col("value"), F.lit(rule.threshold))
    w = Window.partitionBy(*_series_key(labels)).orderBy("bucket_start")
    idx = (F.unix_timestamp("bucket_start") / rule.bucket_seconds).cast("long")
    return (
        bucketed.filter(cond)
        .withColumn("_isl", idx - F.row_number().over(w))
        .groupBy(*labels, "_isl")
        .agg(
            F.min("bucket_start").alias("window_start"),
            F.max("bucket_start").alias("window_end"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("value").alias("peak_value"),
        )
        .filter(F.col("n_buckets") >= rule.for_buckets)
        .select(*labels, "window_start", "window_end", "n_buckets", "peak_value")
    )


def evaluate_rules(samples: DataFrame, rules: list[AlertRule], at_ts=None) -> DataFrame:
    """All rules with a shared grouping → one result set (manager.go's
    evaluation sweep). Rules must share ``group_by`` to union."""
    out = None
    for r in rules:
        df = evaluate_rule(samples, r, at_ts)
        out = df if out is None else out.unionByName(df)
    if out is None:
        raise ValueError("no rules")
    return out
