"""Bucketized range join — points-in-interval matching without the
quadratic plan (SURVEY §2's join family; the shape behind incident
windows, session attribution, sensor alignment).

Spark's optimizer turns ``p.ts BETWEEN i.start AND i.end`` (plus an
equi-key) into a join whose per-key candidate set is |points|×|intervals|
— fine per key, catastrophic under hot keys. The scalable formulation
quantizes time into fixed buckets: each interval explodes to the buckets
it covers (``sequence`` — bounded by interval_len/bucket + 1), points
map to exactly one bucket, and the join becomes EQUI on (key, bucket)
with an exact residual filter. Candidates shrink from per-key-quadratic
to per-bucket-local; AQE splits any residual hot bucket. Pick
``bucket_s`` ≈ the typical interval length so intervals explode to ~2
buckets."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner range join: every (point, interval) pair of the same ``on``
    key with ``start <= point_ts <= end``. Columns: all point columns +
    the interval's non-key columns."""
    p = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_s)
    )
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_s),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_s),
            )
        ),
    )
    return (
        p.join(i, [on, "_b"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("_b", start_col, end_col)
    )


# --- registered query --------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from philotes_spark.registry import query  # noqa: E402
from philotes_spark.sources.catalog import load_table  # noqa: E402


@query(
    "range_error_window_activity",
    oracle="""
    WITH err AS (
        SELECT event_id AS error_id, user_id, ts AS t0,
               ts + INTERVAL 1 HOUR AS t1
        FROM events WHERE event_type = 'error'
    )
    SELECT err.error_id,
           CAST(COUNT(e.event_id) AS BIGINT) AS n_follow,
           CAST(COUNT(CASE WHEN e.event_type = 'purchase' THEN 1 END) AS BIGINT)
               AS n_purchases
    FROM err LEFT JOIN events e
        ON e.user_id = err.user_id
        AND e.ts > err.t0 AND e.ts <= err.t1
    GROUP BY err.error_id
    ORDER BY err.error_id
    """,
)
def range_error_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-incident activity: for every error event, how many events
    (and purchases) the same user produced in the following hour — a
    points-in-interval range join, planned bucketized (equi-join on
    (user, hour-bucket) + exact residual, never per-key-quadratic).
    Errors with silent users keep zero counts via the left join back to
    the interval list."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
    )
    # strict lower bound: shift start by epsilon via residual on the raw ts
    pts = ev.select("event_id", "user_id", "ts", "event_type")
    matched = bucketed_range_join(
        pts,
        errors.select("error_id", "user_id", "start", "end"),
        on="user_id",
    )
    # bucketed_range_join is inclusive on both ends; the oracle's window
    # is (t0, t1], so re-attach t0 and drop exact-start matches (which
    # include the error event itself)
    counts = (
        matched.join(
            errors.select("error_id", F.col("start").alias("_t0")), "error_id"
        )
        .filter(F.col("ts") > F.col("_t0"))
        .groupBy("error_id")
        .agg(
            F.count(F.lit(1)).alias("n_follow"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "n_purchases"
            ),
        )
    )
    return (
        errors.select("error_id")
        .join(counts, "error_id", "left")
        .select(
            "error_id",
            F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
        .orderBy("error_id")
    )
