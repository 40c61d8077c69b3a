"""As-of join — the point-in-time lookup operator Spark's join zoo lacks
(pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` / kdb ``aj`` semantics):
for every left row, the single most recent right row of the same key at
or before the left timestamp.

Spark-first plan (the scalable formulation — no range-explosion join,
no per-key Python): tag both sides, UNION them, and run ONE window over
(key, time) where each left row picks up the last non-null right
payload via ``last(..., ignorenulls=True)``. One shuffle on the key,
linear in |L|+|R|, naturally AQE/skew-splittable — versus the naive
``t_right <= t_left`` range join whose candidate set is quadratic in
per-key density. Determinism under timestamp ties: right rows sort
before left rows at the same instant (inclusive match), and among
equal-timestamp right rows the greatest tie-break id wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tiebreak: str | None = None,
    tolerance_s: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: all left columns + the right side's non-key
    columns from the latest right row with ``right_ts <= left_ts`` for
    the same ``on`` key (nulls when no prior right row exists).

    ``tiebreak`` names a right column ordering equal-timestamp right
    rows (greatest wins); ``tolerance_s`` drops matches older than the
    given lookback window (pandas merge_asof's ``tolerance``).

    ``direction='forward'`` flips the match to the EARLIEST right row
    with ``right_ts >= left_ts`` (merge_asof's forward direction —
    next-event lookup), same single-window plan over the reversed time
    order; at equal timestamps the smallest ``tiebreak`` wins, matching
    pandas' first-in-sort-order pick, and ``tolerance_s`` bounds the
    look-AHEAD window instead."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    fwd = direction == "forward"
    carry = [c for c in right.columns if c != on and c != right_ts]
    if tiebreak is None:
        tiebreak = carry[0] if carry else right_ts

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carry],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).cast("long").alias("_tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(c).alias(f"_r_{c}") for c in carry],
        F.col(right_ts).alias("_r_ts"),
    )
    # right rows order before left at equal _t (inclusive as-of); among
    # equal-_t right rows the winning tiebreak sorts last, so last()
    # picks it. Forward = the same one-window plan over reversed time:
    # preceding rows are then those with _t >= left's, and the last of
    # them is the nearest.
    t_order = F.col("_t").desc() if fwd else F.col("_t").asc()
    tie_order = F.col("_tie").desc_nulls_last() if fwd else F.col("_tie").asc_nulls_last()
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.col("_side"), tie_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *left.columns,
        "_side",
        "_t",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in carry
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        gap = F.unix_timestamp("_t") - F.unix_timestamp("_m_ts")
        if fwd:
            gap = -gap
        fresh = F.col("_m_ts").isNotNull() & (gap <= tolerance_s)
        out = out.select(
            *left.columns,
            *[
                F.when(fresh, F.col(f"_m_{c}")).alias(f"_m_{c}")
                for c in carry
            ],
            F.when(fresh, F.col("_m_ts")).alias("_m_ts"),
        )
    return out.select(
        *left.columns,
        *[F.col(f"_m_{c}").alias(c) for c in carry],
        F.col("_m_ts").alias(f"asof_{right_ts}"),
    )


# --- registered query --------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from philotes_spark.registry import query  # noqa: E402
from philotes_spark.sources.catalog import load_table  # noqa: E402


@query(
    "asof_purchase_attribution",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT event_id AS view_id, user_id, ts AS vts
        FROM events WHERE event_type = 'view'
    ),
    m AS (
        SELECT p.event_id, v.view_id, v.vts,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY v.vts DESC, v.view_id DESC
               ) AS rn
        FROM p JOIN v ON v.user_id = p.user_id AND v.vts <= p.ts
    )
    SELECT p.event_id, p.user_id, m.view_id,
           CAST(floor(epoch(p.ts)) - floor(epoch(m.vts)) AS BIGINT) AS gap_s
    FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
    ORDER BY p.event_id
    """,
)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution by as-of join: every purchase event matched to the
    same user's most recent prior (or simultaneous) view event, with the
    gap in whole seconds; purchases with no prior view keep nulls. The
    oracle recomputes the point-in-time pick with an explicit
    ROW_NUMBER over the range join — same tie-breaks (latest ts, then
    greatest view_id), engine-independently."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    out = asof_join(purchases, views, on="user_id", tiebreak="view_id")
    return out.select(
        "event_id",
        "user_id",
        "view_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")
        ).cast("long").alias("gap_s"),
    ).orderBy("event_id")
