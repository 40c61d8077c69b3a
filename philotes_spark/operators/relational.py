"""The declared SQL query surface (SURVEY §2B, B1-B20) served natively by
Spark SQL — the reference delegates these to Trino (`docs/query/
sample-queries.sql`, `internal/api/services/query.go:22-27`); here Catalyst
plans and executes them.

Every query is registered with a DuckDB oracle for the driver harness.
Determinism rules (see registry.py): LIMIT always carries a total ORDER BY;
float aggregates are ROUNDed identically on both sides; integer sums are
cast to BIGINT on the DuckDB side (DuckDB widens to HUGEINT).

Scale notes are inline per query — the fixtures are small, but each plan is
written for the 100 TB shape (pushdown-friendly filters, broadcast of dim
tables, single-shuffle windows partitioned by high-cardinality keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from philotes_spark.registry import query
from philotes_spark.plans.joins import dim
from philotes_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# TPC-H-style analytics (exercise scan/filter/agg/join/topn at scale)
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                          AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                     AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                          AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                     AS avg_price,
           ROUND(AVG(l_discount), 4)                                          AS avg_disc,
           COUNT(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → pushed-down filter → partial+final hash agg (B3/B7/B17 class).

    At 100 TB: map-side combine makes the shuffle tiny (4 groups); the
    shipdate predicate reaches the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # the aggregate has ≤ 6 rows (returnflag × linestatus) at any
        # SF: one partition makes the final sort exchange-free
        # (bounded result, r12)
        .coalesce(1)
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate  > TIMESTAMP '1997-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-N (B8/B13). Plan (r11): lineitem
    pre-aggregates to per-order revenue BEFORE the joins — the aggregate
    combines map-side and its exchange on l_orderkey is the same
    partitioning the orders join needs (exchange reuse), so join rows
    shrink to one per order; the orderkey is unique per order, making
    the old post-join groupBy(l_orderkey, o_orderdate) redundant. The
    customer probe is a LEFT SEMI (no customer columns surface and
    c_custkey is unique, so inner ≡ semi — semi carries no payload).
    customer stays unhinted (scales with SF): the size check broadcasts
    it at fixture scale, AQE re-plans at 100 TB; top-N compiles to
    TakeOrderedAndProject (no global sort at scale). Measured at sf1
    (interleaved A/B, min-of-4 cold): 0.97 → 0.70 s."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1997-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-01")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    # merge for the orders join, same reasoning as q18 (r12): per-order
    # revenue is one row per order — O(fact), never broadcastable at
    # 100 TB, so SMJ is the at-scale plan; at fixture scale the A/B is
    # within noise both cold and steady (sf1 0.61-0.82 s both ways), so
    # scale-consistency decides.
    ).hint("merge")
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(dim(cust, "customer"), orders.o_custkey == cust.c_custkey, "left_semi")
        .select("l_orderkey", F.round("rev", 2).alias("revenue"), "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join (B13 at its hardest). region/nation hinted broadcast
    (bounded dims); supplier size-selected via dim() so 100 TB falls back
    to a shuffle join; the orders⋈lineitem shuffle joins on the same key
    so AQE reuses the exchange.

    Join order (r16, guide §2.3/§3 — the q8 technique, lighter): the
    r11 order ran the ASIA region cut LAST — every joined row paid the
    customer AND supplier joins before the 1/5 nation cut applied. Now
    customer and supplier are pre-reduced to ASIA nations (bounded
    nation⋈region broadcast; payload-free semi for customer) so the
    cut lands at the CUSTOMER join and the stream into the supplier
    join is 5x smaller — at 100 TB that supplier join is an SMJ and
    its probe side shrinks 5x. A fuller restructure (pre-reducing
    ORDERS through cust_asia before the lineitem join) measured +15%
    at sf1 — the extra pre-join stage costs more than the orders-side
    byte cut saves while lineitem (the dominant side) shuffles either
    way — so it was rejected; this variant is a wash at sf1
    (interleaved min-of-5: 0.668 → 0.683 s) and scale-consistency
    decides (the q3 precedent). Results identical (inner joins on
    unique keys; oracle hash-compared at sf0.001/0.01/0.1)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat_asia = nation.join(
        dim(region, "region"), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust_asia = cust.join(
        dim(nat_asia, "nation"),
        cust.c_nationkey == nat_asia.n_nationkey,
        "left_semi",
    ).select("c_custkey", "c_nationkey")
    supp_asia = supp.join(
        dim(nat_asia, "nation"), supp.s_nationkey == nat_asia.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_asia, orders.o_custkey == cust_asia.c_custkey)
        .join(
            dim(supp_asia, "supplier"),
            (li.l_suppkey == supp_asia.s_suppkey)
            & (cust_asia.c_nationkey == supp_asia.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        # n_name-keyed aggregate is ≤ 25 rows at any SF: one partition
        # makes the final sort exchange-free (bounded result, r12)
        .coalesce(1)
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan+filter+global agg — every predicate pushes to parquet;
    whole-stage codegen end to end, no shuffle beyond the 1-row final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "q_pushdown_projection",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    """,
)
def q_pushdown_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19-adjacent: 2-column projection + selective filter. ReadSchema must
    show only 3 columns and PushedFilters the shipdate bound — verified in
    tests/test_plans.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= "2001-01-01").select(
        "l_orderkey", "l_extendedprice"
    )


# --------------------------------------------------------------------------
# B-surface on the event stream table (sample-queries.sql parity)
# --------------------------------------------------------------------------


@query(
    "b2_scan_limit",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events ORDER BY event_id LIMIT 100
    """,
)
def b2_scan_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 `SELECT * FROM t LIMIT 100` (sample-queries.sql:32) — made
    deterministic with a unique ORDER BY (CollectLimit → TakeOrdered)."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy("event_id")
        .limit(100)
    )


@query("b3_count_star", oracle="SELECT COUNT(*) AS n FROM events")
def b3_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 global COUNT(*) (sample-queries.sql:35) — parquet footer counts
    make this metadata-only under Spark's count optimization."""
    return load_table(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n"))


@query(
    "b4_recent_filter",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts > TIMESTAMP '2024-02-01' - INTERVAL 7 DAY
    """,
)
def b4_recent_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 date-arithmetic filter (sample-queries.sql:38-39). Fixed anchor
    instead of CURRENT_DATE so runs are reproducible; the interval math is
    identical. Predicate pushes to the scan → at scale only recent
    partitions are read (B19 partition pruning on a date-partitioned lake
    table)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit("2024-02-01")) - F.expr("INTERVAL 7 DAYS")
    return ev.filter(F.col("ts") > cutoff).select("event_id", "ts", "user_id", "event_type")


@query(
    "b7_daily_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n_events
    FROM events GROUP BY 1 ORDER BY 1 DESC
    """,
)
def b7_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 group-by-expression + count + order (sample-queries.sql:69-74)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        # one row per calendar day: bounded by the stream's time span at
        # any SF, so collapse to one partition before the sort — removes
        # the range exchange AND its sampling job (bounded result, r16)
        .coalesce(1)
        .orderBy(F.desc("day"))
    )


@query(
    "b8_top_n",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events ORDER BY value DESC, event_id LIMIT 10
    """,
)
def b8_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 top-N (sample-queries.sql:77-80) → TakeOrderedAndProject: each
    task keeps 10 rows, driver merges — no global sort at 100 TB."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy(F.desc("value"), "event_id")
        .limit(10)
    )


@query(
    "b9_running_total",
    oracle="""
    SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
)
def b9_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 running total (sample-queries.sql:83-87). Partitioned by user_id —
    unlike the reference's unpartitioned SUM OVER (ORDER BY), this scales:
    one shuffle on a high-cardinality key, no single-task global window.
    Explicit ROWS frame + unique tie-break make it deterministic."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


@query(
    "b9_running_total_global",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,6))) OVER (
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS DOUBLE) AS running_value
    FROM events
    """,
)
def b9_running_total_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's exact B9 semantics (sample-queries.sql:83-87): a
    GLOBAL running total. A naive ``SUM OVER (ORDER BY ts)`` serializes
    through one task at any scale, so this is the distributed prefix-sum:

      1. range-partition on the order key (one shuffle, ordered buckets);
      2. local running sum inside each bucket (parallel window per bucket);
      3. per-bucket totals → prefix offsets (bucket-count rows, trivially
         small) broadcast back and added to the local sums.

    The only single-task step is the offset scan over n_buckets rows.
    Sums are decimal so bucket-local + offset accumulation is bit-identical
    to a sequential scan.

    The bucket id is a pure function of the order key (quantile cutpoints,
    one bounded driver-side collect like the IVF centroids) — NOT
    ``spark_partition_id()``, which is not stable across the plan branches
    that reuse it (AQE may coalesce each instantiation differently)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").cast("decimal(38,6)").alias("v"),
        F.unix_micros("ts").alias("_k"),
    )
    buckets = 32
    cuts = ev.stat.approxQuantile(
        "_k", [i / buckets for i in range(1, buckets)], 0.001
    )
    bucket = F.lit(0)
    for c in sorted(set(cuts)):
        bucket = bucket + F.when(F.col("_k") > F.lit(int(c)), 1).otherwise(0)
    part = ev.withColumn("_b", bucket)
    w_local = (
        Window.partitionBy("_b")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_run", F.sum("v").over(w_local))
    w_prev = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        part.groupBy("_b")
        .agg(F.sum("v").alias("_tot"))
        .select(
            "_b",
            F.coalesce(F.sum("_tot").over(w_prev), F.lit(0).cast("decimal(38,6)")).alias(
                "_off"
            ),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_b")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round(F.col("_run") + F.col("_off"), 2).cast("double").alias("running_value"),
        )
    )


@query(
    "b10_latest_by_key",
    oracle="""
    SELECT user_id, event_id, event_type, ts, value
    FROM (
        SELECT user_id, event_id, event_type, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def b10_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 dedup-to-latest (sample-queries.sql:94-102) — the reference's
    canonical CDC 'current state' query, via the latest_view operator."""
    from philotes_spark.operators.cdc import latest_view

    ev = load_table(spark, sf_dir, "events")
    return latest_view(
        ev, ["user_id"], [F.col("ts"), F.col("event_id")]
    ).select("user_id", "event_id", "event_type", "ts", "value")


@query(
    "b11_change_history",
    oracle="""
    SELECT event_id, ts, event_type, value, props
    FROM events WHERE user_id = 7
    """,
)
def b11_change_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 change history for one key (sample-queries.sql:104-112); the key
    filter pushes down so only that key's row groups are read."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .select("event_id", "ts", "event_type", "value", "props")
    )


@query(
    "b12_op_counts",
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
)
def b12_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 categorical group-by (sample-queries.sql:114-119)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "b13_join_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def b13_join_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 equi inner join (sample-queries.sql:126-132). customer is the
    dim side: size-selected broadcast (dim() policy — no forced hint on an
    SF-scaling table), zero shuffle of the fact table at fixture scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(dim(cust, "customer"), orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "o_totalprice", "o_orderdate", "c_name", "c_mktsegment")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
    )


@query(
    "b13_join_agg_segment",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def b13_join_agg_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate: broadcast join keeps the plan shuffle-free until
    the 5-group final agg."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(dim(cust, "customer"), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        # 5 market segments at any SF: single-partition sort, no range
        # exchange / sampling job (bounded result, r16)
        .coalesce(1)
        .orderBy("c_mktsegment")
    )


@query(
    "b14_duplicate_detection",
    oracle="""
    SELECT user_id, COUNT(*) AS n
    FROM events GROUP BY user_id HAVING COUNT(*) > 1
    """,
)
def b14_duplicate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 GROUP BY ... HAVING COUNT(*) > 1 (sample-queries.sql:165-169)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


@query(
    "b15_count_nonnull",
    oracle="""
    SELECT COUNT(*) AS n_total, COUNT(props) AS n_props, COUNT(value) AS n_value
    FROM events
    """,
)
def b15_count_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 null-skipping COUNT(col) (sample-queries.sql:171-176)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("props").alias("n_props"),
        F.count("value").alias("n_value"),
    )


@query(
    "b16_freshness",
    oracle="""
    SELECT MAX(ts) AS last_event_ts,
           date_diff('second', MAX(ts), TIMESTAMP '2024-02-01') AS freshness_seconds,
           COUNT(*) AS n_events
    FROM events
    """,
)
def b16_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 MAX(ts) + freshness lag (sample-queries.sql:178-182). Anchored to
    a fixed 'now' for reproducibility; the reference computes the same gauge
    as now − event ts (pipeline/pipeline.go:246-250)."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.to_timestamp(F.lit("2024-02-01")).cast("long")
    return ev.agg(
        F.max("ts").alias("last_event_ts"),
        (anchor - F.max("ts").cast("long")).alias("freshness_seconds"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "b17_pipeline_monitoring",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def b17_pipeline_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 monitoring aggregate (sample-queries.sql:189-196)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        # bounded event-type vocabulary: single-partition sort (r16)
        .coalesce(1)
        .orderBy("event_type")
    )


@query(
    "a8_buffer_stats",
    oracle="""
    SELECT COUNT(*) AS total_events,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS unprocessed_events,
           MIN(CASE WHEN event_type = 'error' THEN ts END) AS oldest_unprocessed
    FROM events
    """,
)
def a8_buffer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 buffer stats shape (buffer/postgres.go:237-265): COUNT + filtered
    COUNT + filtered MIN in a single pass ('error' events stand in for the
    unprocessed partition)."""
    ev = load_table(spark, sf_dir, "events")
    is_err = F.col("event_type") == "error"
    return ev.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.count(F.when(is_err, 1)).alias("unprocessed_events"),
        F.min(F.when(is_err, F.col("ts"))).alias("oldest_unprocessed"),
    )


@query(
    "set_ops_nations",
    oracle="""
    (SELECT c_nationkey AS nationkey FROM customer
     INTERSECT
     SELECT s_nationkey AS nationkey FROM supplier)
    EXCEPT
    SELECT n_nationkey AS nationkey FROM nation WHERE n_name = 'NATION_1'
    ORDER BY nationkey
    """,
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation surface: nations that have BOTH customers and
    suppliers, minus one named nation — INTERSECT then EXCEPT, each
    compiling to a semi/anti hash join after distinct. (r15: the old
    customers-EXCEPT-suppliers shape was VACUOUS at sf0.01 — every
    nation has suppliers there — so the driver compare carried zero
    rows; the intersect side is non-empty at every SF by construction:
    most nations have both, and only one is subtracted.)"""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    named = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select(F.col("n_nationkey").alias("nationkey"))
    )
    # ≤ 25 distinct nation keys survive the set ops at any SF:
    # single-partition sort (bounded result, r16)
    return cust.intersect(supp).subtract(named).coalesce(1).orderBy("nationkey")


@query(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(year(o_orderdate) AS INT)  AS order_year,
           upper(o_orderstatus)            AS status_uc,
           substring(o_orderpriority, 1, 1) AS priority_code,
           concat(o_orderstatus, '-', o_orderpriority) AS status_priority,
           coalesce(NULLIF(o_orderstatus, 'F'), 'FINAL') AS status_coalesced,
           CASE WHEN o_totalprice > 100000 THEN 'large' ELSE 'small' END AS size_class,
           ROUND(abs(o_totalprice) / 100.0, 3) AS price_hundreds
    FROM orders
    ORDER BY o_orderkey LIMIT 50
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 scalar-function surface: date_trunc / extract / string ops /
    CASE / COALESCE / NULLIF — all whole-stage-codegen expressions."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"),
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.upper("o_orderstatus").alias("status_uc"),
            F.substring("o_orderpriority", 1, 1).alias("priority_code"),
            F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
            F.coalesce(F.nullif("o_orderstatus", F.lit("F")), F.lit("FINAL")).alias(
                "status_coalesced"
            ),
            F.when(F.col("o_totalprice") > 100000, "large")
            .otherwise("small")
            .alias("size_class"),
            F.round(F.abs("o_totalprice") / 100.0, 3).alias("price_hundreds"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Join-shape coverage: semi/anti joins, disjunctive pushdown, conditional
# aggregation, having-subquery, ROLLUP, per-group ranking windows.
# The reference declares these shapes implicitly via its Trino surface
# (docs/query/sample-queries.sql); a user migrating arbitrary analyst SQL
# needs each physical join/agg strategy to exist and scale.
# --------------------------------------------------------------------------


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (TPC-H Q4 shape). At scale the semi join
    shuffles both sides on l_orderkey/o_orderkey but never materializes
    the many-rows side beyond the first match per key."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        # 5 order priorities at any SF: single-partition sort (r16)
        .coalesce(1)
        .orderBy("o_orderpriority")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join + agg + top-N (TPC-H Q10 shape).

    r16 (guide §2.3/§2.4): aggregate early, attach dims late. The r12
    plan shuffled every returned LINE ITEM through the orders join and
    then the full join output into a (c_custkey, c_name, n_name)
    aggregate — but c_custkey is unique (c_name and n_name are
    functionally dependent on it), so the heavy stream only ever needs
    the custkey. Now lineitem pre-aggregates to per-order revenue
    (map-side partials; its l_orderkey exchange is the very
    partitioning the orders join needs — exchange reuse, the q3
    technique), the join output collapses to per-CUSTOMER revenue
    (second tiny agg), and customer/nation attach to one row per
    returning customer instead of one row per returned item. At 100 TB
    the orders join's probe side shrinks ~4x (items → orders with
    returns) and the customer join's probe side ~40x (items →
    customers). Top-20 still compiles to TakeOrderedAndProject.
    Measured interleaved same-JVM min-of-4 cold: see
    OPTIMIZATION_r16.md; oracle rows+schema+hash re-verified at
    sf0.001/0.01/0.1 (round-at-the-end unchanged: the sum is
    reassociated, values equal at 2 decimals on all fixtures)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            )
        )
        # one row per order with returns — O(fact), never broadcastable
        # at 100 TB; merge keeps the fixture plan the at-scale plan
        # (same reasoning as q3/q18)
        .hint("merge")
    )
    per_cust = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev"))
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(dim(nation, "nation"), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("rev", 2).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation over a join (TPC-H Q12 shape) — CASE inside
    SUM stays in whole-stage codegen; one shuffle for the join, map-side
    partial agg shrinks the second."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        # ≤ a handful of linestatus values at any SF: one partition makes
        # the final sort exchange-free (bounded result, r16)
        .coalesce(1)
        .orderBy("l_linestatus")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'ECONOMY'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-of-conditional-sums over a join (TPC-H Q14 shape). part⋈
    lineitem is left to AQE: at 100 TB part is too big to broadcast, and
    AQE picks shuffle-hash vs sort-merge from runtime sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over an aggregate (TPC-H Q18 shape) → aggregate once
    and JOIN THE AGGREGATE: the HAVING result already carries the very
    sum the query reports per order, so re-scanning lineitem to semi-join
    and re-aggregate it (the r≤10 plan, mirroring the SQL text's shape)
    did the fact table's work twice. One lineitem scan + one shuffle;
    the filtered aggregate is ~0.5% of orders — broadcast-sized at any
    SF relative to its fact table — so the orders/customer joins attach
    to the tiny side. Measured at sf1 (interleaved A/B, min-of-4 cold):
    2.13 → 1.49 s. The HAVING filter stays on the UNROUNDED sum, exactly
    as the oracle's HAVING clause."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        # merge (not broadcast) for the orders join: the HAVING aggregate
        # is one row per qualifying ORDER — it grows linearly with the
        # fact table, so at 100 TB it is far past any broadcast threshold
        # and AQE would pick SMJ anyway; the hint makes the fixture plan
        # the same as the at-scale plan. It also measures better: AQE's
        # fixture-scale broadcast SERIALIZED agg → driver-collect →
        # broadcast → probe, while SMJ runs the lineitem-agg and orders
        # map stages concurrently. sf1 interleaved A/B min-of-2 cold:
        # 1.46 → 0.77 s; sf0.1 steady 0.131 → 0.109 s (r12).
        .hint("merge")
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round("q", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q19_disjunctive_filter",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicates across both join sides (TPC-H Q19 shape).
    Catalyst derives the common single-side conjuncts (brand/size on part,
    quantity range on lineitem) and pushes them below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "q22_inactive_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_cust,
           ROUND(AVG(c_acctbal), 2) AS avg_bal
    FROM customer
    WHERE c_acctbal > 0 AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2001-01-01'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (TPC-H Q22 shape): customers with no
    order in the fixture's final year. The anti side is pre-filtered by
    date before the shuffle. (r15: the 1998 cutoff left ~55% of the date
    range "recent", so at sf0.001 EVERY customer had a recent order and
    the result was empty — vacuous; 2001 keeps the top ~10% of the range
    recent and the result non-empty at every SF.)"""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-01-01"
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
        # ≤ 5 market segments at any SF: one partition makes the final
        # sort exchange-free (bounded result, r16)
        .coalesce(1)
        .orderBy("c_mktsegment")
    )


@query(
    "q_rollup_revenue",
    oracle="""
    SELECT r_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals (region → nation → grand total) — the
    `Expand` operator replays each row once per grouping set; dims are
    broadcast so the only big shuffle is the final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dim(nation, "nation"), cust.c_nationkey == nation.n_nationkey)
        .join(dim(region, "region"), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the non-hierarchical cousin of ROLLUP/CUBE,
    B-surface extra): per-status totals, per-priority totals, and the
    grand total in one Expand-based aggregation pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n_orders"))


@query("sketch_distinct_users")  # rows-only: HLL++ sketch is engine-local
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch
    tier of COUNT(DISTINCT): one pass, fixed memory per group, no expand
    shuffle; the 100 TB path when exact distinct (q16's two-phase expand)
    is too expensive. Accuracy vs exact pinned in pytest (rsd 0.01)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"))
        # one row per event type (bounded domain): one partition makes
        # the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("event_type")
    )


_CMS_DEPTH, _CMS_WIDTH = 5, 2048


def count_min_sketch(df: DataFrame, key: str) -> DataFrame:
    """Distributed count-min sketch over ``key``: the (depth × width)
    counter table as a DataFrame of (d, b, cnt). Built in one pass —
    explode each row into its depth bucket hits, hash-aggregate. The
    sketch is O(depth·width) rows regardless of input size; per-partition
    partial aggregation makes the shuffle the counter table, not the
    data. (PySpark 4 dropped df.stat.countMinSketch; this DataFrame
    formulation is also query-able with a join instead of a driver
    round-trip, which is what a 100 TB lookup wants anyway.)"""
    hits = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.col(key), F.lit(d)), _CMS_WIDTH).alias("b"),
            )
            for d in range(_CMS_DEPTH)
        ]
    )
    return (
        df.select(F.explode(hits).alias("h"))
        .groupBy(F.col("h.d").alias("d"), F.col("h.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, key: str) -> DataFrame:
    """CMS point lookups: min over the depth counters of each probe's
    buckets. LEFT join from the probe buckets so a (d, b) counter that is
    absent (true count 0) contributes 0 instead of being dropped from the
    min — a probe whose buckets are all empty returns est=0, not no row.
    The sketch side is broadcast: it is O(depth·width) rows bounded
    regardless of input size, so the probe scan never shuffles."""
    pb = probes.select(
        F.col(key),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(F.xxhash64(F.col(key), F.lit(d)), _CMS_WIDTH).alias("b"),
                    )
                    for d in range(_CMS_DEPTH)
                ]
            )
        ).alias("h"),
    ).select(key, F.col("h.d").alias("d"), F.col("h.b").alias("b"))
    return (
        pb.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


@query("sketch_heavy_hitters")  # rows-only: CMS estimates are engine-local
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for a deterministic ten-user
    probe set — the fixed-memory frequent-items tier: at 100 TB this
    answers "how hot is key K?" from a depth×width counter table instead
    of a groupBy over the corpus. Estimate ≥ truth always (CMS never
    undercounts); error bound vs exact counts pinned in pytest
    (tests/test_sketches.py)."""
    ev = load_table(spark, sf_dir, "events")
    sketch = count_min_sketch(ev, "user_id")
    probes = ev.select("user_id").distinct().orderBy("user_id").limit(10)
    return (
        cms_estimate(sketch, probes, "user_id")
        .select("user_id", F.col("est").alias("est_events"))
        .orderBy("user_id")
    )


@query(
    "w_lead_lag_gap",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           SUM(gap_s) AS total_gap_s,
           MAX(gap_s) AS max_gap_s
    FROM gaps GROUP BY user_id ORDER BY user_id
    """,
)
def w_lead_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG over (user, time): inter-event gap statistics per user — the
    session-gap / dwell-time shape (B9-family). One hash-partitioning
    exchange on user_id serves the window AND the following aggregate
    (same key: no re-shuffle); event_id tie-breaks equal timestamps so
    the gap sequence is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn("gap_s", gap)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("gap_s").alias("total_gap_s"),  # exact int — no float round
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("user_id")
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_daily_event_matrix",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def pivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: day × event-type count matrix — the wide dashboard shape.
    Explicit pivot values keep the plan a single pass (no extra job to
    discover values) and the schema deterministic; missing cells
    coalesce to 0 to match SQL's FILTER-count semantics."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return (
        wide.select(
            "day",
            *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
        )
        # one row per day (time-bounded, not SF-bounded): one partition
        # makes the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("day")
    )


@query(
    "table_profile",
    oracle="""
    SELECT 'event_type' AS column_name, COUNT(*) - COUNT(event_type) AS n_nulls,
           COUNT(DISTINCT event_type) AS n_distinct FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*) - COUNT(user_id), COUNT(DISTINCT user_id) FROM events
    UNION ALL
    SELECT 'value', COUNT(*) - COUNT(value), COUNT(DISTINCT value) FROM events
    ORDER BY column_name
    """,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile: null and exact distinct counts per
    column in one pass (a single multi-aggregate — Spark plans the
    distincts via one Expand, not one job per column), unpivoted to the
    (column, stat) long form catalogs store."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_type", "user_id", "value"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(c).alias(f"{c}__distinct"),
        ]
    row = ev.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(f"{c}__nulls").alias("n_nulls"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.column_name", "s.n_nulls", "s.n_distinct")
    return stacked.orderBy("column_name")


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
            AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 12 HOURS
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
            AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 12 HOURS
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase with a 12-hour conversion
    window per step (tuned so the fixture discriminates: 150/37/7 users
    at sf0.01, not everyone converts) — the event-analytics flagship
    shape. Three stage aggregates, each a key-partitioned join+min; at
    scale all three shuffle on user_id so AQE plans them as one
    co-partitioned chain (no broadcast of user-level tables, which grow
    with the data)."""
    ev = load_table(spark, sf_dir, "events")

    def first_after(stage: str, prev: DataFrame, prev_ts: str, out_ts: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == stage).select("user_id", "ts")
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("ts") > F.col(prev_ts))
                & (F.col("ts") <= F.col(prev_ts) + F.expr("INTERVAL 12 HOURS"))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    # single-row stage counts cross-joined — one lazy plan, no driver actions
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "w_topn_per_group",
    oracle="""
    SELECT event_type, event_id, value, rnk, drnk
    FROM (
        SELECT event_type, event_id, value,
               CAST(RANK() OVER (PARTITION BY event_type
                                 ORDER BY value DESC) AS INT) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY event_type
                                       ORDER BY value DESC) AS INT) AS drnk
        FROM events
    )
    WHERE drnk <= 3
    """,
)
def w_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event values per type via RANK/DENSE_RANK — the per-group
    top-N pattern. AQE + the rank filter keep per-partition state small;
    partition count = #event_type keys governs skew, not data volume."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"))
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.rank().over(w).cast("int").alias("rnk"),
            F.dense_rank().over(w).cast("int").alias("drnk"),
        )
        .filter(F.col("drnk") <= 3)
    )


@query(
    "w_moving_avg",
    oracle="""
    SELECT user_id, event_id, ts,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mavg7,
           ROUND(value - LAG(value, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
    FROM events
    """,
)
def w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average + LAG delta per user — the time-series
    smoothing pattern (B9 family). Single shuffle on user_id serves both
    window functions (same partitioning + ordering)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.avg("value").over(w.rowsBetween(-6, 0)), 4).alias("mavg7"),
        F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("delta"),
    )


# --------------------------------------------------------------------------
# Wide-join / subquery shapes (TPC-H Q7/Q8/Q9/Q13/Q15/Q16/Q17 families),
# adapted to the fixture schema: there is no partsupp table and no
# commit/receipt dates, so Q2/Q11/Q20/Q21 are not expressible; Q9 uses
# p_retailprice as the unit-cost proxy. These close the remaining physical
# shapes: self-join on a dim (two nation roles), window-over-aggregate,
# outer join + join-side filter, correlated scalar subquery, distinct agg.
# --------------------------------------------------------------------------


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
          AND n1.n_name <> n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7 shape): the nation dim joins twice
    in two roles (supplier side, customer side), restricted to ordered
    pairs among a 3-nation set. Both nation copies broadcast; the IN
    halves push to each dim scan, the <> inequality runs post-join.
    (r15: the single NATION_1↔NATION_2 pair was VACUOUS at sf0.001 —
    no lineitem crossed exactly that pair — so the compare carried zero
    rows; 6 ordered pairs over 3 nations are populated at every SF.)"""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    trio = ["NATION_1", "NATION_2", "NATION_3"]
    # r16: a selective-first restructure (pre-reducing supplier/customer
    # to trio nations before the fact joins, the q8 technique) was built,
    # measured and REJECTED: interleaved same-JVM min-of-4 cold showed it
    # consistently SLOWER at sf0.1 (0.47-0.59 → 0.71-0.76 s — the extra
    # pre-join stages cost more than the 3/25 dim cut saves when both
    # nation copies broadcast anyway and the IN-filters already push into
    # the dim scans of THIS plan), and the reassociated double-sum
    # flipped ROUND(revenue, 2) by one cent on 2/42 groups at sf1 —
    # an oracle-hash risk on any unchecked SF for zero measured gain.
    # The r11 join order stands; only the bounded final sort changed.
    pair = (
        F.col("supp_nation").isin(trio)
        & F.col("cust_nation").isin(trio)
        & (F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dim(supp, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(dim(n1, "nation"), supp.s_nationkey == F.col("n1_key"))
        .join(dim(n2, "nation"), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        # 6 ordered nation pairs × the fixture's year span at any SF:
        # one partition makes the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year, supp_nation, ROUND(SUM(volume), 2) AS revenue,
           ROUND(SUM(volume) / SUM(SUM(volume)) OVER (PARTITION BY o_year), 4)
               AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               n2.n_name AS supp_nation,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year, supp_nation
    ORDER BY o_year, supp_nation
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year supplier-nation share of a regional market (TPC-H Q8
    shape): aggregate then window-over-aggregate (share of the year
    total). The share window repartitions only the tiny aggregated
    result, never the fact table.

    Join order (r16, guide §2.3/§3): the selective reducers run FIRST —
    the part filter (p_type = ECONOMY, 1/6 of parts → 1/6 of lineitem)
    probes as a LEFT SEMI before anything else (no part column
    surfaces and p_partkey is unique, so inner ≡ semi and the build
    carries no payload), and orders is pre-reduced to the AMERICA
    region via the customer⋈nation⋈region chain (1/5 of orders, again a
    payload-free semi on the unique c_custkey) BEFORE lineitem joins
    it. Catalyst does not reorder joins without CBO stats, so the r12
    plan ran both reducers LAST: every probe row paid 6 joins before
    the 1/6 and 1/5 cuts applied. At 100 TB orders is past any
    broadcast threshold and lineitem⋈orders is the big SMJ shuffle —
    this order shrinks its lineitem side 6x and its orders side 5x
    before the exchange. Measured interleaved same-JVM min-of-N cold:
    sf0.1 0.928 → 0.938 s (wash — broadcast-floor bound), sf1
    2.09 → 1.32 s (−37%, the data-dominated reading); results
    hash-identical at sf0.001/0.01/0.1."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_am = (
        cust.join(dim(n1, "nation"), cust.c_nationkey == F.col("n1_key"))
        .join(dim(region, "region"), F.col("n1_region") == region.r_regionkey)
        .select("c_custkey")
    )
    orders_am = orders.join(
        dim(cust_am, "customer"), orders.o_custkey == cust_am.c_custkey, "left_semi"
    ).select("o_orderkey", "o_orderdate")
    vol = (
        li.join(dim(part, "part"), li.l_partkey == part.p_partkey, "left_semi")
        .join(orders_am, li.l_orderkey == orders_am.o_orderkey)
        .join(dim(supp, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(dim(n2, "nation"), supp.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            "supp_nation",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    # the aggregate is BOUNDED by key cardinality (years × nations ≤ a
    # few hundred rows at ANY scale factor), so collapse it to one
    # partition before the window/sort: SinglePartition satisfies both
    # the window's ClusteredDistribution(o_year) and the final ordering,
    # removing two post-agg exchanges (and their AQE stages — 12 → 9
    # jobs; sf1 interleaved A/B cold 1.58 → 1.45 s, r12). The same
    # pattern as broadcasting nation: bounded-cardinality data earns a
    # bounded plan.
    agg = vol.groupBy("o_year", "supp_nation").agg(
        F.sum("volume").alias("vol")
    ).coalesce(1)
    w = Window.partitionBy("o_year")
    return agg.select(
        "o_year",
        "supp_nation",
        F.round("vol", 2).alias("revenue"),
        F.round(F.col("vol") / F.sum("vol").over(w), 4).alias("mkt_share"),
    ).orderBy("o_year", "supp_nation")


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount)
                   - p_retailprice * l_quantity * 0.1
                   AS DECIMAL(38, 6)) AS amount
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and year (TPC-H Q9 shape; the fixture has
    no partsupp, so unit cost is proxied as 10% of p_retailprice). LIKE
    filter on part prunes before the fact joins; nation broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    # Decimal-summed so the aggregate is order-independent: double partial
    # sums accumulate in a partition-dependent order, and ULP drift can
    # cross the 2-dp rounding boundary (seen vs DuckDB in round 1).
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    ).cast("decimal(38,6)")
    return (
        li.join(dim(part, "part"), li.l_partkey == part.p_partkey)
        .join(dim(supp, "supplier"), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim(nation, "nation"), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
        # nations × order-years is bounded (≤ a few hundred rows) at any
        # SF: single-partition sort, same pattern as q8 (r16)
        .coalesce(1)
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of orders-per-customer (TPC-H Q13 shape): zero-order
    customers must survive, so the filter lives on the orders side of an
    outer join, never in a WHERE.

    Plan (r11): pre-aggregate ORDERS to one (custkey, count) row BEFORE
    the outer join. The r≤10 shape outer-joined raw orders against
    customer and counted after — shuffling every order row keyed by
    custkey; the pre-aggregate combines map-side, so its exchange
    carries at most one row per customer, and the join's probe side
    shrinks by the orders-per-customer factor (≥10× at TPC-H ratios,
    the same at 100 TB). ``coalesce(n, 0)`` restores the outer join's
    zero-count semantics (count("o_orderkey") over no matches).
    Measured at sf1 (interleaved A/B, min-of-4 cold): 1.51 → 0.84 s."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    ord_counts = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_ord")
    )
    per_cust = cust.join(
        ord_counts, cust.c_custkey == ord_counts.o_custkey, "left_outer"
    ).select(F.coalesce(F.col("n_ord"), F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        # the distribution has one row per DISTINCT order count — a few
        # dozen at any SF: one partition makes the final sort
        # exchange-free (bounded result, r12)
        .coalesce(1)
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-07-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    ORDER BY total_revenue DESC, s_suppkey
    LIMIT 5
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top suppliers by half-year revenue (TPC-H Q15 shape, top-5 instead
    of the float-equality MAX predicate — deterministic under rounding).
    The revenue aggregate shrinks lineitem to one row per supplier before
    the dim join, so the join input is tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-07-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    return (
        revenue.join(dim(supp, "supplier"), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.desc("total_revenue"), "s_suppkey")
        .limit(5)
    )


@query(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#2' AND p_size IN (1, 2, 3, 4, 5)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count aggregation (TPC-H Q16 shape, via lineitem since the
    fixture has no partsupp). COUNT(DISTINCT) expands to a two-phase
    partial-distinct aggregate — the dedup happens map-side per group
    before the final shuffle."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(dim(part, "part"), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        # the part-attribute domain (brands × types × 5 sizes) is fixed
        # by the generator, not the SF: one partition makes the final
        # sort exchange-free (bounded result, r16)
        .coalesce(1)
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): compare each row to
    its part's average quantity. Decorrelated as aggregate-then-join —
    the per-part threshold table is orders of magnitude smaller than
    lineitem. (AVG of integral quantities is an exact double: integer sum
    / count, so the 0.2·avg threshold is bit-identical on both engines.)"""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(dim(part, "part"), li.l_partkey == part.p_partkey)
        .join(thresh, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "b1_describe_columns",
    oracle="""
    SELECT column_name, CAST(ordinal_position AS BIGINT) AS ordinal_position
    FROM information_schema.columns
    WHERE table_name = 'lineitem'
    ORDER BY ordinal_position
    """,
)
def b1_describe_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 metadata surface (`DESCRIBE t`, services/query.go:238): the
    column inventory of a table, answered from Spark's catalog — the
    engine-side equivalent of the reference's Trino-delegated DESCRIBE.
    Pure metadata: no data files are read."""
    from philotes_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    cols = spark.catalog.listColumns("lineitem")
    return spark.createDataFrame(
        [(c.name, i + 1) for i, c in enumerate(cols)],
        "column_name string, ordinal_position long",
    ).orderBy("ordinal_position")


@query(
    "events_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4)  AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — the latency/value
    distribution query of a monitoring surface (A26/A27 family: the
    reference's Prometheus histograms answer the same question with
    fixed buckets). Spark's `percentile` and DuckDB's `quantile_cont`
    share linear-interpolation semantics, so this is oracle-exact. At
    100 TB swap in `approx_percentile` (t-digest, mergeable map-side)
    — same call shape, bounded memory."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        )
        # one row per event type (bounded domain): one partition makes
        # the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("event_type")
    )


@query(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(LEAST(GREATEST(FLOOR(value / 50), 0), 9) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY event_type), 4)
               AS share
    FROM events GROUP BY event_type, bin ORDER BY event_type, bin
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per group (the Prometheus-histogram shape of
    the reference's monitoring surface, A26/A27 family): 10 bins of
    width 50 over [0, 500), top bin clamped open-ended, with per-bin
    share of the group. One hash aggregation with map-side partials plus
    a group-keyed window for the shares — two shuffles on the same key
    at any scale. The bin arithmetic (floor + clamp) is engine-portable,
    unlike width_bucket, which DuckDB 1.0 lacks."""
    ev = load_table(spark, sf_dir, "events")
    bin_col = F.least(
        F.greatest(F.floor(F.col("value") / 50), F.lit(0)), F.lit(9)
    ).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    return (
        ev.groupBy("event_type", bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            "n",
            F.round(F.col("n") / F.sum("n").over(w), 4).alias("share"),
        )
        # event types × 10 fixed bins (bounded grid): one partition
        # makes the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("event_type", "bin")
    )


@query("sketch_percentiles")  # rows-only: approx sketch is engine-local
def sketch_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per group — the bounded-memory quantile sketch
    tier (completes the sketch trio: HLL distinct, CMS frequency,
    quantile sketch). Mergeable map-side partials, fixed accuracy budget
    (10000 ≙ ~0.01% rank error) — the 100 TB path when exact
    `events_percentiles` (full sort per group) is too expensive.
    Accuracy vs exact pinned in pytest (tests/test_sketches.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(
                F.approx_percentile("value", F.lit(0.5), F.lit(10000)), 4
            ).alias("p50"),
            F.round(
                F.approx_percentile("value", F.lit(0.95), F.lit(10000)), 4
            ).alias("p95"),
        )
        # one row per event type (bounded domain): one partition makes
        # the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("event_type")
    )


@query(
    "skew_salted_rollup",
    oracle="""
    SELECT event_type, COUNT(*) AS count_ctag, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-phase aggregation (operators/skew.py) on the events
    table — result-identical to a plain GROUP BY (that's the oracle), but
    the shuffle key is (event_type, salt): the Zipf-head group spreads
    over salt_buckets partitions before recombining. The scale path for
    aggregations whose hot key exceeds one executor's memory."""
    from philotes_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").withColumn("ctag", F.lit(1))
    out = salted_agg(ev, ["event_type"], {"ctag": "count", "value": "sum"})
    return (
        out.select(
            "event_type",
            "count_ctag",
            F.round("sum_value", 2).alias("sum_value"),
        )
        # one row per event type (bounded domain): one partition makes
        # the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("event_type")
    )


# --- TPC-H shapes beyond the fixture's tables (synthesized partsupp) --------
#
# The fixtures carry no partsupp table, so canonical Q2/Q11/Q20 cannot run
# and lineitem lacks receipt/commit dates for canonical Q21. The SHAPES —
# correlated min subquery, group-vs-global-fraction HAVING, nested
# IN-chains with a correlated half-sum, and the double-correlated
# EXISTS/NOT-EXISTS — are what matter for engine coverage, so these
# variants run them over a partsupp derived by pure integer arithmetic
# (identical in both engines) and a fixture-adapted lateness predicate.

_PS_SQL = """ps AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + i.i * 25) % 100 AS ps_suppkey,
               (p_partkey * 7 + i.i * 13) % 1000 + 1 AS ps_availqty,
               ((p_partkey * 31 + i.i * 17) % 9000 + 100) / 100.0 AS ps_supplycost
        FROM part, (SELECT UNNEST(generate_series(0, 3)) AS i) i
    )"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: 4 supplier rows per part, avail/cost from
    integer arithmetic the SQL oracle reproduces verbatim."""
    part = load_table(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    i = F.col("i")
    return part.select(
        "p_partkey", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    ).select(
        pk.alias("ps_partkey"),
        ((pk + i * 25) % 100).alias("ps_suppkey"),
        ((pk * 7 + i * 13) % 1000 + 1).alias("ps_availqty"),
        (((pk * 31 + i * 17) % 9000 + 100) / 100.0).alias("ps_supplycost"),
    )


@query(
    "q2_shape_min_cost_supplier",
    oracle=f"""
    WITH {_PS_SQL}
    SELECT s.s_acctbal, s.s_name, n.n_name, ps.ps_partkey, ps.ps_supplycost
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 10 AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost) FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, ps.ps_partkey LIMIT 100
    """,
)
def q2_shape_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost supplier per part within a region — the
    correlated MIN subquery, decorrelated Spark-side into an aggregate
    joined back on the part key (the plan Catalyst produces for the SQL
    form too). Dims broadcast; partsupp is the only shuffled side."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    eu = (
        ps.join(dim(supp, "supplier"), ps["ps_suppkey"] == supp["s_suppkey"])
        .join(dim(nat, "nation"), supp["s_nationkey"] == nat["n_nationkey"])
        .join(dim(reg, "region"), nat["n_regionkey"] == reg["r_regionkey"])
    )
    mn = eu.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("_mn"))
    return (
        eu.join(dim(part, "part"), eu["ps_partkey"] == part["p_partkey"])
        .join(mn, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("_mn"))
        .select("s_acctbal", "s_name", "n_name", "ps_partkey", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "ps_partkey")
        .limit(100)
    )


@query(
    "q11_shape_value_concentration",
    oracle=f"""
    WITH {_PS_SQL}
    SELECT ps_partkey, ROUND(SUM(ps_supplycost * ps_availqty), 2) AS value
    FROM ps JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 3
    GROUP BY ps_partkey
    HAVING SUM(ps_supplycost * ps_availqty) > (
        SELECT SUM(ps2.ps_supplycost * ps2.ps_availqty) * 0.002 FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        WHERE n2.n_regionkey = 3)
    ORDER BY value DESC, ps_partkey
    """,
)
def q11_shape_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose stock value exceeds a fraction of the
    global total — group aggregate vs broadcast global scalar (the
    HAVING-subquery decorrelation). One shuffle on the group key; the
    one-row total broadcasts."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)
    joined = (
        ps.join(dim(supp, "supplier"), ps["ps_suppkey"] == supp["s_suppkey"])
        .join(dim(nat, "nation"), supp["s_nationkey"] == nat["n_nationkey"])
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"))
    )
    vals = joined.groupBy("ps_partkey").agg(F.sum("v").alias("_v"))
    total = joined.agg((F.sum("v") * 0.002).alias("_cut"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("_v") > F.col("_cut"))
        .select("ps_partkey", F.round("_v", 2).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "q20_shape_excess_stock",
    oracle=f"""
    WITH {_PS_SQL},
    shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_name, s.s_acctbal
    FROM ps
    JOIN shipped sh ON sh.l_partkey = ps.ps_partkey AND sh.l_suppkey = ps.ps_suppkey
    JOIN part p ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size < 10 AND n.n_regionkey = 2 AND ps.ps_availqty > 0.5 * sh.qty
    ORDER BY s.s_name
    """,
)
def q20_shape_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers holding more than half the shipped quantity
    of a small part — the nested-IN chain flattened to joins, with the
    correlated half-sum decorrelated into a (part, supplier) aggregate of
    lineitem. The lineitem agg shrinks the fact before any join."""
    ps = _partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    shipped = (
        li.filter(F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    return (
        ps.join(
            shipped,
            (ps["ps_partkey"] == shipped["l_partkey"])
            & (ps["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .join(dim(part, "part"), ps["ps_partkey"] == part["p_partkey"])
        .join(dim(supp, "supplier"), ps["ps_suppkey"] == supp["s_suppkey"])
        .join(dim(nat, "nation"), supp["s_nationkey"] == nat["n_nationkey"])
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name")
    )


@query(
    "q21_shape_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q21_shape_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the sole late supplier on multi-supplier finished
    orders — the double-correlated EXISTS/NOT-EXISTS, planned as a
    left-semi (another supplier exists) + left-anti (no OTHER late
    supplier) pair. Lateness is fixture-adapted (shipped >60 days after
    order date; the fixture has no receipt/commit dates). Both
    correlated scans reuse the same late-lines projection."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    late = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).select("l_orderkey", "l_suppkey")

    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    ).distinct()
    multi = late.join(
        l2,
        (late["l_orderkey"] == l2["o2"]) & (late["l_suppkey"] != l2["s2"]),
        "left_semi",
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    ).distinct()
    sole = multi.join(
        l3,
        (multi["l_orderkey"] == l3["o3"]) & (multi["l_suppkey"] != l3["s3"]),
        "left_anti",
    )
    return (
        sole.join(dim(supp, "supplier"), sole["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    )
    SELECT f.cohort_day,
           CAST(a.day - f.cohort_day AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity a JOIN firsts f USING (user_id)
    WHERE a.day - f.cohort_day <= 7
    GROUP BY f.cohort_day, day_offset
    ORDER BY f.cohort_day, day_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — users grouped by first-seen day, counted
    on each subsequent active day (offsets 0..7): the canonical
    product-analytics rollup a warehouse serves daily, and a two-level
    self-dependent aggregation (first-touch per user, then distinct
    activity joined back to it).

    Scale shape: both the first-touch aggregate and the distinct
    activity set shuffle on user_id — one exchange feeds both (the join
    runs on the shared partitioning), then the (cohort, offset) rollup
    is a second small shuffle with map-side partials. No window over the
    raw event log."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        # cohort days × 8 offsets (time-bounded grid): one partition
        # makes the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "events_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS median_value
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.median_value,
               abs(e.value - m.median_value) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad_raw
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ROUND(ANY_VALUE(d.median_value), 4) AS median_value,
           ROUND(ANY_VALUE(m.mad_raw), 4) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * m.mad_raw
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per series: exact median + median
    absolute deviation (MAD, scaled by the 1.4826 normal-consistency
    constant), counting points beyond 3 scaled MADs — the
    monitoring-grade alternative to z-scores (metric_anomaly_zscore)
    when the metric has heavy tails; also the engine's EXACT
    percentile surface (`percentile`), complementing the
    approx_percentile sketch tier (sketch_percentiles).

    Scale shape: two grouped exact percentiles (each one event_type-keyed
    shuffle; exact percentile sorts within groups — the honest cost of
    exactness, the sketch tier is the scale path when rank error is
    acceptable) with the per-type medians broadcast back against the
    fact rows."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("median_value")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "median_value",
        F.abs(F.col("value") - F.col("median_value")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_raw")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("median_value"), 4).alias("median_value"),
            F.round(F.any_value("mad_raw"), 4).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad_raw"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "unpivot_event_matrix",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    HAVING COUNT(*) > 0 ORDER BY 1, 2
    """,
)
def unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide day x event-type matrix from
    pivot_daily_event_matrix turned back into tidy long form with
    ``DataFrame.unpivot`` (SQL ``stack``) — the wide->long half of the
    reshaping surface, and a round-trip proof: unpivot(pivot(x)) must
    equal the plain long-form aggregation, which is exactly what the
    oracle computes directly. Zero-count cells (introduced by the pivot
    fill) are dropped to restore the original group set.

    Scale shape: unpivot is a projection (each wide row explodes to
    n_types rows) — no shuffle beyond the pivot's own aggregate."""
    wide = pivot_daily_event_matrix.__wrapped__(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["day"],
            values=_EVENT_TYPES,
            variableColumnName="event_type",
            valueColumnName="n",
        )
        .filter(F.col("n") > 0)
        # day × event-type grid (time × bounded domain): one partition
        # makes the final sort exchange-free (r16)
        .coalesce(1)
        .orderBy("day", "event_type")
    )


@query(
    "w_rank_family",
    oracle="""
    SELECT event_id,
           event_type,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           CAST(RANK() OVER w2 AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w2 AS INT) AS drnk,
           ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 4) AS cume,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           FIRST_VALUE(event_id) OVER w AS first_eid,
           LAST_VALUE(event_id) OVER
               (PARTITION BY event_type ORDER BY value, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS last_eid
    FROM events
    WHERE event_id <= 200
    WINDOW w  AS (PARTITION BY event_type ORDER BY value, event_id),
           w2 AS (PARTITION BY event_type
                  ORDER BY CAST(floor(value / 10) AS INT))
    ORDER BY event_id
    """,
)
def w_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete ranking-window family in one frame: row_number /
    rank / dense_rank (with ties, via a bucketed order), percent_rank,
    cume_dist, ntile, first_value, and last_value over an explicit
    full-partition frame (the classic default-frame trap: LAST_VALUE
    under the default RANGE..CURRENT ROW frame returns the current row —
    pinned here with the corrected frame). One event_type-keyed shuffle
    serves every function; ties are broken by event_id wherever the
    result would otherwise be order-dependent."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    w2 = Window.partitionBy("event_type").orderBy(
        F.floor(F.col("value") / 10).cast("int")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.filter(F.col("event_id") <= 200)
        .select(
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w2).alias("rnk"),
            F.dense_rank().over(w2).alias("drnk"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
            F.first("event_id").over(w).alias("first_eid"),
            F.last("event_id").over(wfull).alias("last_eid"),
        )
        .orderBy("event_id")
    )


_RECURSIVE_CHAIN_SQL = """
    WITH RECURSIVE chain(u, anc, depth) AS (
        SELECT DISTINCT user_id AS u, user_id AS anc, 0 AS depth
        FROM events WHERE user_id < 100
        UNION ALL
        SELECT u, CAST(floor(anc / 2.0) AS BIGINT), depth + 1
        FROM chain WHERE anc > 0
    )
    SELECT u, CAST(MAX(depth) AS INT) AS depth_to_root,
           CAST(COUNT(*) AS BIGINT) AS n_ancestors
    FROM chain GROUP BY u ORDER BY u
"""


@query("q_recursive_hierarchy", oracle=_RECURSIVE_CHAIN_SQL)
def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE — new in Spark 4): walk the
    synthetic ancestor chain u -> floor(u/2) -> ... -> 0 for every user
    id, reporting chain depth and ancestor count — the transitive
    closure / hierarchy-walk shape (org charts, BOM explosions,
    reachability) that needed the iterative-DataFrame workaround before
    Spark 4 parsed the statement natively. The IDENTICAL statement text
    runs on both engines; each recursion step is a distributed
    self-union, depth bounded at ceil(log2(max u)).

    (The engine's own iterative tier — large-star/small-star connected
    components — remains the scale path for graph closure over edges
    that don't shrink geometrically; this pins the SQL-statement
    surface.)"""
    from philotes_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_CHAIN_SQL)
