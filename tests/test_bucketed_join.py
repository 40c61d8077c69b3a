"""Bucketed co-located join: the write-once-shuffle-never-again contract.
The plan audit proves the join runs with ZERO exchanges — the scale
technique that makes repeated fact⋈fact joins viable at 100 TB."""

import uuid

import pytest
from pyspark.sql import functions as F

from philotes_spark.plans import audit
from philotes_spark.sources.bucketed import bucketed_join, write_bucketed
from philotes_spark.sources.catalog import load_table


@pytest.fixture()
def tables(spark, sf_dir):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"), t_orders, "custkey")
    write_bucketed(cust.withColumnRenamed("c_custkey", "custkey"), t_cust, "custkey")
    yield t_orders, t_cust
    for t in (t_orders, t_cust):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_zero_exchanges(spark, tables):
    t_orders, t_cust = tables
    joined = bucketed_join(spark, t_orders, t_cust, "custkey")
    a = audit(joined)
    assert a.shuffles == 0, (
        f"bucket-aligned join must not exchange, saw {a.shuffles} shuffles"
    )


def test_bucketed_join_results_match_plain_join(spark, sf_dir, tables):
    t_orders, t_cust = tables
    joined = bucketed_join(spark, t_orders, t_cust, "custkey")
    got = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    want = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_mismatched_bucket_counts_still_correct(spark, sf_dir):
    # different bucket counts lose the co-location (Spark re-shuffles one
    # side) but never correctness — the degraded mode is safe
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"b_a_{suffix}", f"b_b_{suffix}"
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    try:
        write_bucketed(orders, ta, "custkey", n_buckets=16)
        write_bucketed(cust, tb, "custkey", n_buckets=8)
        n = bucketed_join(spark, ta, tb, "custkey").count()
        assert n == orders.join(cust, "custkey").count()
    finally:
        for t in (ta, tb):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
