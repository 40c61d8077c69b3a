"""Salted join / salted aggregation must be result-identical to their
un-salted equivalents (the salt is a physical-plan concern only) and must
actually spread a hot key across partitions.
"""

import pytest
from pyspark.sql import functions as F

from philotes_spark.operators.skew import _SALT, salted_agg, salted_join
from philotes_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def skewed(spark):
    # 10_000 rows, 90% on one hot key — the Zipf head that breaks a
    # per-key partition at scale
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 97).cast("long"))
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(97).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k", "label").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("s")
    )
    salted = salted_join(skewed, dim, "k", salt_buckets=8).groupBy(
        "k", "label"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(skewed, dim):
    some_dim = dim.filter(F.col("k") < 50)
    out = salted_join(skewed, some_dim, "k", how="left", salt_buckets=4)
    plain = skewed.join(some_dim, "k", "left")
    assert out.count() == plain.count()
    assert out.filter(F.col("label").isNull()).count() == plain.filter(
        F.col("label").isNull()
    ).count()


def test_salted_join_rejects_outer(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="full")


def test_salt_spreads_hot_key(skewed):
    # the hot key k=0 must occupy >1 salt bucket — that's the whole point
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8))
    buckets = (
        skewed.withColumn(_SALT, salt)
        .filter(F.col("k") == 0)
        .select(_SALT)
        .distinct()
        .count()
    )
    assert buckets == 8


def test_salted_agg_matches_plain_agg(skewed):
    plain = skewed.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count("v").alias("count_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    salted = salted_agg(
        skewed, ["k"], {"v": "sum"}, salt_buckets=8
    ).join(
        salted_agg(skewed, ["k"], {"v": "count"}, salt_buckets=8), "k"
    ).join(
        salted_agg(skewed, ["k"], {"v": "min"}, salt_buckets=8), "k"
    ).join(
        salted_agg(skewed, ["k"], {"v": "max"}, salt_buckets=8), "k"
    )
    a = {r.k: (r.sum_v, r.count_v, r.min_v, r.max_v) for r in plain.collect()}
    b = {r.k: (r.sum_v, r.count_v, r.min_v, r.max_v) for r in salted.collect()}
    assert a == b


def test_salted_agg_rejects_avg(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"v": "avg"})


def test_salted_agg_on_fixture_matches_direct(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r.event_type): (r.n, round(r.s, 2))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = {
        (r.event_type): (r.count_ctag, round(r.sum_value, 2))
        for r in salted_agg(
            ev.withColumn("ctag", F.lit(1)),
            ["event_type"],
            {"ctag": "count", "value": "sum"},
        ).collect()
    }
    assert direct == salted
