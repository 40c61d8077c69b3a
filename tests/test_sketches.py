"""Sketch-tier accuracy: approx_count_distinct must track exact distinct
within its configured rsd (the rows-only driver check can't see accuracy).
"""

from pyspark.sql import functions as F

from philotes_spark.sources.catalog import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01).alias("n"))
        .collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.05 * exact[k]), (
            k, approx[k], exact[k],
        )
