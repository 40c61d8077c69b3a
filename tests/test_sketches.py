"""Sketch-tier accuracy: approx_count_distinct must track exact distinct
within its configured rsd (the rows-only driver check can't see accuracy).
"""

from pyspark.sql import functions as F

from philotes_spark.sources.catalog import load_table


def test_count_min_sketch_bounds(spark, sf_dir):
    """CMS never undercounts; overcount is bounded by ~e·N/width (w.h.p.)."""
    from philotes_spark.operators.relational import (
        _CMS_WIDTH,
        cms_estimate,
        count_min_sketch,
    )

    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()
    sketch = count_min_sketch(ev, "user_id")
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    probes = spark.createDataFrame(
        [(u,) for u in sorted(exact)[:25]], "user_id long"
    )
    ests = {
        r.user_id: r.est for r in cms_estimate(sketch, probes, "user_id").collect()
    }
    slack = 3 * 2.72 * n_total / _CMS_WIDTH  # 3× the e·N/w expected bound
    for u, est in ests.items():
        assert est >= exact[u], f"CMS undercounted user {u}"
        assert est <= exact[u] + max(3, slack), (u, est, exact[u])


def test_cms_absent_probe_returns_zero(spark, sf_dir):
    """A probe key whose (d,b) counters are all empty must return est=0,
    not disappear from the output (left-join + coalesce semantics). With
    a populated sketch all buckets may collide with real keys, so build
    the sketch from a single row — the probe's five buckets are then
    almost surely empty, and even under collision est is the min over
    depth counters of a 1-row sketch, i.e. 0 or 1, still a row."""
    from philotes_spark.operators.relational import cms_estimate, count_min_sketch

    one = spark.createDataFrame([(1,)], "user_id long")
    sketch = count_min_sketch(one, "user_id")
    probes = spark.createDataFrame([(999_999_999,), (1,)], "user_id long")
    ests = {r.user_id: r.est for r in cms_estimate(sketch, probes, "user_id").collect()}
    assert ests[1] == 1
    assert 999_999_999 in ests, "absent probe dropped from CMS output"
    assert ests[999_999_999] in (0, 1)


def test_heavy_hitters_query_matches_sketch_contract(spark, sf_dir):
    from philotes_spark import registry

    registry.load_all()
    rows = registry.QUERIES["sketch_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 10
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r.est_events >= exact[r.user_id]


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


def test_approx_percentile_within_rank_error(spark, sf_dir):
    from philotes_spark import registry

    registry.load_all()
    approx = {
        r.event_type: (r.p50, r.p95)
        for r in registry.QUERIES["sketch_percentiles"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: (r.p50, r.p95)
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        for a, e in zip(approx[k], exact[k]):
            # accuracy 10000 ⇒ sub-percent rank error; values are ~U(0,100)
            assert abs(a - e) <= max(1.0, 0.05 * e), (k, a, e)
