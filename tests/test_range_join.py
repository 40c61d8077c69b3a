"""Bucketized range join semantics: inclusive bounds, bucket-boundary
crossings, key isolation, and the equi-join (never quadratic) plan."""

from __future__ import annotations

import datetime as dt

from philotes_spark.operators.range_join import bucketed_range_join


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, 100, _t(10, 0)),
            (2, 100, _t(10, 30)),
            (3, 100, _t(11, 0, 1)),
            (4, 200, _t(10, 30)),  # other key, same time
        ],
        "pid long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        # 10:00–11:00 crosses an hour-bucket boundary when bucket=30min
        [(7, 100, _t(10, 0), _t(11, 0))],
        "iid long, user_id long, start timestamp, end timestamp",
    )
    return points, intervals


def test_inclusive_bounds_and_key_isolation(spark):
    points, intervals = _frames(spark)
    got = sorted(
        r.pid
        for r in bucketed_range_join(points, intervals, on="user_id").collect()
    )
    # 1 (== start) and 2 (inside) match; 3 is 1s past end; 4 is another key
    assert got == [1, 2]


def test_interval_crossing_many_buckets(spark):
    points, intervals = _frames(spark)
    for bucket_s in (60, 1800, 3600, 86400):
        got = sorted(
            r.pid
            for r in bucketed_range_join(
                points, intervals, on="user_id", bucket_s=bucket_s
            ).collect()
        )
        assert got == [1, 2], f"bucket_s={bucket_s}"


def test_no_duplicate_matches_across_buckets(spark):
    # a point matching an interval that spans many buckets must appear once
    points = spark.createDataFrame(
        [(1, 5, _t(12, 0))], "pid long, user_id long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(9, 5, _t(0, 0), _t(23, 0))],
        "iid long, user_id long, start timestamp, end timestamp",
    )
    rows = bucketed_range_join(points, intervals, on="user_id", bucket_s=600).collect()
    assert len(rows) == 1 and rows[0].iid == 9


def test_equi_join_plan_not_quadratic(spark):
    from philotes_spark.plans import audit

    points, intervals = _frames(spark)
    a = audit(bucketed_range_join(points, intervals, on="user_id"))
    assert "CartesianProduct" not in a.plan
    assert "BroadcastNestedLoopJoin" not in a.plan
