"""As-of join operator semantics: backward inclusive match, timestamp
ties, missing-match nulls, tie-break among equal right timestamps, and
the tolerance lookback."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from philotes_spark.operators.asof import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 12, m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 100, _t(10)), (2, 100, _t(30)), (3, 200, _t(5)), (4, 300, _t(50))],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (11, 100, _t(0)),
            (12, 100, _t(10)),  # equal to left lid=1's ts: inclusive match
            (13, 100, _t(20)),
            (21, 200, _t(7)),  # after left lid=3: no match
        ],
        "rid long, user_id long, ts timestamp",
    )
    return left, right


def test_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    got = {
        r.lid: r.rid for r in asof_join(left, right, on="user_id").collect()
    }
    assert got[1] == 12  # equal timestamp matches (inclusive)
    assert got[2] == 13  # latest prior, not first
    assert got[3] is None  # right row exists but is later
    assert got[4] is None  # key never on the right


def test_equal_timestamp_right_rows_pick_greatest_tiebreak(spark):
    left = spark.createDataFrame([(1, 5, _t(10))], "lid long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(7, 5, _t(3)), (9, 5, _t(3)), (8, 5, _t(3))],
        "rid long, user_id long, ts timestamp",
    )
    (row,) = asof_join(left, right, on="user_id", tiebreak="rid").collect()
    assert row.rid == 9
    assert row.asof_ts == _t(3)


def test_tolerance_drops_stale_matches(spark):
    left, right = _frames(spark)
    got = {
        r.lid: r.rid
        for r in asof_join(
            left, right, on="user_id", tolerance_s=600
        ).collect()
    }
    assert got[1] == 12  # 0s gap: fresh
    assert got[2] == 13  # 10 min gap: exactly at tolerance
    got_tight = {
        r.lid: r.rid
        for r in asof_join(left, right, on="user_id", tolerance_s=59).collect()
    }
    assert got_tight[2] is None  # 10 min gap > 59s: dropped
    assert got_tight[1] == 12  # 0s gap survives


def test_single_shuffle_plan(spark):
    from philotes_spark.plans import audit

    left, right = _frames(spark)
    a = audit(asof_join(left, right, on="user_id"))
    # union + one window over (key, time): exactly one hash exchange,
    # never a range join / cartesian
    assert a.shuffles == 1, a.plan
    assert "CartesianProduct" not in a.plan
    assert "BroadcastNestedLoopJoin" not in a.plan


def test_forward_direction_and_pandas_parity(spark):
    """Randomized cross-check against pandas merge_asof in BOTH
    directions: same keys, duplicate timestamps, tolerance — the library
    oracle pins the semantics (backward: last right <= t, greatest id on
    ties; forward: first right >= t, smallest id on ties)."""
    import random

    import pandas as pd

    from philotes_spark.operators.asof import asof_join

    rng = random.Random(5)
    base = 1_700_000_000
    left_rows = [
        (k, base + rng.randrange(0, 50), i)
        for i, k in enumerate(rng.choices(["a", "b", "c"], k=40))
    ]
    right_rows = [
        (k, base + rng.randrange(0, 50), 100 + i, rng.random())
        for i, k in enumerate(rng.choices(["a", "b", "c"], k=40))
    ]
    lpdf = pd.DataFrame(left_rows, columns=["k", "t", "lid"])
    rpdf = pd.DataFrame(right_rows, columns=["k", "t", "rid", "val"])

    ldf = spark.createDataFrame(lpdf).select(
        "k", F.col("t").cast("timestamp").alias("ts"), "lid"
    )
    rdf = spark.createDataFrame(rpdf).select(
        "k", F.col("t").cast("timestamp").alias("ts"), "rid", "val"
    )

    for direction, tol in [("backward", None), ("forward", None),
                           ("backward", 5), ("forward", 5)]:
        # pandas: sort right so its tie pick matches the documented rule
        # (backward takes the last matching row, forward the first)
        rsort = rpdf.sort_values(["t", "rid"]).reset_index(drop=True)
        want = pd.merge_asof(
            lpdf.sort_values(["t", "lid"]).reset_index(drop=True),
            rsort,
            on="t",
            by="k",
            direction=direction,
            tolerance=tol,
            suffixes=("", "_r"),
        )
        wmap = {
            r.lid: (None if pd.isna(r.rid) else int(r.rid))
            for r in want.itertuples()
        }
        got = asof_join(
            ldf, rdf, on="k", tiebreak="rid", tolerance_s=tol,
            direction=direction,
        ).collect()
        gmap = {r.lid: r.rid for r in got}
        assert gmap == wmap, f"direction={direction} tol={tol}"
