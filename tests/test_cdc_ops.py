"""Unit tests for the CDC operator kernel (SURVEY §2A A2/A8, §2B B10/B11)
— the op-code map, dedup-to-latest determinism under replays and
out-of-order delivery, DELETE/TRUNCATE current-state semantics, and
buffer stats. Mirrors the reference's table-driven style
(internal/cdc/types_test.go, buffer_test.go).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from philotes_spark.operators.cdc import (
    apply_cdc,
    buffer_stats,
    latest_view,
    op_from_wal_action,
    with_cdc_system_columns,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _log(spark, rows):
    """rows: (key, ts_offset_min, lsn, op, payload)"""
    data = [
        (k, T0 + dt.timedelta(minutes=m), lsn, op, p) for k, m, lsn, op, p in rows
    ]
    return spark.createDataFrame(
        data, "key long, _cdc_timestamp timestamp, _cdc_lsn string, _cdc_operation string, v string"
    )


def test_op_code_map(spark):
    df = spark.createDataFrame([("I",), ("U",), ("D",), ("T",), ("X",)], ["a"])
    out = df.select(op_from_wal_action(F.col("a")).alias("op")).collect()
    assert [r.op for r in out] == ["INSERT", "UPDATE", "DELETE", "TRUNCATE", None]


def test_system_columns(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    out = with_cdc_system_columns(
        df, F.lit("INSERT"), F.lit(T0), F.lit("0/1")
    )
    assert out.columns == ["id", "_cdc_operation", "_cdc_timestamp", "_cdc_lsn"]


def test_latest_view_picks_newest(spark):
    df = _log(
        spark,
        [
            (1, 0, "0/1", "INSERT", "v1"),
            (1, 5, "0/2", "UPDATE", "v2"),
            (2, 1, "0/3", "INSERT", "w1"),
        ],
    )
    out = {r.key: r.v for r in latest_view(df, ["key"]).collect()}
    assert out == {1: "v2", 2: "w1"}


def test_latest_view_replay_deduplicates(spark):
    # at-least-once redelivery: the same (ts, lsn) row appears twice —
    # row_number (not rank) guarantees exactly one survivor
    df = _log(
        spark,
        [
            (1, 0, "0/1", "INSERT", "v1"),
            (1, 5, "0/2", "UPDATE", "v2"),
            (1, 5, "0/2", "UPDATE", "v2"),  # replay
        ],
    )
    out = latest_view(df, ["key"]).collect()
    assert len(out) == 1 and out[0].v == "v2"


def test_latest_view_out_of_order_resolves_by_lsn(spark):
    # same timestamp, different lsn → lsn breaks the tie
    df = _log(
        spark,
        [
            (1, 5, "0/9", "UPDATE", "newer"),
            (1, 5, "0/8", "UPDATE", "older"),
        ],
    )
    out = latest_view(df, ["key"]).collect()
    assert out[0].v == "newer"


def test_latest_view_agrees_with_agg_twin(spark):
    """The max_by-aggregate twin and the serving window (ROW_NUMBER=1)
    plan must produce identical rows AND identical column order on a log
    with multiple versions, out-of-order arrivals and several keys
    (agreement pin for the r07 default swap back to the window plan)."""
    from philotes_spark.operators.cdc import latest_view_agg

    rows = [
        (k, ts, lsn, f"v{k}-{ts}-{lsn}", op)
        for k in range(7)
        for (ts, lsn, op) in [
            (5, 2, "INSERT"), (9, 1, "UPDATE"), (9, 3, "UPDATE"),
            (2, 9, "UPDATE"), (7, 7, "DELETE"),
        ]
    ]
    df = spark.createDataFrame(
        rows, "key int, _cdc_timestamp int, _cdc_lsn int, v string, op string"
    )
    a = latest_view(df, ["key"])
    b = latest_view_agg(df, ["key"])
    assert a.columns == b.columns == df.columns
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # the winner is the (ts, lsn)-max version for every key
    assert all(r[1] == 9 and r[2] == 3 for r in ra)


def test_latest_view_randomized_against_python_reference(spark):
    """Randomized (seeded) three-way agreement: max_by plan == window
    plan == a pure-Python fold, over logs with random key collisions,
    orderings and null values — the matrix a fixed example can't cover."""
    import random

    from philotes_spark.operators.cdc import latest_view_window

    rng = random.Random(1306)
    for trial in range(3):
        rows = [
            (
                rng.randrange(12),                      # key
                rng.randrange(40),                      # ts
                rng.randrange(10_000),                  # lsn (tie-break)
                rng.choice(["x", "y", None]),           # nullable payload
            )
            for _ in range(rng.randrange(30, 120))
        ]
        # unique (ts, lsn) per key: drop accidental full-order ties the
        # way a real LSN stream guarantees
        seen, log = set(), []
        for k, ts, lsn, v in rows:
            if (k, ts, lsn) not in seen:
                seen.add((k, ts, lsn))
                log.append((k, ts, lsn, v))
        df = spark.createDataFrame(
            log, "key int, _cdc_timestamp int, _cdc_lsn int, v string"
        )
        got_agg = sorted(map(tuple, latest_view(df, ["key"]).collect()))
        got_win = sorted(map(tuple, latest_view_window(df, ["key"]).collect()))
        best: dict = {}
        for k, ts, lsn, v in log:
            if k not in best or (ts, lsn) > (best[k][1], best[k][2]):
                best[k] = (k, ts, lsn, v)
        want = sorted(best.values())
        assert got_agg == want, f"trial {trial}: max_by plan diverged"
        assert got_win == want, f"trial {trial}: window plan diverged"


def test_apply_cdc_drops_deleted_keys(spark):
    df = _log(
        spark,
        [
            (1, 0, "0/1", "INSERT", "v1"),
            (1, 5, "0/2", "DELETE", None),
            (2, 1, "0/3", "INSERT", "w1"),
        ],
    )
    out = apply_cdc(df, ["key"]).collect()
    assert [r.key for r in out] == [2]


def test_apply_cdc_resurrected_key_survives(spark):
    df = _log(
        spark,
        [
            (1, 0, "0/1", "INSERT", "v1"),
            (1, 5, "0/2", "DELETE", None),
            (1, 9, "0/3", "INSERT", "v3"),  # re-inserted after delete
        ],
    )
    out = apply_cdc(df, ["key"]).collect()
    assert len(out) == 1 and out[0].v == "v3"


def test_apply_cdc_truncate_wipes_earlier_rows(spark):
    df = _log(
        spark,
        [
            (1, 0, "0/1", "INSERT", "v1"),
            (2, 1, "0/2", "INSERT", "w1"),
            (None, 5, "0/3", "TRUNCATE", None),  # table-wide wipe
            (3, 9, "0/4", "INSERT", "x1"),  # only post-truncate row survives
        ],
    )
    out = apply_cdc(df, ["key"]).collect()
    assert [(r.key, r.v) for r in out] == [(3, "x1")]


def test_apply_cdc_no_truncate_is_noop_path(spark):
    df = _log(spark, [(1, 0, "0/1", "INSERT", "v1")])
    out = apply_cdc(df, ["key"]).collect()
    assert len(out) == 1


def test_apply_cdc_truncate_cut_is_exclusive_and_lexicographic(spark):
    # the row AT the cut position dies; a row with equal first ordering
    # column but larger tie-break survives (r9 literal-predicate rewrite
    # must keep strict lexicographic > semantics)
    df = _log(
        spark,
        [
            (1, 5, "0/3", "INSERT", "at-cut"),  # == cut → wiped
            (2, 5, "0/4", "INSERT", "tie-ts"),  # same ts, later lsn → lives
            (3, 4, "0/9", "INSERT", "older"),  # earlier ts → wiped
            (None, 5, "0/3", "TRUNCATE", None),
        ],
    )
    out = sorted((r.key, r.v) for r in apply_cdc(df, ["key"]).collect())
    assert out == [(2, "tie-ts")]


def test_apply_cdc_truncate_null_order_field_falls_back(spark):
    # a TRUNCATE whose ordering tuple contains a null takes the
    # struct-comparison fallback: null comparisons are null → dropped,
    # matching the pre-r9 broadcast plan exactly
    df = _log(
        spark,
        [
            (1, 4, "0/1", "INSERT", "v1"),
            (None, 5, None, "TRUNCATE", None),  # null lsn in the cut
            (2, 9, "0/4", "INSERT", "w1"),
        ],
    )
    out = sorted((r.key, r.v) for r in apply_cdc(df, ["key"]).collect())
    assert out == [(2, "w1")]


def test_apply_cdc_not_truncate_aware_skips_cut_scan(spark):
    # truncate_aware=False: single window shuffle, no scalar pre-pass;
    # semantics equal the aware path when no TRUNCATE exists
    df = _log(
        spark,
        [
            (1, 0, "0/1", "INSERT", "v1"),
            (1, 5, "0/2", "UPDATE", "v2"),
            (2, 1, "0/3", "DELETE", None),
        ],
    )
    from philotes_spark.plans.audit import count_shuffles

    out = apply_cdc(df, ["key"], truncate_aware=False)
    assert count_shuffles(out) == 1  # before collect: AQE-final explain repeats the plan
    assert [(r.key, r.v) for r in out.collect()] == [(1, "v2")]


def test_buffer_stats(spark):
    rows = [
        (1, T0, T0),
        (2, T0 + dt.timedelta(minutes=1), None),
        (3, T0 + dt.timedelta(minutes=2), None),
    ]
    df = spark.createDataFrame(
        rows, "id long, created_at timestamp, processed_at timestamp"
    )
    s = buffer_stats(df).collect()[0]
    assert s.total_events == 3
    assert s.unprocessed_events == 2
    assert s.oldest_unprocessed == T0 + dt.timedelta(minutes=1)
