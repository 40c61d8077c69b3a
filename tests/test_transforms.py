"""Partition-transform unit pins.

The bucket transform is only interop-correct if the hash matches
Iceberg's spec exactly (murmur3_x86_32, seed 0, the spec's byte forms) —
an external engine prunes published bucket partitions by computing the
same hash, so a seed or byte-form mismatch silently reads the WRONG
partition. Pin against the Iceberg table-spec Appendix-B test vectors.
"""

import datetime as dt
import struct

import numpy as np
import pytest

from philotes_spark.sources.transforms import (
    PartField,
    bucket_value,
    day_value,
    derived_field_names,
    murmur3_32,
    murmur3_long_vec,
    parse_part_field,
    parse_spec,
    rest_transform,
)


def test_murmur3_spec_vectors():
    # Iceberg table spec, Appendix B "32-bit Hash Requirements"
    assert murmur3_32(struct.pack("<q", 34)) == 2017239379  # int/long 34
    assert murmur3_32("iceberg".encode()) == 1210000089  # string
    d = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert murmur3_32(struct.pack("<q", d)) == -653330422  # date
    ts = dt.datetime(2017, 11, 16, 22, 31, 8, tzinfo=dt.timezone.utc)
    micros = int(ts.timestamp() * 1_000_000)
    assert murmur3_32(struct.pack("<q", micros)) == -2047944441  # timestamptz


def test_vectorized_long_hash_matches_scalar():
    vals = np.array(
        [34, 0, -1, 1, 2**62, -(2**62), 86400000000, 17298], dtype=np.int64
    )
    got = murmur3_long_vec(vals)
    want = [murmur3_32(struct.pack("<q", int(v))) for v in vals]
    assert got.tolist() == want


def test_bucket_and_day_scalars():
    assert bucket_value(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert bucket_value("iceberg", 16) == (1210000089 & 0x7FFFFFFF) % 16
    assert bucket_value(None, 16) is None
    assert day_value(dt.datetime(1970, 1, 2, 0, 0, 1)) == 1
    assert day_value(dt.date(2017, 11, 16)) == 17486
    assert day_value(None) is None


def test_parse_spec_strings():
    assert parse_part_field("cat") == PartField("cat", "identity", "cat", None, "cat")
    assert parse_part_field("days(ts)") == PartField(
        "days(ts)", "day", "ts", None, "ts_day"
    )
    assert parse_part_field("day( ts )").raw == "days(ts)"  # canonicalized
    assert parse_part_field("bucket(16, id)") == PartField(
        "bucket(16,id)", "bucket", "id", 16, "id_bucket"
    )
    assert derived_field_names(["cat", "days(ts)", "bucket(4,id)"]) == [
        "ts_day",
        "id_bucket",
    ]
    assert [rest_transform(pf) for pf in parse_spec(["cat", "days(ts)", "bucket(4,id)"])] == [
        "identity",
        "day",
        "bucket[4]",
    ]
    for bad in ("bucket(0,id)", "days(1x)", "md5(col)", "a b"):
        with pytest.raises(ValueError):
            parse_part_field(bad)


def test_transform_columns_match_driver_scalars(spark):
    """The JVM day expression and the Arrow bucket UDF must agree with
    the driver-side scalar forms (which the planner/test oracles use)."""
    from philotes_spark.sources.transforms import with_partition_cols

    df = spark.createDataFrame(
        [
            (1, "alpha", dt.datetime(2024, 1, 5, 23, 59, 59)),
            (2, "beta", dt.datetime(1969, 12, 31, 23, 0, 0)),
            (3, None, None),
        ],
        "id long, s string, ts timestamp",
    )
    out, names = with_partition_cols(
        df, ["bucket(8,id)", "bucket(8,s)", "days(ts)"]
    )
    assert names == ["id_bucket", "s_bucket", "ts_day"]
    rows = {r.id: r for r in out.collect()}
    for r in df.collect():
        assert rows[r.id].id_bucket == bucket_value(r.id, 8)
        assert rows[r.id].s_bucket == bucket_value(r.s, 8)
        assert rows[r.id].ts_day == day_value(r.ts)
    # negative pre-epoch timestamp floors DOWN (UTC day -1), not toward 0
    assert rows[2].ts_day == -1


def test_hour_month_year_truncate_scalars():
    from philotes_spark.sources.transforms import (
        hour_value,
        month_value,
        parse_part_field,
        rest_transform,
        truncate_value,
        year_value,
    )

    assert hour_value(dt.datetime(1970, 1, 2, 3, 30)) == 27
    assert month_value(dt.datetime(2024, 3, 15)) == (2024 - 1970) * 12 + 2
    assert year_value(dt.date(2017, 11, 16)) == 47
    assert truncate_value(-7, 5) == -10  # floors, not toward zero
    assert truncate_value(13, 5) == 10
    assert truncate_value("iceberg", 3) == "ice"
    pf = parse_part_field("hours(ts)")
    assert (pf.transform, pf.name) == ("hour", "ts_hour")
    assert rest_transform(pf) == "hour"
    assert rest_transform(parse_part_field("truncate(5, id)")) == "truncate[5]"
    assert rest_transform(parse_part_field("months(ts)")) == "month"


def test_hour_column_matches_scalar(spark):
    from philotes_spark.sources.transforms import hour_value, with_partition_cols

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5, 23, 59)), (2, dt.datetime(1969, 12, 31, 22, 30))],
        "id long, ts timestamp",
    )
    out, names = with_partition_cols(df, ["hours(ts)"])
    assert names == ["ts_hour"]
    rows = {r.id: r.ts_hour for r in out.collect()}
    for r in df.collect():
        assert rows[r.id] == hour_value(r.ts)
    assert rows[2] == -2  # pre-epoch floors down


# --- property-based pins (hypothesis) -----------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=50))
def test_vectorized_murmur3_matches_scalar_property(vals):
    """The numpy uint32-wraparound pipeline must equal the scalar
    reference for ANY int64 — overflow corners included."""
    got = murmur3_long_vec(np.array(vals, dtype=np.int64)).tolist()
    want = [murmur3_32(struct.pack("<q", v)) for v in vals]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**40), max_value=2**40),
       st.integers(min_value=-(2**40), max_value=2**40),
       st.integers(min_value=1, max_value=10**6))
def test_truncate_monotonic_and_idempotent(a, b, w):
    from philotes_spark.sources.transforms import truncate_value

    ta, tb = truncate_value(a, w), truncate_value(b, w)
    if a <= b:
        assert ta <= tb  # order-preserving: range pruning is sound
    assert ta % w == 0 and ta <= a < ta + w  # floors into the bucket
    assert truncate_value(ta, w) == ta  # idempotent


@settings(max_examples=200, deadline=None)
@given(st.datetimes(min_value=dt.datetime(1901, 1, 1),
                    max_value=dt.datetime(2200, 1, 1)),
       st.datetimes(min_value=dt.datetime(1901, 1, 1),
                    max_value=dt.datetime(2200, 1, 1)))
def test_time_transforms_monotonic(x, y):
    """hour/day/month/year are monotonic non-decreasing and nested
    (coarser never orders differently than finer) — the property both
    pruning implementations rely on."""
    from philotes_spark.sources.transforms import (
        hour_value,
        month_value,
        year_value,
    )

    if x > y:
        x, y = y, x
    assert hour_value(x) <= hour_value(y)
    assert day_value(x) <= day_value(y)
    assert month_value(x) <= month_value(y)
    assert year_value(x) <= year_value(y)
    # nesting: equal days ⇒ equal months ⇒ equal years
    if day_value(x) == day_value(y):
        assert month_value(x) == month_value(y)
    if month_value(x) == month_value(y):
        assert year_value(x) == year_value(y)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=30), st.integers(min_value=1, max_value=10))
def test_string_truncate_prefix_property(s, w):
    from philotes_spark.sources.transforms import truncate_value

    t = truncate_value(s, w)
    assert s.startswith(t) and len(t) <= w
    # order-preserving on the string domain
    assert truncate_value(s + "x", w) >= t
