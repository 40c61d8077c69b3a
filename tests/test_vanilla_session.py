"""Regression for the round-1 blocker: ``load_table`` must work under ANY
SparkSession, not just the one built by ``philotes_spark.session`` (the
driver harness constructs its own vanilla session, which does not carry
``spark.sql.legacy.parquet.nanosAsLong`` — events.parquet is
TIMESTAMP(NANOS) at every scale factor).
"""

from pyspark.sql import functions as F

from philotes_spark.sources.catalog import load_table


def test_load_table_events_without_prebuilt_conf(spark, sf_dir):
    """Simulate the driver's vanilla session: force the conf to its vanilla
    default ("false" — unset would fall back to our builder-time "true") in
    an isolated session, then prove load_table re-establishes it at runtime."""
    fresh = spark.newSession()
    fresh.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = load_table(fresh, sf_dir, "events")
    assert df.count() > 0
    # ns → µs conversion must still kick in: ts arrives as a timestamp.
    assert dict(df.dtypes)["ts"].startswith("timestamp")


def test_events_ts_values_match_duckdb_truncation(spark, duck, sf_dir):
    """The ns→µs truncation must agree with DuckDB's read of the same file."""
    fresh = spark.newSession()
    fresh.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    got = (
        load_table(fresh, sf_dir, "events")
        .agg(F.max("ts").alias("mx"))
        .collect()[0]["mx"]
    )
    want = duck.sql("SELECT max(ts) FROM events").fetchone()[0]
    assert got == want
