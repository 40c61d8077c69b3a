"""B1 DDL surface: SHOW CREATE TABLE generation + DESCRIBE identifier
validation (catalog browsing parity, sample-queries.sql:20-24).
"""

import pytest

from philotes_spark.sources.catalog import (
    describe_table,
    register_views,
    show_create_table,
)


def test_show_create_table_events(spark, sf_dir):
    ddl = show_create_table(spark, sf_dir, "events")
    assert ddl == (
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING) USING parquet"
    )


def test_show_create_table_embeddings_nested_type(spark, sf_dir):
    ddl = show_create_table(spark, sf_dir, "embeddings")
    assert "ARRAY<" in ddl and ddl.startswith("CREATE TABLE embeddings (")


def test_describe_table_rejects_injection(spark, sf_dir):
    register_views(spark, sf_dir)
    assert describe_table(spark, "events").count() > 0
    for bad in ("events; DROP TABLE x", "events--", "a b", ""):
        with pytest.raises(ValueError, match="invalid identifier"):
            describe_table(spark, bad)
