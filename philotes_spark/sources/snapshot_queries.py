"""Time-travel queries registered for the correctness gate (B5/B6).

The query materializes a two-version snapshot table from the events
fixture in a scratch directory, then reads VERSION AS OF 1 — so the
oracle is simply the deterministic subset that went into version 1.
This proves the whole commit → manifest → versioned-read path inside
the driver's hash-compare harness, not just in unit tests.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from philotes_spark.registry import query
from philotes_spark.sources.catalog import load_table
from philotes_spark.sources.snapshots import SnapshotTable


@query(
    "snapshot_version_as_of",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_id <= 500
    """,
)
def snapshot_version_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 VERSION AS OF: commit events≤500 as v1, the rest as v2, read v1.
    (With Iceberg/Delta on the classpath this maps 1:1 to the built-in
    `VERSION AS OF` — see sources/snapshots.py module docs.)"""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 500))
        tbl.commit(ev.filter(F.col("event_id") > 500))
        assert tbl.current_version() == 2
        return tbl.read(version=1).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_history",
    oracle="""
    SELECT 1 AS version, 'append' AS operation,
           CAST(COUNT(*) FILTER (WHERE event_id <= 500) AS BIGINT) AS added_rows
    FROM events
    UNION ALL
    SELECT 2, 'append',
           CAST(COUNT(*) FILTER (WHERE event_id > 500) AS BIGINT)
    FROM events
    """,
)
def snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 `t$snapshots` metadata table: version/operation/row counts."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 500))
        tbl.commit(ev.filter(F.col("event_id") > 500))
        return (
            tbl.snapshots()
            .select("version", "operation", "added_rows")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
