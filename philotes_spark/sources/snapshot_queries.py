"""Time-travel queries registered for the correctness gate (B5/B6).

The query materializes a two-version snapshot table from the events
fixture in a scratch directory, then reads VERSION AS OF 1 — so the
oracle is simply the deterministic subset that went into version 1.
This proves the whole commit → manifest → versioned-read path inside
the driver's hash-compare harness, not just in unit tests.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from philotes_spark.registry import query
from philotes_spark.sources.catalog import load_table, show_create_table
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


@query(
    "snapshot_partitions",
    oracle="""
    SELECT DISTINCT 'event_type=' || event_type AS partition,
           1 AS file_count
    FROM events
    """,
)
def snapshot_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 `t$partitions` metadata table (sample-queries.sql:55-61): commit
    events hive-partitioned by event_type, surface partition values + file
    counts from the manifest. coalesce(1) pins one file per partition so
    the count is deterministic under any session parallelism."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.coalesce(1), partition_by=["event_type"])
        return (
            tbl.partitions()
            .select("partition", F.col("file_count").cast("int").alias("file_count"))
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_merge_upsert",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, value FROM events WHERE event_id <= 500
    ),
    changes AS (
        SELECT event_id, user_id, ROUND(value * 2, 2) AS value
        FROM events WHERE event_id <= 500 AND event_id % 7 = 0
    )
    SELECT b.event_id, b.user_id, b.value FROM base b
    WHERE b.event_id % 7 <> 0
    UNION ALL
    SELECT event_id, user_id, value FROM changes
    """,
)
def snapshot_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17-extension MERGE (copy-on-write upsert, sources/snapshots.py
    merge): commit events≤500, merge a change set doubling every 7th
    event's value, read the merged snapshot — the materialized CDC-apply
    the reference serves only as a latest-state query
    (sample-queries.sql:94-102). File pruning via footer stats is
    covered in tests/test_snapshot_merge.py; here the whole
    commit → merge → versioned-read path runs under the hash compare."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    base = ev.filter(F.col("event_id") <= 500)
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(base, stats_cols=["event_id"])
        changes = base.filter(F.col("event_id") % 7 == 0).withColumn(
            "value", F.round(F.col("value") * 2, 2)
        )
        tbl.merge(changes, key_cols=["event_id"])
        return tbl.read().localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_incremental_read",
    oracle="""
    SELECT event_id, user_id, value,
           CASE WHEN event_id <= 800 THEN 2 ELSE 3 END AS commit_version
    FROM events WHERE event_id > 500
    """,
)
def snapshot_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan (Iceberg IncrementalAppendScan twin): commit
    the events fixture as three appends, then read everything added after
    v1 — exactly the v2+v3 rows, each tagged with its committing version.
    The scan is a manifest file-list diff, so its cost is proportional to
    the new bytes only, independent of table size — the tailing-consumer
    pattern for the reference's append-only CDC tables
    (docs/query/sample-queries.sql:64-70 polls by `_cdc_timestamp`; the
    commit log cannot miss late arrivals)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 500))
        tbl.commit(ev.filter((F.col("event_id") > 500) & (F.col("event_id") <= 800)))
        tbl.commit(ev.filter(F.col("event_id") > 800))
        return tbl.read_incremental(from_version=1).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_changelog_diff",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, value FROM events WHERE event_id <= 500
    )
    SELECT event_id, user_id, value, 'insert' AS change_type
    FROM events WHERE event_id BETWEEN 501 AND 510
    UNION ALL
    SELECT event_id, user_id, ROUND(value * 2 + 1, 2), 'update'
    FROM base WHERE event_id % 7 = 0 AND event_id % 13 <> 0
    UNION ALL
    SELECT event_id, user_id, value, 'delete'
    FROM base WHERE event_id % 13 = 0
    """,
)
def snapshot_changelog_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog across a replace commit (read_changes, the Iceberg
    create_changelog_view twin): commit events<=500, merge a change set
    carrying inserts (501-510), updates (value*2+1 on multiples of 7)
    and deletes (multiples of 13), then diff v1 -> v2 into
    insert/update/delete rows. The keyed full-outer diff is the replace
    path; the append-only path (pure file-diff) is the same machinery
    as snapshot_incremental_read."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    base = ev.filter(F.col("event_id") <= 500)
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(base, stats_cols=["event_id"])
        inserts = ev.filter(F.col("event_id").between(501, 510)).withColumn(
            "_del", F.lit(False)
        )
        updates = (
            base.filter((F.col("event_id") % 7 == 0) & (F.col("event_id") % 13 != 0))
            .withColumn("value", F.round(F.col("value") * 2 + 1, 2))
            .withColumn("_del", F.lit(False))
        )
        deletes = base.filter(F.col("event_id") % 13 == 0).withColumn(
            "_del", F.lit(True)
        )
        tbl.merge(
            inserts.unionByName(updates).unionByName(deletes),
            key_cols=["event_id"],
            delete_col="_del",
        )
        return tbl.read_changes(1, 2, key_cols=["event_id"]).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "show_create_events",
    oracle="""
    SELECT 'events' AS table_name,
           'CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, '
           || 'user_id BIGINT, event_type STRING, value DOUBLE, '
           || 'props STRING) USING parquet' AS create_stmt
    """,
)
def show_create_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 `SHOW CREATE TABLE` (sample-queries.sql:24): the generated DDL for
    the events table, hash-pinned against the expected statement."""
    ddl = show_create_table(spark, sf_dir, "events")
    return spark.createDataFrame(
        [("events", ddl)], "table_name string, create_stmt string"
    )


@query(
    "show_tables",
    oracle="""
    SELECT UNNEST([
        'customer','documents','embeddings','events','lineitem',
        'nation','orders','part','region','supplier'
    ]) AS table_name
    """,
)
def show_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 `SHOW TABLES` (sample-queries.sql:20-22): the registered fixture
    catalog, served by spark.catalog after view registration."""
    from philotes_spark.sources.catalog import list_tables, register_views

    register_views(spark, sf_dir)
    names = list_tables(spark)
    return spark.createDataFrame([(n,) for n in names], "table_name string")


@query(
    "snapshot_clustered_prune",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE user_id >= (SELECT MAX(user_id)//4 FROM events)
      AND user_id <= (SELECT 3*MAX(user_id)//4 FROM events)
    """,
)
def snapshot_clustered_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustered-commit file skipping, value-verified (r06): commit the
    events fixture with sort_by=['user_id'] (range-partitioned + sorted
    write, footer min/max recorded per file), then answer a range
    predicate through read_where — which plans the scan over ONLY the
    files whose [min, max] overlaps the range — and assert the plan
    actually pruned before returning. The oracle is the plain filter
    over all rows, so the hash compare proves pruning loses nothing.
    The probed range is the middle half of the data's own user_id
    domain — [max//4, 3·max//4], the same integer arithmetic mirrored
    in the oracle's scalar subqueries — so the compare carries rows at
    EVERY fixture scale (r15: the old absolute 200..400 bounds sat
    entirely above sf≤0.01's user_id max and the pass was vacuous,
    VERDICT r14 what's-wrong #1) while the extreme-quartile files still
    prune. This is B19's file-level twin (partition pruning ≙
    day-partitions; this ≙ Iceberg data-skipping on sorted tables) and
    the dominant scan-cost lever at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    mx = ev.agg(F.max("user_id")).first()[0]
    lo, hi = mx // 4, 3 * mx // 4
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.repartition(8), sort_by=["user_id"])
        kept, total = tbl.pruned_file_count("user_id", lo=lo, hi=hi)
        assert kept < total, f"clustered scan must prune: kept {kept}/{total}"
        out = (
            tbl.read_where("user_id", lo=lo, hi=hi)
            .filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
            .select("event_id", "user_id", "value")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_sql_time_travel",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_v1,
           CAST(SUM(CASE WHEN event_id <= 250 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first_half
    FROM events WHERE event_id <= 500
    """,
)
def snapshot_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 as SQL *text* (sample-queries.sql:47-52): the statement
    `SELECT ... FROM t FOR VERSION AS OF 1` — string in, DataFrame out —
    through the time-travel rewriting front-end (sql_frontend.py), under
    the driver's hash compare. Proves the full statement surface, not
    just the programmatic read(version=)."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 500))
        tbl.commit(ev.filter(F.col("event_id") > 500))
        out = sql_stmt(
            spark,
            """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_v1,
                   CAST(SUM(CASE WHEN event_id <= 250 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_first_half
            FROM ev FOR VERSION AS OF 1
            """,
            {"ev": tbl},
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_mor_merge",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, value FROM events WHERE event_id <= 500
    )
    SELECT event_id, user_id, value FROM base
    WHERE event_id % 7 <> 0 AND event_id % 11 <> 0
    UNION ALL
    SELECT event_id, user_id, ROUND(value * 2, 2)
    FROM base WHERE event_id % 7 = 0 AND event_id % 11 <> 0
    """,
)
def snapshot_mor_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-READ (mode='mor', Iceberg v2 equality deletes): commit
    events<=500, MoR-merge updates (value*2 on multiples of 7) and
    deletes (multiples of 11) — base files untouched, asserted — then
    read through the delta-applying path under the hash compare. The
    CoW twin is snapshot_merge_upsert; together they pin both ends of
    the write-amplification dial."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    base = ev.filter(F.col("event_id") <= 500)
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(base)
        base_files = tbl._resolve()["files"]
        updates = (
            base.filter((F.col("event_id") % 7 == 0) & (F.col("event_id") % 11 != 0))
            .withColumn("value", F.round(F.col("value") * 2, 2))
            .withColumn("_del", F.lit(False))
        )
        deletes = base.filter(F.col("event_id") % 11 == 0).withColumn(
            "_del", F.lit(True)
        )
        tbl.merge(
            updates.unionByName(deletes),
            key_cols=["event_id"],
            delete_col="_del",
            mode="mor",
        )
        assert tbl._resolve()["files"] == base_files, "MoR must not rewrite base"
        return tbl.read().localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_rollback_read",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_id <= 300
    """,
)
def snapshot_rollback_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollback under the hash compare: commit events<=300,
    MoR-merge a bad change set (every 5th value zeroed), roll back to v1
    — the read must be byte-identical to the original, the bad version
    stays time-travelable, and no data file moved (sources/snapshots.py
    rollback; Iceberg's rollback_to_snapshot)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    base = ev.filter(F.col("event_id") <= 300)
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(base)
        bad = base.filter(F.col("event_id") % 5 == 0).select(
            "event_id", "user_id", F.lit(0.0).alias("value"),
            F.lit(False).alias("_del"),
        )
        tbl.merge(bad, key_cols=["event_id"], delete_col="_del", mode="mor")
        tbl.rollback(to_version=1)
        assert tbl.current_version() == 3
        return tbl.read().localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_wap_publish",
    oracle="""
    SELECT event_id, user_id, value FROM events WHERE event_id <= 400
    UNION ALL
    SELECT event_id, user_id, ROUND(value + 10, 2)
    FROM events WHERE event_id BETWEEN 401 AND 450
    """,
)
def snapshot_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish under the hash compare (branches +
    fast_forward, sources/snapshots.py): commit events<=400 to main,
    stage 401-450 (values +10) on an audit branch — asserting main does
    NOT move — audit the branch row count, then fast-forward main and
    read the published state. The branch chain stages into the shared
    data dir, so publish is metadata-only at any table size (Iceberg's
    WAP pattern)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 400))
        br = tbl.create_branch("audit")
        staged = ev.filter(F.col("event_id").between(401, 450)).withColumn(
            "value", F.round(F.col("value") + 10, 2)
        )
        br.commit(staged)
        assert tbl.current_version() == 1, "branch write must not move main"
        want = ev.filter(F.col("event_id") <= 450).count()
        assert br.read().count() == want, "audit failed"
        tbl.fast_forward("audit")
        return tbl.read().localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_zorder_prune",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE value >= 100 AND value <= 300
    """,
)
def snapshot_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering, value-verified (sources/snapshots.zorder_key):
    commit events z-ordered on (user_id, value), assert file skipping
    works on BOTH dimensions — a lexicographic sort only prunes its
    leading column — then answer a range predicate on the TRAILING
    dimension through the stats-pruned read. The oracle is the plain
    filter over all rows, so the hash compare proves multi-dimensional
    pruning loses nothing. Delta OPTIMIZE ZORDER / Iceberg z-order
    parity; at 100 TB this is what makes two-column dashboards scan a
    sliver of the table instead of all of it."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.repartition(8), zorder_by=["user_id", "value"])
        # assertion probes sized to the fixture's own distribution (the
        # query runs at several SFs): the bottom ~20% of either dim's
        # rank space must skip files under z-order
        u20, v20 = (
            ev.approxQuantile("user_id", [0.2], 0.001)[0],
            ev.approxQuantile("value", [0.2], 0.001)[0],
        )
        kept_u, total = tbl.pruned_file_count("user_id", lo=None, hi=u20)
        kept_v, _ = tbl.pruned_file_count("value", lo=None, hi=v20)
        assert kept_u < total and kept_v < total, (
            f"z-order must prune both dims: u {kept_u}/{total}, v {kept_v}/{total}"
        )
        out = (
            tbl.read_where("value", lo=100, hi=300)
            .filter((F.col("value") >= 100) & (F.col("value") <= 300))
            .select("event_id", "user_id", "value")
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_overwrite_partitions",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE event_id <= 500 AND event_type <> 'click'
    UNION ALL
    SELECT event_id, event_type, ROUND(value + 1000, 2) AS value
    FROM events WHERE event_id <= 500 AND event_type = 'click'
    """,
)
def snapshot_overwrite_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (sources/snapshots.py
    overwrite_partitions — Spark's partitionOverwriteMode=dynamic /
    Iceberg REPLACE PARTITIONS): commit events≤500 hive-partitioned by
    event_type, re-land ONLY the click partition with +1000 values, read
    the result — every other partition's files are untouched (the
    idempotent daily-backfill write; at 100 TB the cost is O(changed
    partitions), not a table rewrite). The keep/drop decision is
    metadata-only, parsed from manifest paths."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    base = ev.filter(F.col("event_id") <= 500)
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(base, partition_by=["event_type"])
        relanded = base.filter(F.col("event_type") == "click").withColumn(
            "value", F.round(F.col("value") + 1000, 2)
        )
        tbl.overwrite_partitions(relanded)
        return tbl.read().localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_refs",
    oracle="""
    SELECT 'audit' AS ref_name, 'tag' AS ref_type,
           1 AS version, CAST(NULL AS INT) AS forked_from
    UNION ALL
    SELECT 'dev', 'branch', 2, 1
    UNION ALL
    SELECT 'main', 'branch', 2, CAST(NULL AS INT)
    ORDER BY ref_name
    """,
)
def snapshot_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 `t$refs` metadata table (Iceberg's refs listing): build a
    table with two commits, an immutable tag at v1 and a branch forked
    at v1 carrying one extra commit, then list every addressable state —
    main's head, the tag, the branch head with its fork point. The
    listing is metadata-only at any table size (tag files + branch
    manifest chains); the oracle pins the deterministic contract."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 200))
        tbl.tag("audit", version=1)
        br = tbl.create_branch("dev", from_version=1)
        br.commit(ev.filter(F.col("event_id").between(201, 300)))
        tbl.commit(ev.filter(F.col("event_id").between(201, 400)))
        return tbl.refs().orderBy("ref_name").localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_delete_update",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN event_type = 'click' THEN value + 1000
                ELSE value END AS value
    FROM events
    WHERE event_id <= 500 AND event_type <> 'error'
    """,
)
def snapshot_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML on a snapshot table (sources/snapshots.py
    delete_where/update_where — the DELETE/UPDATE statements the
    reference's users run through Trino on Iceberg): commit events<=500,
    DELETE WHERE event_type='error', UPDATE clicks to value+1000, read
    the final state. Both operations compose onto the stats-pruned
    copy-on-write merge, so a selective DELETE rewrites only files whose
    key range intersects the doomed keys; time travel preserves every
    pre-DML state."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 500), stats_cols=["event_id"])
        tbl.delete_where("event_type = 'error'", key_cols=["event_id"])
        tbl.update_where(
            "event_type = 'click'", {"value": "value + 1000"},
            key_cols=["event_id"],
        )
        return tbl.read().localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_merge_clauses",
    oracle="""
    WITH b AS (SELECT event_id, event_type, value FROM events
               WHERE event_id <= 300),
         s AS (SELECT event_id, value FROM events
               WHERE event_id BETWEEN 200 AND 400)
    SELECT b.event_id, b.event_type,
           ROUND(b.value + s.value, 4) AS value
    FROM b JOIN s ON b.event_id = s.event_id
    WHERE NOT (s.value < 50)
    UNION ALL
    SELECT s.event_id, CAST(NULL AS VARCHAR) AS event_type,
           ROUND(s.value, 4) AS value
    FROM s WHERE s.event_id NOT IN (SELECT event_id FROM b)
    UNION ALL
    SELECT b.event_id, b.event_type, ROUND(b.value, 4) AS value
    FROM b
    WHERE b.event_id NOT IN (SELECT event_id FROM s)
      AND b.event_type <> 'error'
    """,
)
def snapshot_merge_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The general MERGE statement grammar (sql_frontend._parse_merge /
    _exec_merge; Trino-on-Iceberg MERGE shapes, ref
    `docs/query/sample-queries.sql`): conditional WHEN MATCHED DELETE,
    column-level UPDATE SET referencing both aliases, INSERT (cols)
    VALUES, and WHEN NOT MATCHED BY SOURCE DELETE — all compiled into
    ONE change-set fed to the snapshot engine's stats-pruned merge.
    Base = events ≤300; source = a USING subquery over events 200–400."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    from philotes_spark import sql_frontend

    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    src_view = "__philotes_dml_src_events"
    ev.filter(F.col("event_id").between(200, 400)).select(
        "event_id", "value"
    ).createOrReplaceTempView(src_view)
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(
            ev.filter(F.col("event_id") <= 300), stats_cols=["event_id"]
        )
        sql_frontend.sql(
            spark,
            f"""
            MERGE INTO ev AS t
            USING (SELECT event_id, value FROM {src_view}) AS s
            ON t.event_id = s.event_id
            WHEN MATCHED AND s.value < 50 THEN DELETE
            WHEN MATCHED THEN UPDATE SET value = t.value + s.value
            WHEN NOT MATCHED THEN
              INSERT (event_id, value) VALUES (s.event_id, s.value)
            WHEN NOT MATCHED BY SOURCE AND t.event_type = 'error' THEN DELETE
            """,
            snapshot_tables={"ev": tbl},
            dml_keys={"ev": ["event_id"]},
        ).collect()
        return (
            tbl.read()
            .select(
                "event_id",
                "event_type",
                F.round("value", 4).alias("value"),
            )
            .localCheckpoint()
        )
    finally:
        spark.catalog.dropTempView(src_view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_update_unfiltered",
    oracle="""
    SELECT event_id, event_type, ROUND(value * 2, 4) AS value
    FROM events WHERE event_id <= 400 AND event_type <> 'pageview'
    """,
)
def snapshot_update_unfiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE-less DML statement text (sql_frontend): ``UPDATE t SET …``
    rewrites every row, ``DELETE FROM t`` with a condition then trims —
    the two statement shapes Trino users hit first that the r6 grammar
    rejected. Both still commit as snapshot versions with time travel."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    from philotes_spark import sql_frontend

    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(
            ev.filter(F.col("event_id") <= 400), stats_cols=["event_id"]
        )
        sql_frontend.sql(
            spark,
            "UPDATE ev SET value = value * 2",
            snapshot_tables={"ev": tbl},
            dml_keys={"ev": ["event_id"]},
        ).collect()
        sql_frontend.sql(
            spark,
            "DELETE FROM ev WHERE event_type = 'pageview'",
            snapshot_tables={"ev": tbl},
            dml_keys={"ev": ["event_id"]},
        ).collect()
        return (
            tbl.read()
            .select(
                "event_id",
                "event_type",
                F.round("value", 4).alias("value"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_schema_history",
    oracle="""
    SELECT CAST(1 AS INTEGER) AS version,
           CAST(0 AS INTEGER) AS schema_version,
           CAST(3 AS INTEGER) AS n_columns,
           'event_id bigint, event_type string, value double' AS columns
    UNION ALL
    SELECT CAST(2 AS INTEGER), CAST(1 AS INTEGER), CAST(4 AS INTEGER),
           'event_id bigint, event_type string, value double, value2 double'
    UNION ALL
    SELECT CAST(3 AS INTEGER), CAST(1 AS INTEGER), CAST(4 AS INTEGER),
           'event_id bigint, event_type string, value double, value2 double'
    """,
)
def snapshot_schema_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`t$schema_history` metadata table (SnapshotTable.schema_history —
    the reference journals every schema evolution per table,
    `init-scripts/02-cdc-schema.sql:21-31`, `schema.go:147-174`): commit
    v1 with 3 columns, v2 appends rows carrying an ADDED column
    (additive evolution, A12), v3 appends at the evolved shape;
    schema_version bumps exactly once. The journal is constant by
    construction, so the oracle pins it literally."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 200))
        evolved = ev.filter(F.col("event_id").between(201, 300)).withColumn(
            "value2", F.col("value") * 2
        )
        tbl.commit(evolved)
        tbl.commit(
            ev.filter(F.col("event_id").between(301, 400)).withColumn(
                "value2", F.col("value") * 3
            )
        )
        return (
            tbl.schema_history()
            .select("version", "schema_version", "n_columns", "columns")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_positional_delete",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 4) AS value
    FROM events
    WHERE event_id <= 400
      AND NOT (event_type = 'error' OR value < 10)
    """,
)
def snapshot_positional_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-v2 positional delete (SnapshotTable.delete_where_positional
    — the keyless delete-file kind, ref `internal/iceberg/types.go`
    delete-file content): doomed rows land as (file_path, row_index)
    addresses from Spark's `_metadata` scan columns, O(deleted) write,
    zero base files rewritten; the read anti-joins the tiny address
    file. Stacked twice to exercise delta ordering."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 400))
        tbl.delete_where_positional("event_type = 'error'")
        tbl.delete_where_positional("value < 10")
        return (
            tbl.read()
            .select(
                "event_id", "event_type", F.round("value", 4).alias("value")
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_meta_sql",
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
def snapshot_meta_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 metadata tables as STATEMENT TEXT (sample-queries.sql:55-61,
    Trino's `SELECT * FROM "t$snapshots"`): the same journal as
    snapshot_history but served through sql_frontend's $-table rewrite
    — proving the statement surface, not just the programmatic API."""
    from philotes_spark import sql_frontend

    ev = load_table(spark, sf_dir, "events").select("event_id")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 500))
        tbl.commit(ev.filter(F.col("event_id") > 500))
        return sql_frontend.sql(
            spark,
            'SELECT version, operation, added_rows FROM "ev$snapshots" '
            "ORDER BY version",
            snapshot_tables={"ev": tbl},
        ).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_alter_columns",
    oracle="""
    SELECT event_id,
           value AS amount,
           CASE WHEN event_id > 400 THEN 'late' END AS source
    FROM events WHERE event_id <= 600
    """,
)
def snapshot_alter_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD/RENAME/DROP COLUMN as statement text (r08,
    VERDICT r07 #3) mapped to commit-time evolution: metadata-only
    commits journal the ops (snapshots.alter_add_columns:schema_ops) and
    readers apply them over the footer schema — no file rewrite at any
    size. Sequence under test: ADD source → positional INSERT carrying it
    → RENAME value→amount → DROP user_id; the final read must equal the
    rewrite DuckDB's oracle computes (ref evolution:
    `internal/iceberg/schema/schema.go:147-174`)."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_alter_late_src"
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 400))
        tabs = {"t": tbl}
        sql_stmt(spark, "ALTER TABLE t ADD COLUMN source STRING", tabs)
        ev.filter(
            (F.col("event_id") > 400) & (F.col("event_id") <= 600)
        ).createOrReplaceTempView(view)
        sql_stmt(
            spark,
            "INSERT INTO t SELECT event_id, user_id, value, "
            f"'late' AS source FROM {view}",
            tabs,
        )
        sql_stmt(spark, "ALTER TABLE t RENAME COLUMN value TO amount", tabs)
        sql_stmt(spark, "ALTER TABLE t DROP COLUMN user_id", tabs)
        return (
            tbl.read().select("event_id", "amount", "source").localCheckpoint()
        )
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_insert_overwrite",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE event_id <= 500 AND event_type <> 'click'
    UNION ALL
    SELECT event_id, 'click' AS event_type, ROUND(value + 1000, 2) AS value
    FROM events WHERE event_id <= 500 AND event_type = 'click'
    """,
)
def snapshot_insert_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`INSERT OVERWRITE t PARTITION (event_type='click') SELECT ...` as
    statement text (r08, VERDICT r07 #5) — maps to the engine's dynamic
    partition overwrite: the static partition literal rides on every
    written row, so exactly the click partition re-lands (+1000 values)
    and every other partition's files are untouched. Statement-text twin
    of snapshot_overwrite_partitions."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    base = ev.filter(F.col("event_id") <= 500)
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_iow_src"
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(base, partition_by=["event_type"])
        base.createOrReplaceTempView(view)
        sql_stmt(
            spark,
            "INSERT OVERWRITE t PARTITION (event_type = 'click') "
            "SELECT event_id, ROUND(value + 1000, 2) AS value "
            f"FROM {view} WHERE event_type = 'click'",
            {"t": tbl},
        )
        return tbl.read().localCheckpoint()
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_ctas",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events WHERE event_id <= 800
    GROUP BY event_type
    """,
)
def snapshot_ctas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`CREATE TABLE AS SELECT` + `CREATE OR REPLACE TABLE AS` as
    statement text (r08 — the last programmatic-only DDL from VERDICT
    r07 missing #4): a CTAS materializes a new snapshot table under the
    caller's table_root and registers it for follow-up statements; the
    OR REPLACE rewrite is a versioned overwrite, so the first CTAS
    result stays time-travelable underneath."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_ctas_src"
    try:
        ev.createOrReplaceTempView(view)
        tabs: dict = {}
        sql_stmt(
            spark,
            f"CREATE TABLE ev_agg AS SELECT * FROM {view} WHERE event_id <= 400",
            snapshot_tables=tabs,
            table_root=scratch,
        )
        sql_stmt(  # OR REPLACE: a versioned overwrite of the same table
            spark,
            "CREATE OR REPLACE TABLE ev_agg AS "
            f"SELECT * FROM {view} WHERE event_id <= 800",
            snapshot_tables=tabs,
            table_root=scratch,
        )
        assert tabs["ev_agg"].current_version() == 2
        return (
            tabs["ev_agg"]
            .read()
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .localCheckpoint()
        )
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_wap_statements",
    oracle="""
    SELECT event_id, value FROM events WHERE event_id <= 300
    UNION ALL
    SELECT event_id, ROUND(value * 2, 2) AS value
    FROM events WHERE event_id > 300 AND event_id <= 400
    """,
)
def snapshot_wap_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish through STATEMENTS only (r08): ALTER TABLE
    CREATE BRANCH → INSERT INTO t.branch_wip (branch-targeted DML) →
    audit count on the branch head → CALL fast_forward — main then
    serves base + staged rows. Statement twin of the programmatic
    snapshot_wap_publish."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_wap_stage_src"
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 300))
        tabs = {"w": tbl}
        sql_stmt(spark, "ALTER TABLE w CREATE BRANCH wip", tabs)
        ev.filter(
            (F.col("event_id") > 300) & (F.col("event_id") <= 400)
        ).withColumn("value", F.round(F.col("value") * 2, 2)).createOrReplaceTempView(view)
        sql_stmt(
            spark,
            f"INSERT INTO w.branch_wip SELECT event_id, value FROM {view}",
            tabs,
        )
        # audit on the branch head, main untouched until the publish
        staged = sql_stmt(
            spark, "SELECT COUNT(*) AS n FROM w.branch_wip", tabs
        ).collect()[0].n
        assert staged > tbl.read().count()
        sql_stmt(spark, "CALL fast_forward('w', 'wip')", tabs)
        return tbl.read().localCheckpoint()
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_widen_column",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(value * 100) AS BIGINT) AS cents,
           ROUND(CAST(CAST(value AS REAL) AS DOUBLE), 4) AS vf
    FROM events WHERE event_id <= 500
    UNION ALL
    SELECT event_id,
           CAST(FLOOR(value * 100) + 5000000000 AS BIGINT) AS cents,
           ROUND(CAST(CAST(value AS REAL) AS DOUBLE), 4) AS vf
    FROM events WHERE event_id > 500 AND event_id <= 600
    """,
)
def snapshot_widen_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ALTER TABLE t ALTER COLUMN c [SET DATA] TYPE <wider>` as
    statement text (r09, VERDICT r08 #6): int→bigint and float→double
    land as metadata-only journal ops (snapshots.alter_widen_column) —
    readers cast pre-ALTER files up, post-ALTER inserts carry values
    only the widened type holds (cents + 5e9 > int32), and the read
    unions the mixed physical widths per staged root with zero rewrite
    at any table size. Narrowing refuses. Iceberg table-spec "Schema
    Evolution" type promotion; beyond the reference's additive-only
    evolution (`internal/iceberg/schema/schema.go:147-174`)."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value") * 100).cast("int").alias("cents"),
        F.col("value").cast("float").alias("vf"),
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_widen_late_src"
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 500))
        tabs = {"t": tbl}
        sql_stmt(spark, "ALTER TABLE t ALTER COLUMN cents TYPE BIGINT", tabs)
        ev.filter(
            (F.col("event_id") > 500) & (F.col("event_id") <= 600)
        ).select(
            "event_id",
            (F.col("cents").cast("bigint") + 5000000000).alias("cents"),
            "vf",
        ).createOrReplaceTempView(view)
        sql_stmt(
            spark,
            f"INSERT INTO t SELECT event_id, cents, vf FROM {view}",
            tabs,
        )
        # Trino spelling for the float half
        sql_stmt(spark, "ALTER TABLE t ALTER COLUMN vf SET DATA TYPE DOUBLE", tabs)
        got = tbl.read()
        assert dict(got.dtypes) == {
            "event_id": "bigint", "cents": "bigint", "vf": "double"
        }
        return got.select(
            "event_id", "cents", F.round("vf", 4).alias("vf")
        ).localCheckpoint()
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_name_mapping_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS reading
    FROM events
    """,
)
def snapshot_name_mapping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 evolution-publish read path under the driver's
    hash-compare gate: rename + drop land as metadata-only journal ops,
    the Avro manifest chain is written for the current version, and the
    table is reconstructed EXTERNALLY — ``read_table_via_manifests``
    with the ``schema.name-mapping.default`` built from the journal
    (Iceberg "Column Projection") — so pre-rename files resolve their
    old physical column name to the current field, the dropped column's
    remnant never surfaces, and a post-rename file carrying the new
    name unions in. Zero rewrite at any table size (ref interop promise
    `internal/iceberg/catalog/rest.go:320-344`)."""
    from philotes_spark.sources.catalog_rest import (
        name_mapping_from_ops,
        schema_to_rest,
    )
    from philotes_spark.sources.iceberg_manifest import (
        read_table_via_manifests,
        write_manifests_for_version,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.col("event_type").alias("junk")
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 600))
        tbl.alter_rename_column("value", "reading")
        tbl.alter_drop_column("junk")
        # a post-evolution file physically carrying the NEW name
        tbl.commit(
            ev.filter(F.col("event_id") > 600).select(
                "event_id", "user_id", F.col("value").alias("reading")
            )
        )
        m = tbl._resolve()
        rest = schema_to_rest(tbl.read().schema)
        ml = write_manifests_for_version(tbl, m["version"], rest_schema=rest)
        external = read_table_via_manifests(
            spark,
            ml,
            rest,
            name_mapping=name_mapping_from_ops(rest, m.get("schema_ops", [])),
        )
        return external.select(
            "event_id", "user_id", F.round("reading", 4).alias("reading")
        ).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_rewrite_late_appends",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE (event_id <= 600 AND event_id % 10 <> 3)
       OR (event_id > 600 AND event_id <= 700)
    """,
)
def snapshot_rewrite_late_appends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r10 MoR late-append lifecycle under the driver gate: an
    equality-delete delta lands (merge-on-read, O(changes)), a later
    append re-introduces some of the deleted keys PLUS fresh rows — the
    pending delta suppresses the resurrected copies (appends cannot
    undo deletes) — and ``rewrite_late_appends()`` rewrites ONLY the
    late files with the pending deletes applied, leaving the original
    base files by reference and the delta pending. The read is
    row-identical before and after the rewrite; the oracle is the
    equivalent plain filter."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 600))
        doomed = (
            tbl.read()
            .filter("event_id % 10 = 3")
            .withColumn("_del", F.lit(True))
        )
        tbl.merge(doomed, key_cols=["event_id"], delete_col="_del", mode="mor")
        # late append: fresh rows AND resurrected copies of deleted keys
        tbl.commit(
            ev.filter(
                ((F.col("event_id") > 600) & (F.col("event_id") <= 700))
                | ((F.col("event_id") <= 600) & (F.col("event_id") % 10 == 3))
            )
        )
        before = tbl.read().count()
        v = tbl.rewrite_late_appends()
        assert v is not None
        m = tbl._resolve()
        assert m.get("deltas"), "delta must remain pending"
        got = tbl.read()
        assert got.count() == before  # the rewrite preserved every row
        return got.select(
            "event_id", "user_id", F.round("value", 4).alias("value")
        ).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_delete_manifests_read",
    oracle="""
    SELECT event_id, user_id,
           ROUND(CASE WHEN event_id <= 600 AND event_id % 10 = 5
                           AND event_id % 7 <> 0
                      THEN value + 1000 ELSE value END, 4) AS value
    FROM events
    WHERE event_id <= 700
      AND NOT (event_id <= 600 AND event_id % 7 = 0)
      AND NOT (event_id <= 600 AND event_id % 10 = 3)
    """,
)
def snapshot_delete_manifests_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v2 DELETE-MANIFEST external read under the driver's
    hash-compare gate (r11 — previously pytest-only): a positional
    delta (content=1: (file_path, pos) addresses), then an equality
    delta (content=2 with ``equality_ids``) carrying BOTH deletes and
    upserts, then a fresh append — and the table is reconstructed
    EXTERNALLY from the published Avro manifest chain alone
    (``read_table_via_manifests``), applying the spec's sequence rules:
    the pos delete covers files at sequence ≤ its own, the equality
    delete only STRICTLY older files (its own upserts and the later
    append are exempt — the append uses disjoint keys so the engine's
    pending-delta read agrees). No compaction ever runs: MoR versions
    are externally readable as-is, O(changes) write cost at any table
    size (ref `internal/iceberg/catalog/rest.go:320-344`)."""
    from philotes_spark.sources.catalog_rest import schema_to_rest
    from philotes_spark.sources.iceberg_manifest import (
        read_table_via_manifests,
        write_manifests_for_version,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 600))
        tbl.delete_where_positional("event_id % 7 = 0")
        live = tbl.read()  # post-pos-delete state feeds the change set
        changes = (
            live.filter("event_id % 10 = 3")
            .withColumn("_del", F.lit(True))
            .unionByName(
                live.filter("event_id % 10 = 5")
                .withColumn("value", F.col("value") + 1000)
                .withColumn("_del", F.lit(False))
            )
        )
        tbl.merge(changes, key_cols=["event_id"], delete_col="_del", mode="mor")
        tbl.commit(
            ev.filter((F.col("event_id") > 600) & (F.col("event_id") <= 700))
        )
        m = tbl._resolve()
        assert m.get("deltas"), "both deltas must still be pending"
        rest = schema_to_rest(tbl.read().schema)
        ml = write_manifests_for_version(tbl, m["version"], rest_schema=rest)
        external = read_table_via_manifests(spark, ml, rest)
        return external.select(
            "event_id", "user_id", F.round("value", 4).alias("value")
        ).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_evolution_mor_read",
    oracle="""
    SELECT event_id, user_id,
           ROUND(CASE WHEN event_id <= 600 AND event_id % 10 = 5
                      THEN value + 1000 ELSE value END, 4) AS reading
    FROM events
    WHERE event_id <= 700
      AND NOT (event_id <= 600 AND event_id % 10 = 3)
    """,
)
def snapshot_evolution_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution INTERLEAVED with merge-on-read, read externally
    (r11 — the fuzz family-11 interaction as a hash-compared query):
    rename + drop land as journal ops, an equality delta (deletes AND
    upserts, its ``equality_ids`` keyed on the aligned field ids) lands
    ON TOP of the live journal, a later append carries the evolved
    physical names — and the table reconstructs from the Avro manifest
    chain + ``schema.name-mapping.default`` alone: pre-rename files
    resolve their old physical column through the mapping, the dropped
    remnant never surfaces, the delta's upserts survive their own
    delete keys (strictly-older sequence scoping), and the fresh append
    is exempt. Zero rewrite, no compaction, at any table size."""
    from philotes_spark.sources.catalog_rest import (
        name_mapping_from_ops,
        schema_to_rest,
    )
    from philotes_spark.sources.iceberg_manifest import (
        read_table_via_manifests,
        write_manifests_for_version,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.col("event_type").alias("junk")
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 600))
        tbl.alter_rename_column("value", "reading")
        tbl.alter_drop_column("junk")
        live = tbl.read()  # evolved view feeds the change set
        changes = (
            live.filter("event_id % 10 = 3")
            .withColumn("_del", F.lit(True))
            .unionByName(
                live.filter("event_id % 10 = 5")
                .withColumn("reading", F.col("reading") + 1000)
                .withColumn("_del", F.lit(False))
            )
        )
        tbl.merge(changes, key_cols=["event_id"], delete_col="_del", mode="mor")
        # post-evolution append physically carrying the NEW name
        tbl.commit(
            ev.filter((F.col("event_id") > 600) & (F.col("event_id") <= 700))
            .select("event_id", "user_id", F.col("value").alias("reading"))
        )
        m = tbl._resolve()
        assert m.get("deltas") and m.get("schema_ops")
        rest = schema_to_rest(tbl.read().schema)
        ml = write_manifests_for_version(tbl, m["version"], rest_schema=rest)
        external = read_table_via_manifests(
            spark,
            ml,
            rest,
            name_mapping=name_mapping_from_ops(rest, m.get("schema_ops", [])),
        )
        return external.select(
            "event_id", "user_id", F.round("reading", 4).alias("reading")
        ).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_expired_chain_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE (event_id <= 500 AND event_id % 5 <> 0)
       OR (event_id > 500 AND event_id <= 600)
    """,
)
def snapshot_expired_chain_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot expiry under the oracle gate (r12): retention really
    deletes the overwritten version's exclusive data files, the expired
    version refuses time travel, and the SURVIVING chain still
    publishes and reads back externally — ``file_provenance`` walks the
    history to the expiry boundary and attributes conservatively
    instead of failing (the family-11 IndexError fixed this round).
    This is the query-surface half of the statement-surface lifecycle
    the fuzz family 12 drives with a catalog attached (A7's two halves,
    ref `internal/iceberg/catalog/rest.go:186-217`)."""
    from philotes_spark.sources.catalog_rest import schema_to_rest
    from philotes_spark.sources.iceberg_manifest import (
        read_table_via_manifests,
        write_manifests_for_version,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 500))
        # the "cleaned" overwrite makes v1's files exclusive to v1
        tbl.commit(
            ev.filter(
                (F.col("event_id") <= 500) & (F.col("event_id") % 5 != 0)
            ),
            operation="overwrite",
        )
        tbl.commit(
            ev.filter((F.col("event_id") > 500) & (F.col("event_id") <= 600))
        )
        doomed = tbl.expiring_versions(keep_last=2)
        assert doomed == [1], doomed  # the dry run names exactly v1
        deleted = tbl.expire_snapshots(keep_last=2)
        assert deleted > 0, "v1's exclusive files must actually be deleted"
        try:
            tbl.read(version=1)
            raise AssertionError("expired version must refuse time travel")
        except ValueError:
            pass
        m = tbl._resolve()
        rest = schema_to_rest(tbl.read().schema)
        ml = write_manifests_for_version(tbl, m["version"], rest_schema=rest)
        external = read_table_via_manifests(spark, ml, rest)
        return external.select(
            "event_id", "user_id", F.round("value", 4).alias("value")
        ).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_partition_evolution_read",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 4) AS value
    FROM events WHERE event_id <= 900
    """,
)
def snapshot_partition_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution under the oracle gate (r12): the layout
    changes TWICE as metadata-only commits (``ALTER TABLE ... ADD/DROP
    PARTITION FIELD`` → ``SnapshotTable.evolve_partition_spec``) with an
    append under every spec, so the final file list spans three specs —
    unpartitioned, [event_type], unpartitioned again — and the read
    unions per staged root, surfacing ``event_type`` from DATA in
    spec-0/2 roots and from the hive PATH in spec-1 roots. The oracle is
    layout-independent by construction: the same rows from the source
    table. No file is rewritten at any point (Iceberg's spec-evolution
    contract; ref ``TableMetadata.PartitionSpecs[]/DefaultSpecID``,
    `internal/iceberg/types.go:136-140`)."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round("value", 4).alias("value")
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_spec_evo_src"
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 300))
        tabs = {"t": tbl}
        sql_stmt(spark, "ALTER TABLE t ADD PARTITION FIELD event_type", tabs)
        ev.filter(
            (F.col("event_id") > 300) & (F.col("event_id") <= 600)
        ).createOrReplaceTempView(view)
        sql_stmt(
            spark,
            f"INSERT INTO t SELECT event_id, event_type, value FROM {view}",
            tabs,
        )
        sql_stmt(spark, "ALTER TABLE t DROP PARTITION FIELD event_type", tabs)
        ev.filter(
            (F.col("event_id") > 600) & (F.col("event_id") <= 900)
        ).createOrReplaceTempView(view)
        sql_stmt(
            spark,
            f"INSERT INTO t SELECT event_id, event_type, value FROM {view}",
            tabs,
        )
        # three live specs, none rewritten — pin it in the query itself
        specs = {r.spec_id for r in tbl.partition_specs().collect()
                 if r.live_file_count > 0}
        assert len(specs) >= 2, specs
        return tbl.read().select(
            "event_id", "event_type", "value"
        ).localCheckpoint()
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_partition_transforms_read",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 4) AS value
    FROM events
    WHERE event_id <= 900
      AND ts >= (SELECT ts FROM events WHERE event_id = 450)
    """,
)
def snapshot_partition_transforms_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Non-identity partition transforms under the oracle gate (r13,
    VERDICT r12 #2): the table starts unpartitioned, evolves to
    ``days(ts)`` and then to ``bucket(8, event_id)`` through the ALTER
    statement surface — the reference's own default layout is the day
    transform (`internal/iceberg/schema/schema.go:104-135`) — with an
    append under every spec, all metadata-only. The read is a
    ``read_where`` time filter at the SLICE MIDPOINT — the cutoff is the
    fixture's own ts at event_id 450 (event_id is unique and ts-monotone
    in these fixtures; the oracle mirrors it as a scalar subquery), so
    the compare carries ~450 rows at EVERY fixture scale (r15: the old
    absolute 2024-01-20 cutoff sat past the slice's whole time range at
    sf ≥ 0.01 and the pass was vacuous, VERDICT r14 what's-wrong #1).
    Pruning stays load-bearing at every SF via BOTH levers: pre-cutoff
    ``days(ts)`` partitions drop at manifest level where the slice spans
    days, and the unpartitioned root (event_id ≤ 300, entirely before
    the cutoff) drops via its ts footer stats — the in-query assert pins
    scanned < total; over-pruning would change the rows and fail the
    hash compare. The oracle is layout-independent by construction: the
    same filter over the source table."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", F.round("value", 4).alias("value")
    )
    cutoff = ev.filter(F.col("event_id") == 450).first()["ts"]
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_transform_src"
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 300), stats_cols=["ts"])
        tabs = {"t": tbl}
        sql_stmt(spark, "ALTER TABLE t ADD PARTITION FIELD days(ts)", tabs)
        ev.filter(
            (F.col("event_id") > 300) & (F.col("event_id") <= 600)
        ).createOrReplaceTempView(view)
        sql_stmt(
            spark,
            f"INSERT INTO t SELECT event_id, event_type, ts, value FROM {view}",
            tabs,
        )
        sql_stmt(
            spark,
            "ALTER TABLE t REPLACE PARTITION FIELD days(ts) "
            "WITH bucket(8, event_id)",
            tabs,
        )
        ev.filter(
            (F.col("event_id") > 600) & (F.col("event_id") <= 900)
        ).createOrReplaceTempView(view)
        sql_stmt(
            spark,
            f"INSERT INTO t SELECT event_id, event_type, ts, value FROM {view}",
            tabs,
        )
        scanned, total = tbl.pruned_file_count("ts", lo=cutoff)
        assert scanned < total, (scanned, total)  # day partitions pruned
        return (
            tbl.read_where("ts", lo=cutoff)
            .select("event_id", "event_type", "value")
            .localCheckpoint()
        )
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_write_order_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE user_id >= (SELECT MAX(user_id)//4 FROM events)
      AND user_id <= (SELECT 3*MAX(user_id)//4 FROM events)
    """,
)
def snapshot_write_order_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-order evolution under the oracle gate (r13): the table
    starts UNCLUSTERED, evolves its write order through the statement
    surface (``ALTER TABLE t WRITE ORDERED BY user_id`` — metadata-only,
    Iceberg's SetDefaultSortOrder; no file touched), appends the second
    half (which inherits the order and range-clusters), then reclusters
    HISTORY with ``CALL rewrite_data_files(strategy => 'sort')`` —
    Iceberg's sort-strategy rewrite. The read is a ``read_where`` range
    predicate over the MIDDLE HALF of the data's own user_id domain —
    [max//4, 3·max//4], mirrored in the oracle's scalar subqueries — so
    the compare carries ~half the rows at EVERY fixture scale (r15: the
    old absolute 250..450 bounds sat entirely above sf ≤ 0.01's user_id
    max, so this flagship graduated on an empty-set hash match; VERDICT
    r14 what's-wrong #1). After the rewrite EVERY file carries a narrow
    user_id range, so the in-query assert pins that the extreme-quartile
    files pruned (over-pruning would change the rows and fail the hash
    compare). The oracle is the plain filter over all rows — layout
    independence end-to-end. At 100 TB this is the lifecycle that keeps
    file-skipping alive on a table that started life unclustered:
    declare the order (metadata), new writes cluster immediately,
    recluster old data once."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round("value", 4).alias("value")
    )
    mx = ev.agg(F.max("user_id")).first()[0]
    lo, hi = mx // 4, 3 * mx // 4
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_write_order_src"
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(
            ev.filter(F.col("event_id") % 2 == 0).repartition(4)
        )  # unclustered half
        tabs = {"t": tbl}
        sql_stmt(spark, "ALTER TABLE t WRITE ORDERED BY user_id", tabs)
        ev.filter(F.col("event_id") % 2 == 1).createOrReplaceTempView(view)
        sql_stmt(
            spark,
            f"INSERT INTO t SELECT event_id, user_id, value FROM {view}",
            tabs,
        )
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort')",
            tabs,
        )
        kept, total = tbl.pruned_file_count("user_id", lo=lo, hi=hi)
        assert kept < total, (kept, total)  # reclustered history prunes
        return (
            tbl.read_where("user_id", lo=lo, hi=hi)
            .filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
            .select("event_id", "user_id", "value")
            .localCheckpoint()
        )
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_partial_rewrite_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE user_id >= (SELECT MAX(user_id)//3 FROM events)
      AND user_id <= (SELECT 2*MAX(user_id)//3 FROM events)
    """,
)
def snapshot_partial_rewrite_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-progress clustered rewrite under the oracle gate (r14,
    VERDICT r13 #2): three unclustered appends, ``WRITE ORDERED BY
    user_id`` (metadata-only), then ONE paced step of ``CALL
    rewrite_data_files(strategy => 'sort', partial_progress => true,
    max_groups => 1)`` — Iceberg's partial-progress.enabled mode, each
    file group its own ``rewrite-group`` commit (the reference's catalog
    surface is append-per-batch for the same reason,
    internal/iceberg/catalog/rest.go:186-217). The in-query asserts pin
    that the table really IS mid-rewrite — the manifest's
    ``clustered_roots`` resume marker is non-empty AND unclustered files
    remain — and the read is a ``read_where`` range over exactly that
    mixed state: level-1 group pruning on the reclustered root, per-file
    checks on the rest, MoR-free. The oracle is the plain filter over
    all rows, so the hash compare proves a half-reclustered 100 TB table
    answers identically to the original at every intermediate version —
    the property that makes multi-commit reclustering safe to pace. The
    probed range is the middle third of the data's own user_id domain —
    [max//3, 2·max//3], mirrored in the oracle's scalar subqueries — so
    the compare carries rows at EVERY fixture scale (r15: the old
    absolute 300..500 bounds were vacuous at sf ≤ 0.01; VERDICT r14
    what's-wrong #1)."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round("value", 4).alias("value")
    )
    mx = ev.agg(F.max("user_id")).first()[0]
    lo, hi = mx // 3, 2 * mx // 3
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        for third in range(3):
            tbl.commit(
                ev.filter(F.col("event_id") % 3 == third).repartition(3)
            )
        tabs = {"t": tbl}
        sql_stmt(spark, "ALTER TABLE t WRITE ORDERED BY user_id", tabs)
        # one-file groups make the mid-rewrite state SF-independent:
        # 9 files → 9 groups at every fixture scale, so max_groups => 1
        # always leaves 8 files pending (a byte threshold would let a
        # small fixture fit one group and finish the whole table)
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort', "
            "partial_progress => true, "
            "max_file_group_size_bytes => 1, max_groups => 1)",
            tabs,
        )
        m = tbl._load(f"v{tbl.current_version():08d}.json")
        assert m["operation"] == "rewrite-group", m["operation"]
        done = set(m["clustered_roots"])
        assert done, "the paced step must have committed one group"
        pending = [
            f
            for f in m["files"]
            if os.path.relpath(f, tbl.data_dir).split(os.sep)[0] not in done
        ]
        assert pending, "table must still be PARTIALLY reclustered"
        return (
            tbl.read_where("user_id", lo=lo, hi=hi)
            .filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
            .select("event_id", "user_id", "value")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_manifests_meta",
    oracle="""
    WITH slices AS (
        SELECT 0 AS sl UNION ALL SELECT 1 UNION ALL SELECT 2
    ),
    hulls AS (
        SELECT s.sl, CAST(1 AS INT) AS n_files, s.sl = 2 AS clustered,
               'event_id' AS field,
               CAST(MIN(e.event_id) AS VARCHAR) AS lo,
               CAST(MAX(e.event_id) AS VARCHAR) AS hi
        FROM events e JOIN slices s ON e.event_id % 3 = s.sl
        GROUP BY s.sl
    )
    SELECT n_files, clustered, field, lo, hi FROM hulls ORDER BY lo, hi
    """,
)
def snapshot_manifests_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``$manifests`` metadata table under the oracle gate (r14):
    three one-file commits of known event slices (the third clustered,
    so the ``clustered_roots`` resume marker surfaces), then the
    manifest-level view read through the SQL surface — per-root file
    counts and the event_id field-summary hulls that two-level scan
    planning prunes with. The oracle recomputes each slice's hull
    straight from the source table, so the hash compare proves the
    commit-time group summaries describe the data files truthfully —
    the exact invariant level-1 pruning's correctness rests on (a hull
    narrower than the data would over-prune; wider never wrong)."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        for sl in range(3):
            tbl.commit(
                ev.filter(F.col("event_id") % 3 == sl).coalesce(1),
                stats_cols=["event_id"],
                sort_by=["event_id"] if sl == 2 else None,
            )
        out = sql_stmt(
            spark,
            'SELECT n_files, clustered, s.field AS field, '
            's.lower AS lo, s.upper AS hi '
            'FROM "t$manifests" LATERAL VIEW explode(summaries) exp AS s '
            "WHERE s.field = 'event_id' ORDER BY lo, hi",
            {"t": tbl},
        )
        rows = out.collect()
        assert len(rows) == 3 and all(r.n_files == 1 for r in rows), rows
        return spark.createDataFrame(
            rows, out.schema
        ).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_tighten_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE user_id >= (SELECT 2*MAX(user_id)//5 FROM events)
      AND user_id <= (SELECT 3*MAX(user_id)//5 FROM events)
    """,
)
def snapshot_tighten_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full partial-progress recluster LIFECYCLE under the oracle
    gate (r15, VERDICT r14 what's-missing #3): three interleaved
    appends, ``WRITE ORDERED BY user_id``, the complete group-wise
    ``CALL rewrite_data_files(partial_progress => true)``, then the
    final ``tighten => true`` pass that merges the cross-group
    overlapping runs — after which the live files' user_id hulls are
    value-DISJOINT (asserted in-query: the one-commit property reached
    through paced commits). The read is a mid-domain ``read_where``
    range with SF-relative bounds mirrored in the oracle's scalar
    subqueries, so the hash compare proves the tightened table answers
    identically to the raw fixture at every scale. At 100 TB this is
    the maintenance loop that keeps file-skipping at the global
    optimum without ever holding a table-sized transaction open."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round("value", 4).alias("value")
    )
    mx = ev.agg(F.max("user_id")).first()[0]
    lo, hi = 2 * mx // 5, 3 * mx // 5
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        for third in range(3):
            # every commit spans the whole user_id domain, so group
            # rewrites genuinely overlap cross-group before tighten
            tbl.commit(
                ev.filter(F.col("event_id") % 3 == third).repartition(3)
            )
        tabs = {"t": tbl}
        sql_stmt(spark, "ALTER TABLE t WRITE ORDERED BY user_id", tabs)
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort', "
            "partial_progress => true, max_file_group_size_bytes => 1)",
            tabs,
        )
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort', "
            "tighten => true)",
            tabs,
        )
        m = tbl._load(f"v{tbl.current_version():08d}.json")
        hulls = sorted(
            tuple(m["file_stats"][f]["user_id"]) for f in m["files"]
        )
        for (l1, h1), (l2, h2) in zip(hulls, hulls[1:]):
            assert h1 <= l2, hulls  # value-disjoint up to shared keys
        kept, total = tbl.pruned_file_count("user_id", lo=lo, hi=hi)
        assert kept < total, (kept, total)
        return (
            tbl.read_where("user_id", lo=lo, hi=hi)
            .filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
            .select("event_id", "user_id", "value")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_entries_meta",
    oracle="""
    SELECT * FROM (VALUES
      (0, 2, (SELECT COUNT(*) FROM events
              WHERE event_id > 400 AND event_id <= 800)),
      (1, 3, (SELECT COUNT(*) - 1 FROM events WHERE event_id <= 400)),
      (2, 3, (SELECT COUNT(*) FROM events WHERE event_id <= 400))
    ) AS t(status, snapshot_id, recs)
    ORDER BY status
    """,
)
def snapshot_entries_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``$entries`` metadata table under the oracle gate (r15 —
    Iceberg's ``t$entries``, the per-manifest-entry view engineers use
    to audit what each snapshot touched): two one-file commits of known
    event slices, then a CoW ``DELETE`` of ONE row from the first
    slice. The entries of the resulting snapshot must show exactly the
    lifecycle: the untouched second slice EXISTING (status 0) and still
    attributed to the snapshot that ADDED it (the spec's existing-entry
    provenance rule), the rewritten first slice ADDED (status 1) one
    row short, and its pre-delete file DELETED (status 2) with the full
    slice count — proving both the stats-pruned CoW (the second file
    carried by reference, never rewritten) and the provenance walk.
    The oracle recomputes each record count straight from the source
    slices. Metadata-only on the engine side: statuses from the
    manifest chain, counts from parquet footers."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(
            ev.filter(F.col("event_id") <= 400).coalesce(1),
            stats_cols=["event_id"],
        )
        tbl.commit(
            ev.filter(
                (F.col("event_id") > 400) & (F.col("event_id") <= 800)
            ).coalesce(1)
        )
        tbl.delete_where("event_id = 100", key_cols=["event_id"])
        out = sql_stmt(
            spark,
            'SELECT status, snapshot_id, SUM(record_count) AS recs '
            'FROM "t$entries" GROUP BY status, snapshot_id '
            "ORDER BY status",
            {"t": tbl},
        )
        rows = out.collect()
        # the stats-pruned CoW left slice 2 carried by reference —
        # EXISTING, attributed to its adding snapshot, never rewritten
        assert (rows[0].status, rows[0].snapshot_id) == (0, 2), rows
        return spark.createDataFrame(rows, out.schema).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_cherrypick_read",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE event_id <= 300
       OR (event_id > 300 AND event_id <= 600)
       OR (event_id > 600 AND event_id <= 900)
    """,
)
def snapshot_cherrypick_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DIVERGED-main write-audit-publish completion under the
    oracle gate (r15): main commits slice A, an audit branch forks and
    stages slice B, main meanwhile commits slice C — at which point
    ``CALL fast_forward`` REFUSES (adopting the branch head wholesale
    would drop C; asserted in-query), and ``CALL cherrypick_snapshot``
    re-applies the branch's pure append onto current main (Iceberg's
    cherrypick_snapshot). The read is the published main: A ∪ C ∪ B,
    hash-compared against the union of the three source slices — rows
    main committed during the audit survive the publish. Metadata-only
    publish: the staged files are referenced, never copied."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    view = "__philotes_cherry_src"
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.filter(F.col("event_id") <= 300))  # A
        wip = tbl.create_branch("wip")
        wip.commit(
            ev.filter(
                (F.col("event_id") > 300) & (F.col("event_id") <= 600)
            )
        )  # B staged on the branch
        ev.filter(
            (F.col("event_id") > 600) & (F.col("event_id") <= 900)
        ).createOrReplaceTempView(view)
        tabs = {"t": tbl}
        sql_stmt(
            spark,
            f"INSERT INTO t SELECT event_id, event_type, value FROM {view}",
            tabs,
        )  # C lands on main while the audit runs
        try:
            sql_stmt(spark, "CALL fast_forward('t', 'wip')", tabs)
            raise AssertionError("diverged fast_forward must refuse")
        except ValueError as e:
            assert "cherrypick" in str(e), e
        sql_stmt(spark, "CALL cherrypick_snapshot('t', 'wip')", tabs)
        m = tbl._load(f"v{tbl.current_version():08d}.json")
        assert m["operation"] == "cherry-pick", m["operation"]
        return (
            tbl.read()
            .select("event_id", "event_type", "value")
            .localCheckpoint()
        )
    finally:
        spark.catalog.dropTempView(view)
        shutil.rmtree(scratch, ignore_errors=True)


@query(
    "snapshot_ts_prune_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE ts >= (SELECT ts FROM events WHERE event_id = 250)
      AND ts <= (SELECT ts FROM events WHERE event_id = 750)
    """,
)
def snapshot_ts_prune_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP file-stat pruning under the oracle gate (r15): the
    events fixture commits ts-clustered (``sort_by=['ts']`` — range
    partition + in-file sort, footer min/max per file), then answers a
    ts-range ``read_where`` whose bounds are the fixture's own ts at
    two fixed event_ids (event_id is unique and ts-monotone at every
    SF; the oracle mirrors them as scalar subqueries). Before r15 this
    plan could not prune AT ALL: Spark wrote INT96 timestamps (no
    parquet statistics), and even with stats the probe hit the
    incomparable-⇒-keep fallback because manifests store timestamp
    stats as ISO text — TIMESTAMP_MICROS plus the stored-form probe
    (``_probe_safe``) make the in-query assert (kept < total) hold at
    every fixture scale. On a 100 TB time-series table this is the
    difference between scanning a day and scanning a year; the hash
    compare proves the pruned scan loses nothing."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("value")
    )
    lo = ev.filter(F.col("event_id") == 250).first()["ts"]
    hi = ev.filter(F.col("event_id") == 750).first()["ts"]
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.repartition(8), sort_by=["ts"])
        kept, total = tbl.pruned_file_count("ts", lo=lo, hi=hi)
        assert kept < total, (kept, total)  # ts stats actually prune
        return (
            tbl.read_where("ts", lo=lo, hi=hi)
            .filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
            .select("event_id", "user_id", "value")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

@query(
    "snapshot_date_prune_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE date_trunc('day', ts) <=
          CAST((SELECT CAST(ts AS DATE) FROM events WHERE event_id = 500)
               AS TIMESTAMP)
    """,
)
def snapshot_date_prune_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE-literal hi-bound stat pruning — the date twin of
    `snapshot_ts_prune_read` (r16, VERDICT r15 wrong #1): a plain
    ``dt.date`` probe against TIMESTAMP file stats must keep the file
    whose min is EXACTLY midnight of the probe date. The fixture
    engineers that boundary deterministically: events gain a
    day-truncated ``day_ts`` column and commit in two batches split at
    the date of event 500's ts, so the second batch's first file
    (sorted by ``day_ts``) has min == that midnight. Pre-fix,
    ``_probe_safe`` spelled the probe ``"YYYY-MM-DD"`` while the stat
    text is ``"YYYY-MM-DD 00:00:00"`` — the boundary file pruned and
    every row of the probe date vanished (the hash compare catches the
    loss); the engine's own residual filter (Spark coerces the date
    literal to the midnight instant) includes them. Reference anchor:
    the stats-prune contract mirrored from the published Iceberg
    manifest semantics (reference internal/iceberg/types.go:77-93).
    SF-relative bounds: event_id 500's date moves with SF; later-day
    files prune at every scale (the in-query assert pins it)."""
    import datetime as dt

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round("value", 4).alias("value"),
            F.date_trunc("day", F.col("ts")).alias("day_ts"),
        )
    )
    anchor = ev.filter(F.col("event_id") == 500).first()["day_ts"]
    hi_date = anchor.date()  # the probe is a PLAIN date, not a datetime
    midnight = dt.datetime(hi_date.year, hi_date.month, hi_date.day)
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(
            ev.filter(F.col("day_ts") < midnight).repartition(2),
            stats_cols=["day_ts"],
        )
        tbl.commit(
            ev.filter(F.col("day_ts") >= midnight).repartition(4),
            sort_by=["day_ts"],
        )
        m = tbl._resolve()
        # the discriminating boundary exists: some file min IS midnight
        assert any(
            st.get("day_ts", ("",))[0] == str(midnight)
            for st in m["file_stats"].values()
        ), m["file_stats"]
        kept, total = tbl.pruned_file_count("day_ts", hi=hi_date)
        assert kept < total, (kept, total)  # later-day files prune
        return (
            tbl.read_where("day_ts", hi=hi_date)
            .select("event_id", "user_id", "value")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

@query(
    "snapshot_rewrite_manifests_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE event_id > (SELECT MAX(event_id) // 8 FROM events)
    """,
)
def snapshot_rewrite_manifests_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL rewrite_manifests under the oracle gate (r16, VERDICT r15
    what's-missing #5): the full lifecycle — three appends split at
    SF-relative event_id cuts, a stats-pruned CoW delete, the
    metadata-only manifest fold, then an append PAST the fold — read
    back through the folded chain and hash-compared against the source
    slices. The fold stores the provenance checkpoint (file → adding
    version) so ``$entries`` / delete scoping / the Avro export stop
    walking O(commits) internal manifests; the in-query asserts pin
    that the fold commit is metadata-only and the checkpoint is
    present, and the hash compare proves reads through it lose
    nothing. Reference anchor: Iceberg's rewrite_manifests maintenance
    procedure over the manifest chain the engine mirrors from
    internal/iceberg/catalog/rest.go:186-217 (append-per-batch)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round("value", 4).alias("value")
    )
    n = ev.agg(F.max("event_id")).first()[0]
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(
            ev.filter(F.col("event_id") <= n // 2).repartition(4),
            stats_cols=["event_id"],
        )
        tbl.commit(
            ev.filter(
                (F.col("event_id") > n // 2) & (F.col("event_id") <= 3 * n // 4)
            ).repartition(2)
        )
        tbl.delete_where(f"event_id <= {n // 8}", key_cols=["event_id"])
        from philotes_spark.sql_frontend import sql as _sql

        _sql(spark, "CALL rewrite_manifests('t')", {"t": tbl})
        m = tbl._resolve()
        assert m["operation"] == "rewrite-manifests", m["operation"]
        assert m.get("provenance"), "fold must store the checkpoint"
        assert m["added_files"] == 0  # metadata-only
        tbl.commit(ev.filter(F.col("event_id") > 3 * n // 4).repartition(2))
        return (
            tbl.read()
            .select("event_id", "user_id", "value")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

@query(
    "snapshot_add_files_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    """,
)
def snapshot_add_files_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALL add_files under the oracle gate (r16): half the events
    commit normally, the other half is written as a FOREIGN parquet
    directory (no manifest) and adopted via ``CALL add_files`` — hard
    links plus manifest metadata, never a data rewrite. The adopted
    files get footer stats at adoption (the in-query assert pins that a
    range probe on the adopted half prunes), and the hash compare
    proves the adopted table serves exactly the source rows. The
    Iceberg migration procedure (add_files) the reference's users run
    to adopt pre-existing lake data; SF-relative split at
    MAX(event_id)/2."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round("value", 4).alias("value")
    )
    n = ev.agg(F.max("event_id")).first()[0]
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    foreign = tempfile.mkdtemp(prefix="philotes_foreign_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(
            ev.filter(F.col("event_id") <= n // 2).repartition(4),
            stats_cols=["event_id"],
        )
        (
            ev.filter(F.col("event_id") > n // 2)
            .repartition(2)
            .write.mode("overwrite")
            .parquet(foreign)
        )
        from philotes_spark.sql_frontend import sql as _sql

        out = _sql(
            spark,
            f"CALL add_files('t', source => '{foreign}')",
            {"t": tbl},
        ).first()
        assert out.version == 2, out
        m = tbl._resolve()
        assert m["operation"] == "add-files"
        # adoption recorded stats: a probe into the adopted half prunes
        kept, total = tbl.pruned_file_count(
            "event_id", lo=int(n * 0.9), hi=int(n)
        )
        assert kept < total, (kept, total)
        return (
            tbl.read()
            .select("event_id", "user_id", "value")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(foreign, ignore_errors=True)

@query(
    "snapshot_external_ts_prune_read",
    oracle="""
    SELECT event_id, user_id, ROUND(value, 4) AS value
    FROM events
    WHERE ts >= (SELECT ts FROM events WHERE event_id = 250)
      AND ts <= (SELECT ts FROM events WHERE event_id = 750)
    """,
)
def snapshot_external_ts_prune_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXTERNAL-reader timestamp scan planning under the oracle gate
    (r16): the engine publishes its per-file ts hulls as real Iceberg
    binary bounds (µs-from-epoch int64 — previously omitted, so an
    external engine could never time-prune a published table), and this
    query plays the external engine: walk the published Avro chain
    (``plan_entries``), decode each entry's bounds
    (``decode_bounds``), DROP the files whose [min,max] cannot
    intersect the probe, and read only the survivors. The in-query
    assert pins that the external plan actually pruned
    (kept < total — the commit is ts-clustered so hulls are narrow);
    the hash compare proves the externally planned scan loses nothing.
    The external twin of ``snapshot_ts_prune_read``; same SF-relative
    bounds (the fixture's own ts at two fixed event_ids)."""
    from philotes_spark.sources.catalog_rest import schema_to_rest
    from philotes_spark.sources.iceberg_manifest import (
        decode_bounds,
        plan_entries,
        write_manifests_for_version,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("value")
    )
    lo = ev.filter(F.col("event_id") == 250).first()["ts"]
    hi = ev.filter(F.col("event_id") == 750).first()["ts"]
    scratch = tempfile.mkdtemp(prefix="philotes_snap_")
    try:
        tbl = SnapshotTable(spark, scratch)
        tbl.commit(ev.repartition(8), sort_by=["ts"])
        rest = schema_to_rest(tbl.read().schema)
        ml = write_manifests_for_version(tbl, 1, rest_schema=rest)
        data, _deletes = plan_entries(ml)
        surviving = []
        for e in data:
            b = decode_bounds(e, rest).get("ts")
            if b is not None and b[0] is not None and (
                b[1] < lo or b[0] > hi
            ):
                continue  # provably disjoint: the external plan skips it
            surviving.append(e["file_path"])
        assert 0 < len(surviving) < len(data), (len(surviving), len(data))
        return (
            spark.read.parquet(*surviving)
            .filter((F.col("ts") >= lo) & (F.col("ts") <= hi))
            .select("event_id", "user_id", "value")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
