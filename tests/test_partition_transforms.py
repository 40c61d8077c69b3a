"""Non-identity partition transforms end-to-end (B19/A16 — VERDICT r12 #2).

The reference's DEFAULT spec is a transform — ``day(_cdc_timestamp)``
named ``_cdc_date`` (`internal/iceberg/schema/schema.go:104-135`) — so
``days(col)`` / ``bucket(N, col)`` must work as first-class layout fields:
hive paths carry the DERIVED integer value (the source column stays in
the data files), reads are layout-independent, day/bucket filters prune
files at plan time, and every rewrite path (merge, overwrite-partitions,
compaction, spec migration) keys partitions by the derived values.
"""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from philotes_spark.sources.snapshots import SnapshotTable
from philotes_spark.sources.transforms import bucket_value, day_value


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "t"))


def _events(spark, rows):
    return spark.createDataFrame(rows, "id long, ts timestamp, v string")


_D0 = dt.datetime(2024, 1, 5, 10, 0, 0)
_D1 = dt.datetime(2024, 1, 6, 11, 0, 0)
_D2 = dt.datetime(2024, 1, 7, 12, 0, 0)


def _rows(df):
    return sorted((r.id, r.ts, r.v) for r in df.select("id", "ts", "v").collect())


def test_day_partition_round_trip(spark, table):
    src = [(1, _D0, "a"), (2, _D1, "b"), (3, _D1, "c")]
    table.commit(_events(spark, src), partition_by=["days(ts)"])
    got = table.read()
    # the derived path field is layout, not a table column
    assert set(got.columns) == {"id", "ts", "v"}
    assert _rows(got) == sorted(src)
    # paths carry ts_day=<days-since-epoch> with the scalar-pinned value
    m = table._load(f"v{table.current_version():08d}.json")
    days = {
        seg.split("=", 1)[1]
        for f in m["files"]
        for seg in f.split(os.sep)
        if seg.startswith("ts_day=")
    }
    assert days == {str(day_value(_D0)), str(day_value(_D1))}


def test_bucket_partition_round_trip(spark, table):
    src = [(i, _D0, f"v{i}") for i in range(20)]
    table.commit(_events(spark, src), partition_by=["bucket(4,id)"])
    assert _rows(table.read()) == sorted(src)
    m = table._load(f"v{table.current_version():08d}.json")
    for f in m["files"]:
        seg = next(s for s in f.split(os.sep) if s.startswith("id_bucket="))
        b = int(seg.split("=", 1)[1])
        ids = {r.id for r in table.spark.read.parquet(f).collect()}
        assert all(bucket_value(i, 4) == b for i in ids)


def test_day_filter_prunes_files(spark, table):
    table.commit(
        _events(spark, [(1, _D0, "a"), (2, _D1, "b"), (3, _D2, "c")]),
        partition_by=["days(ts)"],
    )
    scanned, total = table.pruned_file_count("ts", lo=_D2)
    assert total >= 3 and scanned < total
    got = _rows(table.read_where("ts", lo=_D2))
    want = _rows(table.read().filter(F.col("ts") >= _D2))
    assert got == want == [(3, _D2, "c")]


def test_bucket_equality_prunes_files(spark, table):
    table.commit(
        _events(spark, [(i, _D0, f"v{i}") for i in range(32)]),
        partition_by=["bucket(4,id)"],
    )
    scanned, total = table.pruned_file_count("id", lo=7, hi=7)
    assert scanned < total
    got = _rows(table.read_where("id", lo=7, hi=7))
    assert got == [(7, _D0, "v7")]
    # a RANGE probe cannot prune on bucket (hash scatters order): all kept
    scanned, total = table.pruned_file_count("id", lo=0, hi=5)
    assert scanned == total


def test_evolve_identity_to_transform_mixed_read(spark, table):
    table.commit(_events(spark, [(1, _D0, "a")]), partition_by=["v"])
    table.evolve_partition_spec(["days(ts)"])
    table.commit(_events(spark, [(2, _D1, "b")]))
    assert _rows(table.read()) == [(1, _D0, "a"), (2, _D1, "b")]
    specs = {r.spec_id: r for r in table.partition_specs().collect()}
    assert specs[1].fields == "days(ts)" and specs[1].is_default
    # canonical spelling: a differently-spaced respec is a no-op
    v = table.current_version()
    assert table.evolve_partition_spec(["day( ts )"]) == v
    # compact() migrates the identity root under the transform spec
    table.compact()
    specs = {r.spec_id: r for r in table.partition_specs().collect()}
    assert specs[0].live_file_count == 0
    assert _rows(table.read()) == [(1, _D0, "a"), (2, _D1, "b")]


def test_partitioned_cow_merge_on_day_spec(spark, table):
    table.commit(
        _events(spark, [(1, _D0, "a"), (2, _D1, "b"), (3, _D2, "c")]),
        partition_by=["days(ts)"],
    )
    table.merge(_events(spark, [(2, _D1, "B")]), key_cols=["id"])
    assert _rows(table.read()) == [(1, _D0, "a"), (2, _D1, "B"), (3, _D2, "c")]
    # only the touched day partition was rewritten
    m = table._load(f"v{table.current_version():08d}.json")
    days = sorted(
        seg.split("=", 1)[1]
        for f in m["files"]
        for seg in f.split(os.sep)
        if seg.startswith("ts_day=")
    )
    assert str(day_value(_D0)) in days and str(day_value(_D2)) in days


def test_overwrite_partitions_on_day_spec(spark, table):
    table.commit(
        _events(spark, [(1, _D0, "a"), (2, _D1, "b")]),
        partition_by=["days(ts)"],
    )
    table.overwrite_partitions(_events(spark, [(9, _D1, "B9")]))
    assert _rows(table.read()) == [(1, _D0, "a"), (9, _D1, "B9")]


def test_guards(spark, table):
    table.commit(
        _events(spark, [(1, _D0, "a")]), partition_by=["days(ts)"]
    )
    # the transform's SOURCE column is a layout column: drop refuses
    with pytest.raises(ValueError, match="layout column"):
        table.alter_drop_column("ts")
    with pytest.raises(ValueError, match="not columns"):
        table.evolve_partition_spec(["days(nope)"])
    with pytest.raises(ValueError, match="unsupported partition field"):
        table.evolve_partition_spec(["md5(ts)"])
    with pytest.raises(ValueError, match="duplicate"):
        table.evolve_partition_spec(["days(ts)", "day(ts)"])
    with pytest.raises(ValueError, match="needs a date/timestamp"):
        table.evolve_partition_spec(["days(v)"])
    # a rejected evolution must not poison the table: writes still land
    table.commit(_events(spark, [(2, _D1, "b")]))
    assert len(_rows(table.read())) == 2


def test_transform_name_shadow_refused(spark, table):
    df = spark.createDataFrame(
        [(1, _D0, 5)], "id long, ts timestamp, ts_day int"
    )
    table.commit(df)
    with pytest.raises(ValueError, match="collide"):
        table.evolve_partition_spec(["days(ts)"])


def test_publish_transform_spec_and_planner_prunes(spark, table):
    """The wire half (VERDICT r12 #2): a transform-partitioned publish
    serves the real transform strings (``day`` / ``bucket[N]``), the
    manifests carry the derived integer partition values, both external
    readers reconstruct the table row-identically, and the INDEPENDENT
    planner prunes with them — a time filter reads only the matching day
    partitions, a bucket-equality filter only the matching bucket — using
    its own murmur3, not the engine's."""
    import threading

    from philotes_spark.sources.catalog_rest import RestCatalog
    from tests.iceberg_planner import plan_files_pruned
    from tests.test_catalog_rest import MockCatalog, _readback_equal

    table.commit(
        _events(spark, [(1, _D0, "a"), (2, _D1, "b"), (3, _D2, "c")]),
        partition_by=["days(ts)"],
    )
    table.evolve_partition_spec(["bucket(4,id)"])
    table.commit(_events(spark, [(i, _D2, f"n{i}") for i in range(10, 26)]))
    srv = MockCatalog()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
        cat.publish_snapshot("ns", "t", table)
        assert _readback_equal(spark, table, "ns", "t", cat) == 19
        meta = cat.load_table("ns", "t")["metadata"]
        by_id = {sp["spec-id"]: sp for sp in meta["partition-specs"]}
        assert [
            (f["name"], f["transform"]) for f in by_id[0]["fields"]
        ] == [("ts_day", "day")]
        assert [
            (f["name"], f["transform"]) for f in by_id[1]["fields"]
        ] == [("id_bucket", "bucket[4]")]
        assert meta["default-spec-id"] == 1
        cur = meta["current-snapshot-id"]
        ml = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == cur
        )["manifest-list"]
        # day-range prune: ts >= _D2 keeps the D2 day file and every
        # bucket file (other spec: no day field -> kept), drops D0/D1
        kept, total = plan_files_pruned(ml, meta, ("ts", ">=", _D2))
        assert len(kept) < total
        days = {
            (d.get("partition") or {}).get("ts_day")
            for d in kept
            if "ts_day" in (d.get("partition") or {})
        }
        assert days == {day_value(_D2)}
        # the pruned scan is still CORRECT: re-reading kept files and
        # filtering equals the engine's filtered read
        import pyarrow.parquet as pq

        got_ids = sorted(
            i
            for d in kept
            for i in pq.read_table(d["file_path"]).to_pandas()["id"]
            if True
        )
        want = sorted(
            r.id for r in table.read().filter(F.col("ts") >= _D2).collect()
        )
        # kept is a superset per file grain; the residual filter lands it
        assert set(want) <= set(got_ids)
        # bucket-equality prune: id == 17 reads only bucket(17)'s files
        # in the bucketed spec (day-spec files keep: no id field there)
        kept_b, total_b = plan_files_pruned(ml, meta, ("id", "==", 17))
        assert len(kept_b) < total_b
        buckets = {
            (d.get("partition") or {}).get("id_bucket")
            for d in kept_b
            if "id_bucket" in (d.get("partition") or {})
        }
        assert buckets == {bucket_value(17, 4)}
        ids_b = {
            i
            for d in kept_b
            for i in pq.read_table(d["file_path"]).to_pandas()["id"]
        }
        assert 17 in ids_b
    finally:
        srv.shutdown()
        srv.server_close()


def test_statement_surface_transforms(spark, table, tmp_path):
    """ALTER TABLE ADD/DROP/REPLACE PARTITION FIELD and CTAS PARTITIONED
    BY accept transform fields with canonical spelling."""
    from philotes_spark.sql_frontend import sql

    table.commit(_events(spark, [(1, _D0, "a")]))
    tables = {"t": table}
    out = sql(
        spark,
        "ALTER TABLE t ADD PARTITION FIELD days(ts)",
        snapshot_tables=tables,
    ).collect()[0]
    assert out.operation == "add-partition-field"
    m = table._load(f"v{table.current_version():08d}.json")
    assert m["partition_by"] == ["days(ts)"]
    table.commit(_events(spark, [(2, _D1, "b")]))
    assert len(_rows(table.read())) == 2
    with pytest.raises(ValueError, match="already a partition field"):
        sql(
            spark,
            "ALTER TABLE t ADD PARTITION FIELD day( ts )",  # canonical ==
            snapshot_tables=tables,
        )
    out = sql(
        spark,
        "ALTER TABLE t REPLACE PARTITION FIELD days(ts) WITH bucket(4, id)",
        snapshot_tables=tables,
    ).collect()[0]
    assert out.operation == "replace-partition-field"
    m = table._load(f"v{table.current_version():08d}.json")
    assert m["partition_by"] == ["bucket(4,id)"]
    out = sql(
        spark,
        "ALTER TABLE t DROP PARTITION FIELD bucket(4,id)",
        snapshot_tables=tables,
    ).collect()[0]
    assert out.operation == "drop-partition-field"
    # CTAS with a transform spec
    tables2 = {}
    sql(
        spark,
        "CREATE TABLE t2 PARTITIONED BY (days(ts)) AS "
        "SELECT id, timestamp'2024-01-05 10:00:00' AS ts FROM range(4)",
        snapshot_tables=tables2,
        table_root=str(tmp_path),
    )
    t2 = tables2["t2"]
    assert t2._resolve().get("partition_by") == ["days(ts)"]
    assert t2.read().count() == 4
    assert set(t2.read().columns) == {"id", "ts"}


def test_month_year_truncate_round_trip_and_prune(spark, table):
    """r13 follow-through: the rest of the reference's transform set
    (internal/iceberg/types.go:136-140) — months()/years() (calendar
    ints from 1970) and truncate(W) (numeric floor / string prefix).
    All order-preserving, so range probes prune."""
    from philotes_spark.sources.transforms import (
        month_value,
        truncate_value,
        year_value,
    )

    rows = [
        (1, dt.datetime(2023, 12, 30, 8), "alpha"),
        (2, dt.datetime(2024, 1, 2, 9), "beta"),
        (3, dt.datetime(2024, 3, 15, 10), "gamma"),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, s string")
    table.commit(df, partition_by=["months(ts)"])
    got = table.read()
    assert set(got.columns) == {"id", "ts", "s"}
    assert got.count() == 3
    m = table._load(f"v{table.current_version():08d}.json")
    months = {
        int(seg.split("=", 1)[1])
        for f in m["files"]
        for seg in f.split(os.sep)
        if seg.startswith("ts_month=")
    }
    assert months == {month_value(r[1]) for r in rows} == {647, 648, 650}
    # range prune on the month layout
    scanned, total = table.pruned_file_count(
        "ts", lo=dt.datetime(2024, 2, 1)
    )
    assert scanned < total
    got = table.read_where("ts", lo=dt.datetime(2024, 2, 1))
    assert [r.id for r in got.collect()] == [3]
    # evolve to years(): both transforms over the SAME source coexist
    table.evolve_partition_spec(["years(ts)"])
    table.commit(
        spark.createDataFrame(
            [(4, dt.datetime(2025, 6, 1, 12), "delta")],
            "id long, ts timestamp, s string",
        )
    )
    assert year_value(dt.datetime(2025, 6, 1, 12)) == 55
    assert table.read().count() == 4
    got = table.read_where("ts", lo=dt.datetime(2025, 1, 1))
    assert [r.id for r in got.collect()] == [4]


def test_truncate_numeric_and_string(spark, table):
    from philotes_spark.sources.transforms import truncate_value

    df = spark.createDataFrame(
        [(i, f"w{i % 4}x{i}") for i in range(-10, 10)], "id long, s string"
    )
    table.commit(df, partition_by=["truncate(5,id)"])
    m = table._load(f"v{table.current_version():08d}.json")
    for f in m["files"]:
        seg = next(s for s in f.split(os.sep) if s.startswith("id_trunc="))
        t = int(seg.split("=", 1)[1])
        assert t % 5 == 0  # floors, including negatives
        ids = {r.id for r in spark.read.parquet(f).collect()}
        assert all(truncate_value(i, 5) == t for i in ids)
    # range prune: id >= 5 drops the negative-floor partitions
    scanned, total = table.pruned_file_count("id", lo=5)
    assert scanned < total
    got = sorted(r.id for r in table.read_where("id", lo=5).collect())
    assert got == list(range(5, 10))
    # string prefix truncation via evolution
    table.evolve_partition_spec(["truncate(2,s)"])
    table.commit(
        spark.createDataFrame([(99, "zzTOP")], "id long, s string")
    )
    m = table._load(f"v{table.current_version():08d}.json")
    assert any("s_trunc=zz" in f for f in m["files"])
    assert table.read().count() == 21


def test_publish_month_truncate_spec_and_planner(spark, table):
    """Wire + independent-planner leg for the r13 transform additions."""
    import threading

    from philotes_spark.sources.catalog_rest import RestCatalog
    from tests.iceberg_planner import plan_files_pruned
    from tests.test_catalog_rest import MockCatalog, _readback_equal

    table.commit(
        _events(spark, [(1, _D0, "aa1"), (2, _D1, "ab2"), (3, _D2, "zz3")]),
        partition_by=["months(ts)", "truncate(1,v)"],
    )
    srv = MockCatalog()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
        cat.publish_snapshot("ns", "t", table)
        assert _readback_equal(spark, table, "ns", "t", cat) == 3
        meta = cat.load_table("ns", "t")["metadata"]
        sp = next(s for s in meta["partition-specs"] if s["spec-id"] == 0)
        assert [(f["name"], f["transform"]) for f in sp["fields"]] == [
            ("ts_month", "month"),
            ("v_trunc", "truncate[1]"),
        ]
        cur = meta["current-snapshot-id"]
        ml = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == cur
        )["manifest-list"]
        # truncate-prefix equality prune: v == 'zz3' reads only the
        # v_trunc='z' partition
        kept, total = plan_files_pruned(ml, meta, ("v", "==", "zz3"))
        assert len(kept) < total
        assert {
            (d.get("partition") or {}).get("v_trunc") for d in kept
        } == {"z"}
    finally:
        srv.shutdown()
        srv.server_close()


def test_commit_time_shadow_refused(spark, table):
    """Review r13: a DIRECT commit(partition_by=[transform]) over a df
    that already has a column named like the derived field must refuse —
    withColumn would silently replace it and partitionBy would move the
    replacement into the path, destroying the original values."""
    df = spark.createDataFrame(
        [(1, _D0, 5)], "id long, ts timestamp, ts_day int"
    )
    with pytest.raises(ValueError, match="collide"):
        table.commit(df, partition_by=["days(ts)"])
    # and a later ADD COLUMN cannot sneak the collision in either
    t2 = SnapshotTable(spark, table.path + "_2")
    t2.commit(_events(spark, [(1, _D0, "a")]), partition_by=["days(ts)"])
    with pytest.raises(ValueError, match="transform partition field"):
        t2.alter_add_columns([("ts_day", "int")])


def test_space_before_paren_spellings(spark, table):
    """Review r13: every spelling the SQL grammar matches must parse —
    'days (ts)' and 'bucket (4, id)' canonicalize like the tight forms."""
    from philotes_spark.sources.transforms import parse_part_field
    from philotes_spark.sql_frontend import sql

    assert parse_part_field("days (ts)").raw == "days(ts)"
    assert parse_part_field("bucket (4, id)").raw == "bucket(4,id)"
    assert parse_part_field("truncate (3, s)").raw == "truncate(3,s)"
    table.commit(_events(spark, [(1, _D0, "a")]))
    out = sql(
        spark,
        "ALTER TABLE t ADD PARTITION FIELD days (ts)",
        snapshot_tables={"t": table},
    ).collect()[0]
    assert out.operation == "add-partition-field"
    m = table._load(f"v{table.current_version():08d}.json")
    assert m["partition_by"] == ["days(ts)"]


def test_expiry_and_time_travel_across_transform_evolution(spark, table):
    """Lifecycle composition: transform evolutions x snapshot expiry x
    time travel. Retention drops pre-evolution versions and their
    exclusive files; the surviving mixed-spec chain still reads, and
    time travel inside the retained window sees each layout's rows."""
    table.commit(_events(spark, [(1, _D0, "a")]), partition_by=["days(ts)"])
    table.evolve_partition_spec(["bucket(4,id)"])
    table.commit(_events(spark, [(2, _D1, "b")]))
    v_mid = table.current_version()
    table.evolve_partition_spec(["months(ts)"])
    table.commit(_events(spark, [(3, _D2, "c")]))
    assert len(_rows(table.read(version=v_mid))) == 2
    deleted = table.expire_snapshots(keep_last=2)
    assert deleted >= 0
    got = _rows(table.read())
    assert [r[0] for r in got] == [1, 2, 3]  # rows survive expiry
    with pytest.raises(ValueError):
        table.read(version=1)  # expired version refuses time travel
    # spec accounting still covers every live file exactly once
    m = table._load(f"v{table.current_version():08d}.json")
    spec_rows = table.partition_specs().collect()
    assert sum(r.live_file_count for r in spec_rows) == len(m["files"])


def test_incremental_read_across_transform_roots(spark, table):
    """read_incremental diffs file lists across transform evolutions:
    each appended batch surfaces once, tagged with its commit version,
    regardless of which spec its root was written under."""
    table.commit(_events(spark, [(1, _D0, "a")]), partition_by=["days(ts)"])
    v1 = table.current_version()
    table.evolve_partition_spec(["truncate(2,v)"])
    table.commit(_events(spark, [(2, _D1, "bx")]))
    table.commit(_events(spark, [(3, _D2, "cy")]))
    inc = table.read_incremental(v1)
    rows = {(r.id, r.commit_version) for r in inc.collect()}
    assert {i for i, _ in rows} == {2, 3}
    assert len({v for _, v in rows}) == 2  # two distinct commits
    assert "v_trunc" not in inc.columns  # derived fields never surface
