"""Partition-spec evolution (B19/A16 — Iceberg spec evolution).

Contract under test (`SnapshotTable.evolve_partition_spec`,
`ALTER TABLE ... ADD/DROP PARTITION FIELD`): changing the layout is a
METADATA-ONLY commit — no file is read or rewritten; existing files keep
the spec they were written under (``root_specs``) and the read unions
per staged root, so results are layout-independent. Reference interop
shape: ``TableMetadata.PartitionSpecs[]/DefaultSpecID``
(internal/iceberg/types.go:136-140).
"""

import pytest
from pyspark.sql import functions as F

from philotes_spark.sources.snapshots import SnapshotTable
from philotes_spark.sql_frontend import sql


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "t"))


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id int, cat string, reg string, v int"
    )


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("id", "cat", "reg", "v").collect()
    )


def test_evolve_unpartitioned_to_partitioned(spark, table):
    table.commit(_df(spark, [(1, "a", "x", 10), (2, "b", "y", 20)]))
    v = table.evolve_partition_spec(["cat"])
    assert v == 2  # a real (metadata-only) version
    table.commit(_df(spark, [(3, "a", "z", 30), (4, "c", "x", 40)]))
    got = _rows(table.read())
    assert got == [
        (1, "a", "x", 10), (2, "b", "y", 20),
        (3, "a", "z", 30), (4, "c", "x", 40),
    ]
    # spec history: append-only, default moved, old files keep spec 0
    specs = {
        r.spec_id: r for r in table.partition_specs().collect()
    }
    assert specs[0].fields == "<unpartitioned>" and not specs[0].is_default
    assert specs[1].fields == "cat" and specs[1].is_default
    assert specs[0].live_file_count > 0  # old files NOT rewritten
    assert specs[1].live_file_count > 0


def test_evolution_is_metadata_only(spark, table):
    table.commit(_df(spark, [(1, "a", "x", 10)]))
    m1 = table._load(f"v{table.current_version():08d}.json")
    table.evolve_partition_spec(["reg"])
    m2 = table._load(f"v{table.current_version():08d}.json")
    assert m2["files"] == m1["files"]  # zero rewrites
    assert m2["operation"] == "evolve-partition-spec"
    assert m2["added_files"] == 0


def test_evolve_between_partition_columns(spark, table):
    table.commit(
        _df(spark, [(1, "a", "x", 10), (2, "b", "y", 20)]),
        partition_by=["cat"],
    )
    table.evolve_partition_spec(["reg"])
    table.commit(_df(spark, [(3, "a", "z", 30)]))
    # drop back to unpartitioned
    table.evolve_partition_spec([])
    table.commit(_df(spark, [(4, "c", "x", 40)]))
    got = _rows(table.read())
    assert [r[0] for r in got] == [1, 2, 3, 4]
    # three roots, three specs live at once
    m = table._load(f"v{table.current_version():08d}.json")
    assert len({int(s) for s in m["root_specs"].values()}) == 3


def test_time_travel_across_evolution(spark, table):
    table.commit(_df(spark, [(1, "a", "x", 10)]), partition_by=["cat"])
    v1 = table.current_version()
    table.evolve_partition_spec([])
    table.commit(_df(spark, [(2, "b", "y", 20)]))
    assert _rows(table.read(version=v1)) == [(1, "a", "x", 10)]
    assert len(_rows(table.read())) == 2


def test_partition_value_roundtrip_types(spark, table):
    """A column moved into the path and back must keep its values AND a
    usable type: old roots carry it as DATA (authoritative), new roots
    re-derive it from path segments."""
    df = spark.createDataFrame(
        [(1, 7, "x"), (2, 9, "y")], "id int, bucket int, s string"
    )
    table.commit(df)
    table.evolve_partition_spec(["bucket"])
    table.commit(
        spark.createDataFrame([(3, 7, "z")], "id int, bucket int, s string")
    )
    got = table.read()
    assert dict(got.dtypes)["bucket"] == "int"  # data-root type wins
    assert got.filter(F.col("bucket") == 7).count() == 2


def test_guards(spark, table):
    table.commit(_df(spark, [(1, "a", "x", 10)]))
    with pytest.raises(ValueError, match="not columns of the table"):
        table.evolve_partition_spec(["nope"])
    with pytest.raises(ValueError, match="duplicate partition fields"):
        table.evolve_partition_spec(["cat", "cat"])
    # no-op evolution returns the current version without a commit
    v = table.current_version()
    assert table.evolve_partition_spec([]) == v
    # explicit conflicting spec on append still refuses, naming the remedy
    table.evolve_partition_spec(["cat"])
    with pytest.raises(ValueError, match="evolve the layout"):
        table.commit(
            _df(spark, [(9, "z", "q", 90)]), partition_by=["reg"]
        )


def test_clustering_overlap_refused(spark, table):
    table.commit(_df(spark, [(1, "a", "x", 10)]), sort_by=["v"])
    with pytest.raises(ValueError, match="sort/z-order"):
        table.evolve_partition_spec(["v"])


def test_partition_keyed_rewrites_refuse_mixed_then_compact_unblocks(
    spark, table
):
    table.commit(
        _df(spark, [(1, "a", "x", 10), (2, "b", "y", 20)]),
        partition_by=["cat"],
    )
    table.evolve_partition_spec(["reg"])
    table.commit(_df(spark, [(3, "a", "z", 30)]))
    changes = _df(spark, [(1, "a", "x", 11)])
    with pytest.raises(ValueError, match="not under the current default"):
        table.merge(changes, key_cols=["id"])
    with pytest.raises(ValueError, match="not under the current default"):
        table.overwrite_partitions(changes)
    # OPTIMIZE migrates every file to the default spec and unblocks
    table.compact()
    specs = {r.spec_id: r for r in table.partition_specs().collect()}
    assert specs[0].live_file_count == 0
    assert sum(r.live_file_count for r in specs.values()) > 0
    table.merge(changes, key_cols=["id"])
    got = _rows(table.read())
    assert (1, "a", "x", 11) in got and len(got) == 3


def test_mor_merge_allowed_on_mixed_specs(spark, table):
    """MoR deltas key rows, not files — the layout never matters."""
    table.commit(
        _df(spark, [(1, "a", "x", 10), (2, "b", "y", 20)]),
        partition_by=["cat"],
    )
    table.evolve_partition_spec([])
    table.commit(_df(spark, [(3, "c", "z", 30)]))
    table.merge(
        _df(spark, [(2, "b", "y", 99)]), key_cols=["id"], mode="mor"
    )
    got = _rows(table.read())
    assert (2, "b", "y", 99) in got and len(got) == 3
    # compact_deltas folds deltas AND the root_specs bookkeeping follows
    table.compact_deltas()
    assert _rows(table.read()) == got


def test_statement_surface(spark, table):
    table.commit(_df(spark, [(1, "a", "x", 10)]))
    tables = {"t": table}
    out = sql(
        spark, "ALTER TABLE t ADD PARTITION FIELD cat", snapshot_tables=tables
    ).collect()[0]
    assert out.operation == "add-partition-field"
    table.commit(_df(spark, [(2, "b", "y", 20)]))
    assert len(_rows(table.read())) == 2
    with pytest.raises(ValueError, match="already a partition field"):
        sql(
            spark,
            "ALTER TABLE t ADD PARTITION FIELD cat",
            snapshot_tables=tables,
        )
    out = sql(
        spark, "ALTER TABLE t DROP PARTITION FIELD cat", snapshot_tables=tables
    ).collect()[0]
    assert out.operation == "drop-partition-field"
    with pytest.raises(ValueError, match="not a partition field"):
        sql(
            spark,
            "ALTER TABLE t DROP PARTITION FIELD reg",
            snapshot_tables=tables,
        )
    # $partition_specs metadata table through SQL text
    specs = sql(
        spark,
        "SELECT spec_id, fields, is_default FROM t$partition_specs "
        "ORDER BY spec_id",
        snapshot_tables=tables,
    ).collect()
    assert [r.fields for r in specs] == ["<unpartitioned>", "cat"]
    assert [r.is_default for r in specs] == [True, False]
    # REPLACE PARTITION FIELD a WITH b: one evolution, fields swapped
    sql(spark, "ALTER TABLE t ADD PARTITION FIELD cat", snapshot_tables=tables)
    out = sql(
        spark,
        "ALTER TABLE t REPLACE PARTITION FIELD cat WITH reg",
        snapshot_tables=tables,
    ).collect()[0]
    assert out.operation == "replace-partition-field"
    m = table._load(f"v{table.current_version():08d}.json")
    assert m["partition_by"] == ["reg"]
    with pytest.raises(ValueError, match="not a partition field"):
        sql(
            spark,
            "ALTER TABLE t REPLACE PARTITION FIELD cat WITH v",
            snapshot_tables=tables,
        )


def test_publish_spec_evolution_external_readback(spark, table, tmp_path):
    """Full wire support (r12): an evolved-layout publish rides
    add-spec / set-default-spec updates, writes one data manifest PER
    spec (the manifest-list row's partition_spec_id names which), and
    both external readers (the engine's Avro reader and the independent
    pandas planner inside _readback_equal) reconstruct the mixed-spec
    table row-identically — no compaction, zero rewrites."""
    import threading

    from philotes_spark.sources.catalog_rest import RestCatalog
    from philotes_spark.sources.iceberg_manifest import read_manifest_list
    from tests.test_catalog_rest import MockCatalog, _readback_equal

    table.commit(
        _df(spark, [(1, "a", "x", 10), (2, "b", "y", 20)]),
        partition_by=["cat"],
    )
    srv = MockCatalog()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
        cat.publish_snapshot("ns", "t", table)
        # evolve + append under the new spec, publish WITHOUT compacting
        table.evolve_partition_spec(["reg"])
        table.commit(_df(spark, [(3, "a", "z", 30), (4, "c", "x", 40)]))
        cat.publish_snapshot("ns", "t", table)
        assert _readback_equal(spark, table, "ns", "t", cat) == 4
        meta = cat.load_table("ns", "t")["metadata"]
        by_id = {sp["spec-id"]: sp for sp in meta["partition-specs"]}
        assert [f["name"] for f in by_id[0]["fields"]] == ["cat"]
        assert [f["name"] for f in by_id[1]["fields"]] == ["reg"]
        assert meta["default-spec-id"] == 1
        # partition field ids are unique across specs (never reused)
        pfids = [
            f["field-id"] for sp in meta["partition-specs"]
            for f in sp["fields"]
        ]
        assert len(set(pfids)) == len(pfids)
        assert meta["last-partition-id"] == max(pfids)
        # the manifest list names each manifest's spec
        cur = meta["current-snapshot-id"]
        ml = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == cur
        )["manifest-list"]
        spec_ids = {mf["partition_spec_id"] for mf in read_manifest_list(ml)}
        assert spec_ids == {0, 1}
        # evolve BACK to the original spec: the id is reused, not re-minted
        table.evolve_partition_spec(["cat"])
        table.commit(_df(spark, [(5, "d", "q", 50)]))
        cat.publish_snapshot("ns", "t", table)
        assert _readback_equal(spark, table, "ns", "t", cat) == 5
        meta = cat.load_table("ns", "t")["metadata"]
        assert meta["default-spec-id"] == 0
        assert len(meta["partition-specs"]) == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_publish_unpublished_evolution_creates_with_real_default(
    spark, table, tmp_path
):
    """A table that evolved BEFORE first publish creates with its actual
    default spec id (not a fresh spec 0) and the registry's stable
    partition field ids."""
    import threading

    from philotes_spark.sources.catalog_rest import RestCatalog
    from tests.test_catalog_rest import MockCatalog, _readback_equal

    table.commit(_df(spark, [(1, "a", "x", 10)]), partition_by=["cat"])
    table.evolve_partition_spec(["reg"])
    table.commit(_df(spark, [(2, "b", "y", 20)]))
    srv = MockCatalog()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
        cat.publish_snapshot("ns", "t", table)
        assert _readback_equal(spark, table, "ns", "t", cat) == 2
        meta = cat.load_table("ns", "t")["metadata"]
        assert meta["default-spec-id"] == 1
        assert {sp["spec-id"] for sp in meta["partition-specs"]} == {0, 1}
    finally:
        srv.shutdown()
        srv.server_close()


def test_schema_ops_compose_with_evolution(spark, table):
    """Rename journal over a path-derived column: pre-rename roots
    surface the OLD name from their paths, and the journal's coalesce
    lands the new name for every root."""
    table.commit(
        _df(spark, [(1, "a", "x", 10)]), partition_by=["cat"]
    )
    table.evolve_partition_spec([])
    table.commit(_df(spark, [(2, "b", "y", 20)]))
    table.alter_rename_column("cat", "category")
    got = table.read()
    assert "category" in got.columns and "cat" not in got.columns
    vals = {r.category for r in got.collect()}
    assert vals == {"a", "b"}


def test_read_where_parity_on_partitioned_and_evolved(spark, table):
    """read_where's contract — results equal read().filter(...) exactly —
    must hold when partition columns live in the PATH (hive roots) and
    across a spec evolution (some roots path-derived, some data): the
    spec_map-aware scan surfaces every column either way."""
    table.commit(
        _df(spark, [(1, "a", "x", 10), (2, "b", "y", 20)]),
        partition_by=["cat"],
        stats_cols=["id"],
    )
    table.evolve_partition_spec([])
    table.commit(
        _df(spark, [(3, "c", "z", 30)]), stats_cols=["id"]
    )
    got = _rows(table.read_where("id", lo=2))
    want = _rows(table.read().filter(F.col("id") >= 2))
    assert got == want and len(got) == 2


def test_publish_after_drop_old_spec_column_and_compact(spark, table):
    """ADVICE r12: evolve → drop the OLD spec's source column → publish
    refuses (live files under a dangling spec) → compact() — the error's
    own remedy — must actually unblock. The compact version's manifest
    carries the pre-compact files only as status=2 DELETED entries (they
    survive on disk for time travel); those tombstones re-home under the
    default spec instead of re-tripping the dangling-spec guard."""
    import threading

    from philotes_spark.sources.catalog_rest import RestCatalog
    from tests.test_catalog_rest import MockCatalog, _readback_equal

    table.commit(
        _df(spark, [(1, "a", "x", 10), (2, "b", "y", 20)]),
        partition_by=["cat"],
    )
    table.evolve_partition_spec(["reg"])
    table.commit(_df(spark, [(3, "c", "z", 30)]))
    table.alter_drop_column("cat")  # old spec's source column: allowed
    srv = MockCatalog()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cat = RestCatalog(f"http://127.0.0.1:{srv.port}", "wh")
        with pytest.raises(ValueError, match="compact"):
            cat.publish_snapshot("ns", "t", table)
        table.compact()
        cat.publish_snapshot("ns", "t", table)  # must not re-raise
        assert _readback_equal(spark, table, "ns", "t", cat) == 3
        meta = cat.load_table("ns", "t")["metadata"]
        assert meta["default-spec-id"] == 1
    finally:
        srv.shutdown()
        srv.server_close()
