"""Write-order evolution (r13): ``set_write_order`` metadata-only
commits, ``rewrite_clustered`` history reclustering, and the statement
spellings (``ALTER TABLE … WRITE ORDERED BY`` / ``WRITE UNORDERED``,
``OPTIMIZE … ZORDER BY``, ``CALL rewrite_data_files(strategy =>
'sort')``) — the sort-order analogue of partition-spec evolution
(Iceberg SetDefaultSortOrder; sort-orders / default-sort-order-id in the
published v2 metadata are covered in test_catalog_rest.py).
"""

import pytest
from pyspark.sql import functions as F

from philotes_spark.sources.snapshots import SnapshotTable
from philotes_spark.sql_frontend import sql as sql_stmt


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "t"))


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 2).alias("v"),
        )
        .repartition(4)
    )


def _m(table):
    return table._load(f"v{table.current_version():08d}.json")


def test_set_write_order_is_metadata_only(spark, table):
    v1 = table.commit(_df(spark, 0, 500))
    files_before = _m(table)["files"]
    v2 = table.set_write_order(sort_by=["k"])
    assert v2 == v1 + 1
    m = _m(table)
    assert m["operation"] == "set-write-order"
    assert m["sort_by"] == ["k"]
    assert m["files"] == files_before  # no file read or rewritten
    assert m["added_files"] == 0 and m["added_rows"] == 0
    # the order's columns join stats_cols so future appends can prune
    assert "k" in m["stats_cols"]
    # idempotent: the same order again is a no-op, no new version
    assert table.set_write_order(sort_by=["k"]) == v2


def test_appends_inherit_and_cluster(spark, table):
    table.commit(_df(spark, 0, 1000))
    table.set_write_order(sort_by=["k"])
    table.commit(_df(spark, 1000, 2000))
    m = _m(table)
    assert m["sort_by"] == ["k"]  # inherited without restating
    # the appended files are range-clustered: a narrow k-range prunes
    # some of them, while the pre-order files (no stats) are all kept
    kept, total = table.pruned_file_count("k", lo=1100, hi=1200)
    assert kept < total
    assert table.read().count() == 2000


def test_rewrite_clustered_covers_history(spark, table):
    table.commit(_df(spark, 0, 2000))
    table.set_write_order(sort_by=["k"])
    before = sorted(r.k for r in table.read().collect())
    v = table.rewrite_clustered()
    assert v == table.current_version()
    assert sorted(r.k for r in table.read().collect()) == before
    kept, total = table.pruned_file_count("k", lo=100, hi=200)
    assert kept < total  # pre-order files now prune too


def test_write_unordered_clears(spark, table):
    table.commit(_df(spark, 0, 100))
    table.set_write_order(sort_by=["k"])
    v = table.set_write_order()
    m = _m(table)
    assert m["sort_by"] == [] and m["zorder_by"] == []
    assert v == table.current_version()
    # clearing again is a no-op
    assert table.set_write_order() == v


def test_set_write_order_guards(spark, table):
    table.commit(_df(spark, 0, 100))
    with pytest.raises(ValueError, match="exclusive"):
        table.set_write_order(sort_by=["k"], zorder_by=["g"])
    with pytest.raises(ValueError, match="not columns of the table"):
        table.set_write_order(sort_by=["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        table.set_write_order(sort_by=["k", "k"])


def test_identity_partition_overlap_refused(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "p"))
    t.commit(_df(spark, 0, 100), partition_by=["g"])
    with pytest.raises(ValueError, match="identity partition fields"):
        t.set_write_order(sort_by=["g"])
    # a transform field's SOURCE column is fine: in-file ranges within a
    # day/bucket directory are still narrow
    t.evolve_partition_spec(["bucket(4, g)"])
    t.set_write_order(sort_by=["k"])


def test_time_travel_unaffected(spark, table):
    table.commit(_df(spark, 0, 300))
    v1 = table.current_version()
    n1 = table.read(version=v1).count()
    table.set_write_order(sort_by=["k"])
    table.rewrite_clustered()
    assert table.read(version=v1).count() == n1


def test_statement_write_ordered_by(spark, table):
    table.commit(_df(spark, 0, 200))
    out = sql_stmt(
        spark,
        "ALTER TABLE t WRITE ORDERED BY (k ASC NULLS FIRST, g)",
        {"t": table},
    ).collect()
    assert out[0].operation == "set-write-order"
    assert _m(table)["sort_by"] == ["k", "g"]
    # parens optional (Iceberg spells it without)
    sql_stmt(spark, "ALTER TABLE t WRITE ORDERED BY v", {"t": table})
    assert _m(table)["sort_by"] == ["v"]
    sql_stmt(spark, "ALTER TABLE t WRITE UNORDERED", {"t": table})
    assert _m(table)["sort_by"] == []


def test_statement_desc_nulls_last_round_trip(spark, table):
    """r14 (VERDICT r13 #5): DESC / NULLS LAST write orders end to end —
    parsed from the statement, canonicalized Iceberg-style (ASC defaults
    NULLS FIRST, DESC defaults NULLS LAST, defaults elided), stored in
    the manifest, honored by the clustered write."""
    table.commit(_df(spark, 0, 1000))
    out = sql_stmt(
        spark,
        "ALTER TABLE t WRITE ORDERED BY (k DESC, g ASC NULLS LAST)",
        {"t": table},
    ).collect()
    assert out[0].operation == "set-write-order"
    assert _m(table)["sort_by"] == ["k DESC", "g NULLS LAST"]
    # the non-default null placements survive; defaults are elided
    sql_stmt(
        spark,
        "ALTER TABLE t WRITE ORDERED BY (k DESC NULLS FIRST, g asc)",
        {"t": table},
    )
    assert _m(table)["sort_by"] == ["k DESC NULLS FIRST", "g"]
    # idempotent through a different spelling of the same canonical order
    v = table.current_version()
    sql_stmt(
        spark,
        "ALTER TABLE t WRITE ORDERED BY (k desc nulls first, g ASC NULLS FIRST)",
        {"t": table},
    )
    assert table.current_version() == v


def test_desc_order_clusters_and_prunes(spark, table):
    """A DESC order range-partitions descending — per-file hulls are
    still disjoint, so file-skipping (direction-agnostic [min,max]
    stats) prunes exactly as for ASC, and each file's rows really are
    non-increasing on the sort column."""
    table.commit(_df(spark, 0, 2000))
    table.set_write_order(sort_by=["k DESC"])
    before = sorted(r.k for r in table.read().collect())
    table.rewrite_clustered()
    assert sorted(r.k for r in table.read().collect()) == before
    kept, total = table.pruned_file_count("k", lo=100, hi=200)
    assert kept < total
    m = _m(table)
    for f in m["files"]:
        ks = [r.k for r in spark.read.parquet(f).select("k").collect()]
        assert ks == sorted(ks, reverse=True), f"{f} not descending"


def test_desc_refused_for_zorder(spark, table):
    """Z-order clustering has no per-column direction (the Morton
    interleave is symmetric) — direction keywords refuse rather than
    silently dropping."""
    table.commit(_df(spark, 0, 100))
    with pytest.raises(ValueError, match="no per-column direction"):
        sql_stmt(spark, "OPTIMIZE t ZORDER BY (k DESC)", {"t": table})
    with pytest.raises(ValueError, match="no per-column direction"):
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort', "
            "sort_order => 'zorder(k NULLS LAST)')",
            {"t": table},
        )


def test_desc_order_guards_still_name_based(spark, tmp_path):
    """Schema validation, duplicate detection, and the identity-
    partition guard all key on the SOURCE column name, not the spelled
    sort field."""
    t = SnapshotTable(spark, str(tmp_path / "p"))
    t.commit(_df(spark, 0, 100), partition_by=["g"])
    with pytest.raises(ValueError, match="not columns of the table"):
        t.set_write_order(sort_by=["nope DESC"])
    with pytest.raises(ValueError, match="duplicate"):
        t.set_write_order(sort_by=["k DESC", "k"])
    with pytest.raises(ValueError, match="identity partition fields"):
        t.set_write_order(sort_by=["g DESC"])


def test_statement_optimize_zorder(spark, table):
    table.commit(_df(spark, 0, 1000))
    before = sorted((r.k, r.g, r.v) for r in table.read().collect())
    out = sql_stmt(
        spark, "OPTIMIZE t ZORDER BY (k, g)", {"t": table}
    ).collect()
    assert out[0].operation == "optimize-zorder"
    m = _m(table)
    assert m["zorder_by"] == ["k", "g"]
    assert sorted((r.k, r.g, r.v) for r in table.read().collect()) == before
    # both z-ordered dimensions prune
    for col, lo, hi in (("k", 100, 200), ("g", 0, 1)):
        kept, total = table.pruned_file_count(col, lo=lo, hi=hi)
        assert kept < total, f"{col}: kept {kept}/{total}"


def test_call_rewrite_data_files_sort(spark, table):
    """``sort_order =>`` is TRANSIENT (Iceberg's contract, r15 — VERDICT
    r14 what's-wrong #2): it clusters THAT rewrite; the table's default
    write order changes only via ALTER TABLE … WRITE ORDERED BY."""
    table.commit(_df(spark, 0, 500))
    before = sorted((r.k, r.g, r.v) for r in table.read().collect())
    sql_stmt(
        spark,
        "CALL system.rewrite_data_files(table => 't', strategy => 'sort', "
        "sort_order => 'k')",
        {"t": table},
    )
    m = _m(table)
    # the rewrite happened and rows are identical …
    assert m["operation"] == "compact"
    assert sorted((r.k, r.g, r.v) for r in table.read().collect()) == before
    # … but the DEFAULT order is untouched (no set-write-order version,
    # no declared order) and no root claims to be clustered under a
    # default that doesn't exist
    assert m["sort_by"] == [] and m["zorder_by"] == []
    assert m["clustered_roots"] == []
    assert not any(
        mm["operation"] == "set-write-order"
        for mm in (table._load(n) for n in table._manifests())
    )
    # the files ARE physically clustered by the transient order
    import pyarrow.parquet as pq

    for f in m["files"]:
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        assert ks == sorted(ks), f"{f} not clustered by transient order"
    # Iceberg's zorder(...) sort_order spelling: same transient contract
    sql_stmt(
        spark,
        "CALL rewrite_data_files('t', 'sort', 'zorder(k, g)')",
        {"t": table},
    )
    m = _m(table)
    assert m["zorder_by"] == [] and m["sort_by"] == []
    assert table.read().count() == 500
    # no-arg call stays the binpack compaction (may no-op on big files)
    sql_stmt(spark, "CALL rewrite_data_files('t')", {"t": table})
    with pytest.raises(ValueError, match="binpack | sort"):
        sql_stmt(
            spark,
            "CALL rewrite_data_files('t', 'shuffle')",
            {"t": table},
        )


def test_call_rewrite_transient_order_keeps_declared_default(spark, table):
    """A transient sort_order DIFFERENT from the declared default
    rewrites under the transient order, leaves the default (and
    $sort_orders) untouched, and does NOT mark the result clustered —
    the resume marker means "clustered under the DEFAULT order" and a
    foreign-order root would be a stale mark (the ADVICE r14 #1 class)."""
    table.commit(_df(spark, 0, 500))
    table.set_write_order(sort_by=["k"])
    orders_before = [
        (r.order_id, r.sort_by, r.zorder_by, r.is_default)
        for r in table.sort_orders().collect()
    ]
    sql_stmt(
        spark,
        "CALL rewrite_data_files(table => 't', strategy => 'sort', "
        "sort_order => 'g')",
        {"t": table},
    )
    m = _m(table)
    assert m["sort_by"] == ["k"]  # declared default survives
    assert m["clustered_roots"] == []  # not clustered under the DEFAULT
    assert [
        (r.order_id, r.sort_by, r.zorder_by, r.is_default)
        for r in table.sort_orders().collect()
    ] == orders_before  # $sort_orders history unchanged
    # a follow-up default-order rewrite must NOT skip the g-ordered root
    sql_stmt(
        spark,
        "CALL rewrite_data_files(table => 't', strategy => 'sort', "
        "partial_progress => true)",
        {"t": table},
    )
    m = _m(table)
    assert m["clustered_roots"], "default-order rewrite re-clusters"
    import pyarrow.parquet as pq

    for f in m["files"]:
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        assert ks == sorted(ks), f"{f} not reclustered by the default"


def test_call_rewrite_sort_without_order_refused(spark, table):
    """strategy => 'sort' on a table with no write order and no
    sort_order argument is refused with the remedy named (Iceberg's
    sort strategy errors likewise) — without the guard the rewrite
    would silently run a full O(table) UNCLUSTERED pass, an expensive
    no-op (ADVICE r13 #1)."""
    table.commit(_df(spark, 0, 100))
    v = table.current_version()
    with pytest.raises(ValueError, match="no write order"):
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort')",
            {"t": table},
        )
    assert table.current_version() == v  # nothing rewritten
    # the named remedies unblock: explicit sort_order, or a declared
    # table write order
    sql_stmt(
        spark,
        "CALL rewrite_data_files(table => 't', strategy => 'sort', "
        "sort_order => 'k')",
        {"t": table},
    )
    # the transient order unblocked the rewrite without becoming the
    # table default (r15: Iceberg's sort_order contract)
    assert _m(table)["sort_by"] == []
    assert _m(table)["operation"] == "compact"
    table.set_write_order(zorder_by=["k", "g"])
    sql_stmt(
        spark,
        "CALL rewrite_data_files(table => 't', strategy => 'sort')",
        {"t": table},
    )
    assert _m(table)["zorder_by"] == ["k", "g"]
    assert table.read().count() == 100


def test_incremental_read_crosses_write_order_commits(spark, table):
    """read_incremental treats set-write-order like the other
    metadata-only commits (file list unchanged — skip, never refuse):
    appends on either side of an order change each surface once, tagged
    with their commit version, and the changelog delegate keeps its
    all-insert fast path."""
    table.commit(_df(spark, 0, 10))
    v1 = table.current_version()
    table.set_write_order(sort_by=["k"])
    table.commit(_df(spark, 10, 20))
    table.set_write_order()  # WRITE UNORDERED crosses too
    table.commit(_df(spark, 20, 30))
    inc = table.read_incremental(v1)
    rows = {(r.k, r.commit_version) for r in inc.collect()}
    assert {k for k, _ in rows} == set(range(10, 30))
    assert len({v for _, v in rows}) == 2  # two appends, two versions
    ch = table.read_changes(v1)
    assert {r.change_type for r in ch.collect()} == {"insert"}
    assert ch.count() == 20


def test_sort_orders_metadata_table(spark, table):
    """`t$sort_orders` serves the write-order history: first-appearance
    engine ids, kind, and the current default flagged — through both the
    method and the SQL metadata-table spelling."""
    table.commit(_df(spark, 0, 50))
    table.set_write_order(sort_by=["k"])
    table.set_write_order(zorder_by=["k", "g"])
    table.set_write_order(sort_by=["k"])  # re-activate: no new id
    rows = {r.order_id: r for r in table.sort_orders().collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].kind == "unsorted" and not rows[0].is_default
    assert rows[1].kind == "sort" and rows[1].sort_by == "k"
    assert rows[1].is_default  # re-activated order is the default again
    assert rows[2].kind == "zorder" and rows[2].zorder_by == "k,g"
    # SQL text: SELECT * FROM "t$sort_orders"
    out = sql_stmt(
        spark,
        'SELECT order_id, kind FROM "t$sort_orders" ORDER BY order_id',
        {"t": table},
    ).collect()
    assert [(r.order_id, r.kind) for r in out] == [
        (0, "unsorted"), (1, "sort"), (2, "zorder"),
    ]
    # historical view: at v1 only the unsorted order existed
    v1 = {r.order_id for r in table.sort_orders(version=1).collect()}
    assert v1 == {0}


def test_drop_clustered_column_refused(spark, table):
    table.commit(_df(spark, 0, 50))
    table.set_write_order(sort_by=["v"])
    with pytest.raises(ValueError, match="WRITE UNORDERED"):
        table.alter_drop_column("v")
    table.set_write_order()  # the named remedy unblocks
    assert table.alter_drop_column("v") == table.current_version()


def test_remove_orphan_files(spark, table, tmp_path):
    """CALL remove_orphan_files: unreferenced parquet (a failed commit's
    staged leftovers) is swept; every referenced file, every manifest,
    and time travel survive — the orphan half of maintenance without the
    retention half."""
    import os

    table.commit(_df(spark, 0, 100))
    table.commit(_df(spark, 100, 200))
    m = _m(table)
    live_before = list(m["files"])
    # fake a lost-race staged write: data landed, manifest never did
    stray_dir = os.path.join(table.data_dir, "deadbeefcafe")
    _df(spark, 900, 950).write.parquet(stray_dir)
    n_stray = sum(
        1 for f in os.listdir(stray_dir) if f.endswith(".parquet")
    )
    assert n_stray > 0
    out = sql_stmt(
        spark, "CALL remove_orphan_files(table => 't')", {"t": table}
    ).collect()
    # dedicated result schema: the count is files deleted, NOT a table
    # version (ADVICE r13 #2)
    assert out[0].deleted_files == n_stray
    assert "version" not in out[0].asDict()
    assert not os.path.isdir(stray_dir)  # dead staged dir swept
    m = _m(table)
    assert m["files"] == live_before  # manifests untouched
    assert all(os.path.exists(f) for f in live_before)
    assert table.read().count() == 200
    assert table.read(version=1).count() == 100  # time travel intact
    # idempotent: nothing left to sweep
    assert table.remove_orphan_files() == 0


def test_zorder_rewrite_migrates_mixed_specs(spark, table):
    """OPTIMIZE ZORDER over a spec-evolved table: the full clustered
    rewrite lands every row under the current default spec (the same
    migration contract as plain OPTIMIZE), row-identical, with the
    z-order recorded — one statement serves both the layout migration
    and the reclustering."""
    table.commit(_df(spark, 0, 300))
    table.evolve_partition_spec(["g"])
    table.commit(_df(spark, 300, 600))
    before = sorted((r.k, r.g, r.v) for r in table.read().collect())
    m = _m(table)
    assert table._mixed_specs(m)
    sql_stmt(spark, "OPTIMIZE t ZORDER BY (k)", {"t": table})
    m = _m(table)
    assert not table._mixed_specs(m)
    assert m["zorder_by"] == ["k"]
    assert sorted((r.k, r.g, r.v) for r in table.read().collect()) == before


def test_rename_sort_column_refused(spark, table):
    table.commit(_df(spark, 0, 50))
    table.set_write_order(sort_by=["k"])
    with pytest.raises(ValueError, match="layout column"):
        table.alter_rename_column("k", "kk")


def test_nested_type_write_order_refused(spark, tmp_path):
    """Iceberg sort sources are primitives; parquet keeps no min/max for
    nested types, so an order on one could never prune — refused loudly
    instead of accepted uselessly."""
    t = SnapshotTable(spark, str(tmp_path / "n"))
    t.commit(
        spark.range(0, 10).select(
            F.col("id").alias("k"),
            F.array(F.lit(1.0), F.lit(2.0)).alias("emb"),
        )
    )
    with pytest.raises(ValueError, match="primitive"):
        t.set_write_order(sort_by=["emb"])
    t.set_write_order(sort_by=["k"])  # primitive: fine


def test_conjunctive_prune_on_zordered_table(spark, table):
    """read_where_all: a 2-D probe over z-ordered columns prunes to a
    strictly smaller file set than either single-column probe (the
    z-order payoff — narrow per-file ranges in EVERY listed dimension),
    and the result equals the plain filtered read exactly."""
    table.commit(_df(spark, 0, 4000).repartition(8))
    sql_stmt(spark, "OPTIMIZE t ZORDER BY (k, g)", {"t": table})
    probes = [("k", 500, 1500), ("g", 2, 3)]
    both, total = table.pruned_file_count_all(probes)
    k_only, _ = table.pruned_file_count("k", lo=500, hi=1500)
    g_only, _ = table.pruned_file_count("g", lo=2, hi=3)
    assert both < total
    assert both <= min(k_only, g_only)
    got = sorted(
        (r.k, r.g, r.v) for r in table.read_where_all(probes).collect()
    )
    want = sorted(
        (r.k, r.g, r.v)
        for r in table.read()
        .filter("k >= 500 AND k <= 1500 AND g >= 2 AND g <= 3")
        .collect()
    )
    assert got == want and got  # non-empty, exactly the filtered read


def test_conjunctive_prune_missing_stats_and_mor(spark, table):
    """read_where_all fringe rules: a probe on a stats-less column keeps
    its files (unknown => must read) while the other probe still prunes;
    pending MoR deltas apply before the residual conjunction — results
    equal the plain filtered read in both states."""
    table.commit(_df(spark, 0, 1000), sort_by=["k"])  # stats on k only
    probes = [("k", 100, 200), ("g", 2, 3)]

    def want():
        return sorted(
            r.k
            for r in table.read()
            .filter("k >= 100 AND k <= 200 AND g >= 2 AND g <= 3")
            .collect()
        )

    got = sorted(r.k for r in table.read_where_all(probes).collect())
    assert got == want() and got
    kept, total = table.pruned_file_count_all(probes)
    assert kept < total  # k still prunes despite g lacking stats
    table.delete_where_positional("k = 150")
    got = sorted(r.k for r in table.read_where_all(probes).collect())
    assert 150 not in got and got == want()


def _dated(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            F.expr("date_add(DATE '2024-01-01', CAST(id % 40 AS INT))")
            .alias("d"),
            (F.col("id") % 7).alias("s"),
        )
        .repartition(4)
    )


def test_transform_sort_fields_end_to_end(spark, table):
    """r14: Iceberg sort-order fields carry a TRANSFORM — WRITE ORDERED
    BY (days(d), k) clusters by the derived day value then k, records
    stats on the SOURCE columns (a day-clustered file keeps its d range
    narrow, so read_where on d prunes), and canonicalizes through the
    same grammar as partition specs."""
    table.commit(_dated(spark, 0, 2000))
    out = sql_stmt(
        spark,
        "ALTER TABLE t WRITE ORDERED BY (days(d) DESC, k)",
        {"t": table},
    ).collect()
    assert out[0].operation == "set-write-order"
    m = _m(table)
    assert m["sort_by"] == ["days(d) DESC", "k"]
    assert {"d", "k"} <= set(m["stats_cols"])  # SOURCE columns
    before = sorted(r.k for r in table.read().collect())
    table.rewrite_clustered()
    assert sorted(r.k for r in table.read().collect()) == before
    # footer stats store dates as ISO text (ordered like the values),
    # so the probe uses the same textual form
    kept, total = table.pruned_file_count(
        "d", lo="2024-01-05", hi="2024-01-08"
    )
    assert kept < total, (kept, total)


def test_transform_sort_field_guards(spark, table):
    table.commit(_dated(spark, 0, 100))
    # eager source-type validation: days() needs a date/timestamp
    with pytest.raises(ValueError, match="date/timestamp"):
        table.set_write_order(sort_by=["days(s)"])
    # duplicate SOURCES refuse (days(d), d sorts identically to d)
    with pytest.raises(ValueError, match="duplicate"):
        table.set_write_order(sort_by=["days(d)", "d"])
    # a transform whose source is an identity partition field is as
    # degenerate as the identity itself
    t2 = SnapshotTable(spark, str(table.path) + "_p")
    t2.commit(_dated(spark, 0, 100), partition_by=["d"])
    with pytest.raises(ValueError, match="identity partition fields"):
        t2.set_write_order(sort_by=["days(d)"])
    # z-order has no transform fields
    with pytest.raises(ValueError, match="bad ZORDER BY item"):
        sql_stmt(spark, "OPTIMIZE t ZORDER BY (days(d))", {"t": table})


def test_commit_explicit_order_change_resets_marks(spark, table):
    """ADVICE r14 #1: an APPEND whose explicit sort_by/zorder_by differs
    from the parent's effective order must reset the parent's
    clustered_roots — those roots were clustered under an order the new
    manifest no longer declares, and a stale mark would make
    partial-progress rewrites permanently skip them under the new
    order. Same rule set_write_order already applies."""
    table.commit(_df(spark, 0, 300), sort_by=["k"])
    m = _m(table)
    assert len(m["clustered_roots"]) == 1
    old_root = m["clustered_roots"][0]
    # same-order append keeps the mark and adds its own
    table.commit(_df(spark, 300, 600), sort_by=["k"])
    m = _m(table)
    assert old_root in m["clustered_roots"]
    assert len(m["clustered_roots"]) == 2
    # DIFFERENT explicit order: parent marks reset; only the new root
    # (born clustered under the NEW order) is marked
    table.commit(_df(spark, 600, 900), sort_by=["v"])
    m = _m(table)
    assert m["sort_by"] == ["v"]
    assert old_root not in m["clustered_roots"]
    assert len(m["clustered_roots"]) == 1
    # so a partial-progress rewrite re-clusters the k-ordered history
    # instead of skipping it as "done"
    table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    import pyarrow.parquet as pq

    for f in _m(table)["files"]:
        vs = pq.read_table(f, columns=["v"]).column("v").to_pylist()
        assert vs == sorted(vs), f"{f} not reclustered under v"


def test_commit_explicit_order_canonicalized(spark, table):
    """ADVICE r14 #2: commit() canonicalizes an explicit sort_by exactly
    like set_write_order ('k desc nulls last' → 'k DESC'), so a later
    set_write_order of the semantically identical order is the
    idempotent no-op, not a spurious version that resets
    clustered_roots."""
    table.commit(_df(spark, 0, 300), sort_by=["k desc nulls last"])
    m = _m(table)
    assert m["sort_by"] == ["k DESC"]  # canonical spelling stored
    v = table.current_version()
    marks = m["clustered_roots"]
    assert marks
    # semantically identical order: no-op, same version, marks intact
    assert table.set_write_order(sort_by=["k DESC"]) == v
    assert table.set_write_order(sort_by=["k desc NULLS LAST"]) == v
    assert _m(table)["clustered_roots"] == marks
