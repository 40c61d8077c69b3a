"""Partial-progress clustered rewrite — VERDICT r13 #2.

``rewrite_clustered(partial_progress=True)`` is Iceberg's
``rewrite_data_files`` with ``partial-progress.enabled``: the
not-yet-clustered files split into bounded file groups and EACH group
rewrites in its own ``rewrite-group`` commit, so a 100 TB recluster is
many durable commits instead of one monolithic transaction (the
reference's catalog surface is append-per-batch for the same reason,
internal/iceberg/catalog/rest.go:186-217). These tests pin the
contract VERDICT asked for: every intermediate version is a valid
row-identical table, a mid-rewrite crash loses at most one uncommitted
group and a re-run RESUMES (committed groups — tracked in the
manifest's ``clustered_roots`` marker — are never re-clustered), and
the refusal set (no order / pending MoR deltas / pending schema
journal) names its remedy.
"""

import os

import pytest
from pyspark.sql import functions as F

from philotes_spark.sources.snapshots import SnapshotTable
from philotes_spark.sql_frontend import sql as sql_stmt


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "t"))


def _df(spark, lo, hi, nparts=3):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            (F.col("id") * 2).alias("v"),
        )
        .repartition(nparts)
    )


def _m(table, version=None):
    v = version if version is not None else table.current_version()
    return table._load(f"v{v:08d}.json")


def _rows(table, version=None):
    return sorted(
        (r.k, r.g, r.v) for r in table.read(version=version).collect()
    )


def test_every_intermediate_version_row_identical(spark, table):
    """The core VERDICT ask: interleaved appends reclustered group by
    group, with EVERY intermediate version a valid table whose rows
    equal the unclustered original."""
    table.commit(_df(spark, 0, 400))
    table.commit(_df(spark, 400, 800))
    table.commit(_df(spark, 800, 1200))
    table.set_write_order(sort_by=["k"])
    v0 = table.current_version()
    before = _rows(table)

    v = table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    assert v == table.current_version()
    assert v > v0 + 1, "tiny group size must force MULTIPLE commits"
    for vi in range(v0 + 1, v + 1):
        m = _m(table, vi)
        assert m["operation"] == "rewrite-group"
        assert m["added_rows"] == 0
        assert _rows(table, version=vi) == before, f"v{vi} diverged"
    # the finished recluster prunes history under the order
    kept, total = table.pruned_file_count("k", lo=100, hi=200)
    assert kept < total
    # everything clustered: live roots ⊆ marks, so another call no-ops
    m = _m(table)
    live = {
        os.path.relpath(f, table.data_dir).split(os.sep)[0]
        for f in m["files"]
    }
    assert live <= set(m["clustered_roots"])
    assert table.rewrite_clustered(partial_progress=True) == v


def test_max_groups_paces_then_resumes(spark, table):
    table.commit(_df(spark, 0, 500))
    table.commit(_df(spark, 500, 1000))
    table.set_write_order(sort_by=["k"])
    before = _rows(table)
    v0 = table.current_version()

    v1 = table.rewrite_clustered(
        partial_progress=True, file_group_bytes=1, max_groups=1
    )
    assert v1 == v0 + 1, "max_groups=1 is exactly one commit"
    assert _rows(table) == before
    m = _m(table)
    done_root = set(m["clustered_roots"])
    assert done_root, "the paced call marks its group's root"
    done_files = {
        f
        for f in m["files"]
        if os.path.relpath(f, table.data_dir).split(os.sep)[0] in done_root
    }

    # operator-driven pacing: call again until the table is clustered
    for _ in range(100):
        v2 = table.rewrite_clustered(
            partial_progress=True, file_group_bytes=1, max_groups=1
        )
        if v2 == table.current_version() and not [
            f
            for f in _m(table)["files"]
            if os.path.relpath(f, table.data_dir).split(os.sep)[0]
            not in set(_m(table)["clustered_roots"])
        ]:
            break
    assert _rows(table) == before
    # resume never re-clusters finished work: the first group's output
    # files are still live, untouched
    assert done_files <= set(_m(table)["files"])


def test_mid_rewrite_crash_resumes(spark, table, monkeypatch):
    """A crash BETWEEN group commits loses at most the uncommitted
    group: the current version is the last committed group (valid,
    row-identical) and a plain re-run finishes from the marker."""
    table.commit(_df(spark, 0, 400))
    table.commit(_df(spark, 400, 800))
    table.commit(_df(spark, 800, 1200))
    table.set_write_order(sort_by=["k"])
    before = _rows(table)

    real = SnapshotTable._recluster
    calls = {"n": 0}

    def failing(self, df, m, nparts=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated executor loss mid-rewrite")
        return real(self, df, m, nparts=nparts)

    monkeypatch.setattr(SnapshotTable, "_recluster", failing)
    with pytest.raises(RuntimeError, match="simulated"):
        table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    monkeypatch.setattr(SnapshotTable, "_recluster", real)

    # the crashed run left a valid table: group 1 committed, rest intact
    v_crash = table.current_version()
    assert _m(table, v_crash)["operation"] == "rewrite-group"
    assert _rows(table) == before
    committed = set(_m(table)["clustered_roots"])
    assert committed
    committed_files = {
        f
        for f in _m(table)["files"]
        if os.path.relpath(f, table.data_dir).split(os.sep)[0] in committed
    }

    # resume: finishes the job without re-clustering the committed group
    v = table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    assert v > v_crash
    assert _rows(table) == before
    assert committed_files <= set(_m(table)["files"])
    kept, total = table.pruned_file_count("k", lo=100, hi=200)
    assert kept < total


def test_partial_rewrite_refusals(spark, table):
    table.commit(_df(spark, 0, 200))
    with pytest.raises(ValueError, match="needs a write order"):
        table.rewrite_clustered(partial_progress=True)
    table.set_write_order(sort_by=["k"])
    # pending MoR deltas: a group rewrite relocates rows and would
    # orphan positional (path, index) references — the r13 compact()
    # bug class, refused with the remedy named
    table.delete_where("k < 10", key_cols=["k"], mode="mor")
    assert _m(table)["deltas"]
    with pytest.raises(ValueError, match="compact_deltas first"):
        table.rewrite_clustered(partial_progress=True)
    table.compact_deltas()
    table.alter_rename_column("v", "val")
    with pytest.raises(ValueError, match="materialize_schema first"):
        table.rewrite_clustered(partial_progress=True)
    table.materialize_schema()
    v = table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    assert v == table.current_version()
    assert table.read().count() == 190


def test_order_change_resets_marks(spark, table):
    """``clustered_roots`` claims are only true under the order they
    were written for: changing the order resets them, and the next
    partial rewrite re-clusters everything."""
    table.commit(_df(spark, 0, 400))
    table.set_write_order(sort_by=["k"])
    table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    assert _m(table)["clustered_roots"]
    # appends under the standing order are born clustered — marked
    table.commit(_df(spark, 400, 800))
    m = _m(table)
    live = {
        os.path.relpath(f, table.data_dir).split(os.sep)[0]
        for f in m["files"]
    }
    assert live <= set(m["clustered_roots"])
    v = table.current_version()
    assert table.rewrite_clustered(partial_progress=True) == v  # no-op

    table.set_write_order(zorder_by=["k", "g"])
    assert _m(table)["clustered_roots"] == []
    # default group size: every file fits one group, whose rewrite
    # range-splits into as many files as it consumed (nparts=len(group))
    # — so BOTH z-ordered dimensions get narrow per-file hulls back
    v2 = table.rewrite_clustered(partial_progress=True)
    assert v2 == table.current_version()
    assert table.read().count() == 800
    for col, lo, hi in (("k", 50, 120), ("g", 0, 1)):
        kept, total = table.pruned_file_count(col, lo=lo, hi=hi)
        assert kept < total, f"{col}: kept {kept}/{total}"


def test_partitioned_table_partial_rewrite(spark, table):
    table.commit(_df(spark, 0, 600), partition_by=["g"])
    table.set_write_order(sort_by=["k"])
    table.commit(_df(spark, 600, 1200))
    before = _rows(table)
    v = table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    assert v == table.current_version()
    assert _rows(table) == before
    # rewritten files still land under the hive layout
    m = _m(table)
    assert m["partition_by"] == ["g"]
    assert all(f"g=" in f for f in m["files"])


def test_read_incremental_crosses_rewrite_group(spark, table):
    v1 = table.commit(_df(spark, 0, 300))
    table.set_write_order(sort_by=["k"])
    table.commit(_df(spark, 300, 600))
    table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    inc = table.read_incremental(v1)
    # rewrite-group commits are row-preserving: the increment is the
    # second append's rows only, none double-counted
    assert inc.count() == 300
    assert sorted(r.k for r in inc.select("k").collect()) == list(
        range(300, 600)
    )


def test_call_statement_partial_progress(spark, table):
    table.commit(_df(spark, 0, 400))
    table.commit(_df(spark, 400, 800))
    # r15: a TRANSIENT sort_order can't resume across paced calls
    # (clustered_roots tracks the declared order only) — max_groups
    # with it would redo group 1 forever, so it refuses with the
    # remedy named
    with pytest.raises(ValueError, match="declare the order"):
        sql_stmt(
            spark,
            "CALL system.rewrite_data_files(table => 't', "
            "strategy => 'sort', sort_order => 'k', "
            "partial_progress => true, "
            "max_file_group_size_bytes => 1, max_groups => 1)",
            {"t": table},
        )
    sql_stmt(spark, "ALTER TABLE t WRITE ORDERED BY k", {"t": table})
    out = sql_stmt(
        spark,
        "CALL system.rewrite_data_files(table => 't', strategy => 'sort', "
        "partial_progress => true, "
        "max_file_group_size_bytes => 1, max_groups => 1)",
        {"t": table},
    ).collect()
    m = _m(table)
    assert m["operation"] == "rewrite-group"
    assert out[0].version == table.current_version()
    # binpack is already incremental per partition — partial_progress
    # on it is a spelling error, refused
    with pytest.raises(ValueError, match="strategy => 'sort'"):
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', "
            "partial_progress => true)",
            {"t": table},
        )


def test_where_scopes_partial_rewrite(spark, table):
    """r14: ``where`` (Iceberg rewrite_data_files' scope filter)
    restricts the group-wise rewrite to the files the filter may touch
    — the targeted-recluster lever: cost follows selectivity, not
    table size. File-granular and conservative: stats-pruned-out files
    are untouched, stats-less files rewrite (unknown may match)."""
    from philotes_spark.sql_frontend import sql as sql_stmt

    table.commit(_df(spark, 0, 400), stats_cols=["k"])
    table.commit(_df(spark, 400, 800), stats_cols=["k"])
    table.commit(_df(spark, 800, 1200), stats_cols=["k"])
    table.set_write_order(sort_by=["k"])
    before = _rows(table)
    untouched = {
        f for f in _m(table)["files"]
        if not (0 <= min(r.k for r in spark.read.parquet(f).collect()) < 400)
    }

    sql_stmt(
        spark,
        "CALL rewrite_data_files(table => 't', strategy => 'sort', "
        "partial_progress => true, where => 'k <= 399')",
        {"t": table},
    )
    m = _m(table)
    assert m["operation"] == "rewrite-group"
    assert _rows(table) == before
    # out-of-scope files carried by reference, byte-identical paths
    assert untouched <= set(m["files"])
    # exactly one root (the k<=399 group) is clustered; the rest pend
    pending = [
        f for f in m["files"]
        if os.path.relpath(f, table.data_dir).split(os.sep)[0]
        not in set(m["clustered_roots"])
    ]
    assert set(m["clustered_roots"]) and pending
    # an unscoped partial pass finishes the remainder
    table.rewrite_clustered(partial_progress=True)
    assert _rows(table) == before


def test_where_statless_files_stay_in_scope(spark, table):
    """A commit with NO column stats cannot be proven disjoint from the
    filter, so its files rewrite — over-inclusion is allowed, a missed
    file is not."""
    table.commit(_df(spark, 0, 100))  # no stats
    table.set_write_order(sort_by=["k"])
    files_before = set(_m(table)["files"])
    v = table.rewrite_clustered(
        partial_progress=True, probes=[("k", 5000, 9000)]
    )
    assert v == table.current_version()
    assert _m(table)["operation"] == "rewrite-group"
    assert not (files_before & set(_m(table)["files"]))


def test_where_parse_and_refusals(spark, table):
    from philotes_spark.sql_frontend import _parse_where_probes
    from philotes_spark.sql_frontend import sql as sql_stmt

    assert _parse_where_probes("k >= 5 AND k <= 10") == [("k", 5, 10)]
    assert _parse_where_probes("k BETWEEN 5 AND 10") == [("k", 5, 10)]
    assert _parse_where_probes("g = 3 AND k > 1.5") == [
        ("g", 3, 3), ("k", 1.5, None),
    ]
    import datetime as dt

    assert _parse_where_probes("d >= DATE '2024-01-02'") == [
        ("d", dt.date(2024, 1, 2), None)
    ]
    with pytest.raises(ValueError, match="unsupported conjunct"):
        _parse_where_probes("k = 1 OR k = 2")
    with pytest.raises(ValueError, match="unsupported conjunct"):
        _parse_where_probes("abs(k) > 1")

    table.commit(_df(spark, 0, 100))
    with pytest.raises(ValueError, match="partial_progress"):
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort', "
            "sort_order => 'k', where => 'k <= 10')",
            {"t": table},
        )
