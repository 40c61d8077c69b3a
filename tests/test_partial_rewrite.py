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

    import philotes_spark.sources.snapshots as snap_mod

    real = snap_mod._partitioned_writer
    calls = {"n": 0}

    def failing(df, part_cols):
        calls["n"] += 1
        if calls["n"] == 2:  # the SECOND group's write dies
            raise RuntimeError("simulated executor loss mid-rewrite")
        return real(df, part_cols)

    monkeypatch.setattr(snap_mod, "_partitioned_writer", failing)
    with pytest.raises(RuntimeError, match="simulated"):
        table.rewrite_clustered(partial_progress=True, file_group_bytes=1)
    monkeypatch.setattr(snap_mod, "_partitioned_writer", real)

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
    from philotes_spark.sql_frontend import _parse_where_scope
    from philotes_spark.sql_frontend import sql as sql_stmt

    assert _parse_where_scope("k >= 5 AND k <= 10") == [[("k", 5, 10)]]
    assert _parse_where_scope("k BETWEEN 5 AND 10") == [[("k", 5, 10)]]
    assert _parse_where_scope("g = 3 AND k > 1.5") == [
        [("g", 3, 3), ("k", 1.5, None)],
    ]
    import datetime as dt

    assert _parse_where_scope("d >= DATE '2024-01-02'") == [
        [("d", dt.date(2024, 1, 2), None)]
    ]
    # r15 (VERDICT r14 what's-missing #4): IN and OR-of-ranges parse as
    # a union of probe sets
    assert _parse_where_scope("k = 1 OR k = 2") == [
        [("k", 1, 1)], [("k", 2, 2)],
    ]
    assert _parse_where_scope("k IN (1, 2, 3)") == [
        [("k", 1, 1)], [("k", 2, 2)], [("k", 3, 3)],
    ]
    assert _parse_where_scope(
        "(k BETWEEN 0 AND 9) OR (k >= 100 AND k <= 200)"
    ) == [[("k", 0, 9)], [("k", 100, 200)]]
    assert _parse_where_scope("g IN (1, 2) AND k >= 10") == [
        [("g", 1, 1), ("k", 10, None)],
        [("g", 2, 2), ("k", 10, None)],
    ]
    # tokenize-first splitting (VERDICT r14 what's-wrong #4): a string
    # literal containing ' AND '/' OR ' never splits the filter
    assert _parse_where_scope("s = 'rock AND roll'") == [
        [("s", "rock AND roll", "rock AND roll")]
    ]
    assert _parse_where_scope("s IN ('a OR b', 'c')") == [
        [("s", "a OR b", "a OR b")], [("s", "c", "c")],
    ]
    # still correct-by-refusal for everything else
    with pytest.raises(ValueError, match="unsupported conjunct"):
        _parse_where_scope("abs(k) > 1")
    with pytest.raises(ValueError, match="unsupported conjunct"):
        _parse_where_scope("k != 5")
    with pytest.raises(ValueError, match="exceeds 256"):
        _parse_where_scope(
            "k IN (" + ",".join(map(str, range(20))) + ") AND "
            "g IN (" + ",".join(map(str, range(20))) + ")"
        )
    with pytest.raises(ValueError, match="empty IN list"):
        _parse_where_scope("k IN ()")

    table.commit(_df(spark, 0, 100))
    with pytest.raises(ValueError, match="partial_progress"):
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort', "
            "sort_order => 'k', where => 'k <= 10')",
            {"t": table},
        )


def test_where_scope_union_selects_both_ranges(spark, table):
    """r15 scope-union pin (VERDICT r14 next-round #6 'Done' shape): an
    OR-of-ranges scope rewrites the files of BOTH ranges, leaves the
    provably-disjoint middle alone, and stays row-identical."""
    table.commit(_df(spark, 0, 300), stats_cols=["k"])
    table.commit(_df(spark, 300, 600), stats_cols=["k"])
    table.commit(_df(spark, 600, 900), stats_cols=["k"])
    table.set_write_order(sort_by=["k"])
    before = _rows(table)
    m0 = _m(table)

    def root_files(lo, hi):
        return {
            f
            for f in m0["files"]
            if any(
                lo <= r.k <= hi
                for r in spark.read.parquet(f).select("k").collect()
            )
        }

    middle = {
        f for f in m0["files"]
        if min(
            r.k for r in spark.read.parquet(f).select("k").collect()
        ) >= 300
        and max(
            r.k for r in spark.read.parquet(f).select("k").collect()
        ) <= 599
    }
    sql_stmt(
        spark,
        "CALL rewrite_data_files(table => 't', strategy => 'sort', "
        "partial_progress => true, "
        "where => 'k <= 299 OR k BETWEEN 600 AND 899')",
        {"t": table},
    )
    m = _m(table)
    after = set(m["files"])
    # the middle commit's files were provably disjoint from BOTH
    # disjuncts: untouched
    assert middle and middle <= after
    # both scoped ranges were rewritten (their old files are gone)
    assert not (root_files(0, 299) - middle) & after
    assert not (root_files(600, 899) - middle) & after
    assert _rows(table) == before
    # IN-scope spelling drives the same union path end to end
    table2_rows = _rows(table)
    sql_stmt(
        spark,
        "CALL rewrite_data_files(table => 't', strategy => 'sort', "
        "partial_progress => true, where => 'g IN (0, 6)')",
        {"t": table},
    )
    assert _rows(table) == table2_rows


def test_shared_boundaries_align_file_hulls_across_groups(
    spark, table, monkeypatch
):
    """r15 (VERDICT r14 what's-missing #3): a multi-group partial
    rewrite samples global range boundaries ONCE (one sampling pass,
    not one repartitionByRange sampler job per group) and
    range-partitions every group on the shared bucket id, so every
    file boundary lands on a global bucket edge: each file's hull fits
    between two adjacent-or-equal shared cut points of its bucket run,
    cross-group overlap is bucket-aligned, and each file stays narrow."""
    captured = {"n": 0, "bounds": None}
    real = SnapshotTable._global_sort_boundaries

    def capture(self, m, pending, sort_by):
        captured["n"] += 1
        captured["bounds"] = real(self, m, pending, sort_by)
        return captured["bounds"]

    monkeypatch.setattr(
        SnapshotTable, "_global_sort_boundaries", capture
    )
    for lo in (0, 3000, 6000):
        table.commit(_df(spark, lo, lo + 3000, nparts=3))
    table.set_write_order(sort_by=["k"])
    # ~64 KiB groups → 3 groups of ~3 files on these fixtures
    table.rewrite_clustered(partial_progress=True,
                            file_group_bytes=64 * 1024)
    assert captured["n"] == 1, "boundaries sampled exactly once"
    bounds = captured["bounds"]
    assert bounds, "numeric leading key must yield global boundaries"
    m = _m(table)
    roots = {
        os.path.relpath(f, table.data_dir).split(os.sep)[0]
        for f in m["files"]
    }
    assert len(roots) > 1, "needs ≥2 group commits to mean anything"

    def bucket(v):
        return sum(1 for b in bounds if b <= v)

    per_root: dict = {}
    for f in m["files"]:
        lo_s, hi_s = m["file_stats"][f]["k"]
        rel = os.path.relpath(f, table.data_dir).split(os.sep)[0]
        per_root.setdefault(rel, []).append(
            (bucket(float(lo_s)), bucket(float(hi_s)))
        )
    for rel, spans in per_root.items():
        spans.sort()
        # bucket-granular cuts: within a group, no two files share a
        # bucket (the sampler can only cut between distinct bucket ids)
        for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
            assert b1 < a2, (rel, spans)
    # row identity, as always
    assert _rows(table) == sorted(
        (k, k % 7, k * 2) for k in range(9000)
    )


def test_partial_rewrite_pruning_within_factor_of_one_commit(spark, tmp_path):
    """The VERDICT r14 next-round #5 'Done' shape: on the same data, a
    range probe after a 3-group partial rewrite keeps within a small
    factor (≤ the group count) of what the one-commit mode keeps — the
    per-group width trade is bounded, not degenerate."""
    t1 = SnapshotTable(spark, str(tmp_path / "one"))
    t2 = SnapshotTable(spark, str(tmp_path / "part"))
    for t in (t1, t2):
        for lo in (0, 3000, 6000):
            t.commit(_df(spark, lo, lo + 3000, nparts=3))
        t.set_write_order(sort_by=["k"])
    t1.rewrite_clustered()  # one commit: the global optimum
    t2.rewrite_clustered(partial_progress=True,
                         file_group_bytes=64 * 1024)
    groups = len({
        os.path.relpath(f, t2.data_dir).split(os.sep)[0]
        for f in _m(t2)["files"]
    })
    assert groups > 1
    kept1, total1 = t1.pruned_file_count("k", lo=4000, hi=4999)
    kept2, total2 = t2.pruned_file_count("k", lo=4000, hi=4999)
    assert kept1 < total1 and kept2 < total2  # both prune
    # bounded degradation: ≤ one file per group where one-commit keeps
    # one file per probe-covered slice
    assert kept2 <= max(kept1, 1) * groups, (kept1, kept2, groups)
    assert sorted(_rows(t1)) == sorted(_rows(t2))


def test_tighten_converges_pruning_to_one_commit(spark, tmp_path):
    """r15 (VERDICT r14 what's-missing #3, the 'final tighten pass'
    alternative): after a multi-group partial rewrite, tighten merges
    the cross-group overlapping runs — file-skipping then matches the
    one-commit mode's (same data, compared directly), at the cost of
    rewriting only the overlapped regions."""
    t1 = SnapshotTable(spark, str(tmp_path / "one"))
    t2 = SnapshotTable(spark, str(tmp_path / "part"))
    for t in (t1, t2):
        # each commit INTERLEAVES over the whole key domain (k % 3), so
        # any per-group rewrite leaves genuine cross-group overlap
        for third in range(3):
            t.commit(
                _df(spark, 0, 9000, nparts=3).filter(
                    F.col("k") % 3 == third
                )
            )
        t.set_write_order(sort_by=["k"])
    t1.rewrite_clustered()  # the global optimum
    t2.rewrite_clustered(partial_progress=True,
                         file_group_bytes=64 * 1024)
    before = _rows(t2)
    v_mid = t2.current_version()
    groups = len({
        os.path.relpath(f, t2.data_dir).split(os.sep)[0]
        for f in _m(t2)["files"]
    })
    assert groups > 1, "needs ≥2 group commits to mean anything"
    t2.tighten_clustered(file_group_bytes=1 << 30)
    assert t2.current_version() > v_mid, "overlap existed, so it merged"
    assert _rows(t2) == before
    # every intermediate tighten commit is row-identical too
    for vi in range(v_mid + 1, t2.current_version() + 1):
        assert _m(t2, vi)["operation"] == "rewrite-group"
        assert _rows(t2, version=vi) == before
    # pruning parity with the one-commit mode on narrow AND wide probes
    # — compared as the SCANNED FRACTION (the two modes land different
    # file counts, so raw counts aren't commensurable)
    for lo, hi in ((4000, 4200), (1000, 7000), (8900, 8999)):
        kept1, total1 = t1.pruned_file_count("k", lo=lo, hi=hi)
        kept2, total2 = t2.pruned_file_count("k", lo=lo, hi=hi)
        assert kept2 / total2 <= kept1 / total1 + 0.15, (
            lo, hi, kept1, total1, kept2, total2,
        )
    # converged: value-disjoint files ⇒ a second tighten no-ops
    v = t2.current_version()
    assert t2.tighten_clustered() == v


def test_tighten_statement_and_refusals(spark, table):
    table.commit(_df(spark, 0, 600), stats_cols=["k"])
    table.commit(_df(spark, 0, 600), stats_cols=["k"])  # dup rows: overlap
    with pytest.raises(ValueError, match="declared sort write order"):
        table.tighten_clustered()
    sql_stmt(spark, "ALTER TABLE t WRITE ORDERED BY k", {"t": table})
    with pytest.raises(ValueError, match="strategy => 'sort'"):
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', tighten => true)",
            {"t": table},
        )
    with pytest.raises(ValueError, match="do not apply"):
        sql_stmt(
            spark,
            "CALL rewrite_data_files(table => 't', strategy => 'sort', "
            "tighten => true, where => 'k <= 10')",
            {"t": table},
        )
    before = sorted(
        (r.k, r.g, r.v) for r in table.read().collect()
    )
    out = sql_stmt(
        spark,
        "CALL rewrite_data_files(table => 't', strategy => 'sort', "
        "tighten => true)",
        {"t": table},
    ).collect()
    assert out[0].version == table.current_version()
    assert sorted(
        (r.k, r.g, r.v) for r in table.read().collect()
    ) == before
    # the two fully-overlapping commits merged into disjoint files
    m = _m(table)
    hulls = sorted(
        tuple(map(int, m["file_stats"][f]["k"])) for f in m["files"]
    )
    for (l1, h1), (l2, h2) in zip(hulls, hulls[1:]):
        assert h1 < l2, hulls

def test_paced_rewrite_gets_shared_global_boundaries(spark, table, monkeypatch):
    """ADVICE r15 #3: the shared-boundary gate must look at the
    PRE-truncation group count. The documented pacing mode
    (max_groups=1 per call) rewrites one group per call while the
    pending work spans several — gating on the post-truncation count
    silently denied paced calls the bucket-aligned hulls the feature
    exists for (each group sampled its own cuts, so cross-group overlap
    was arbitrary instead of bucket-aligned)."""
    table.commit(_df(spark, 0, 400))
    table.commit(_df(spark, 400, 800))
    table.commit(_df(spark, 800, 1200))
    table.set_write_order(sort_by=["k"])  # three roots now pending

    calls = []
    orig = SnapshotTable._global_sort_boundaries

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(SnapshotTable, "_global_sort_boundaries", spy)
    before = _rows(table)
    table.rewrite_clustered(
        partial_progress=True, file_group_bytes=1, max_groups=1
    )
    # pending spanned >1 group, so even the single-group paced call
    # samples the shared global cuts (pre-fix: calls == [])
    assert calls, "paced call must sample shared boundaries"
    assert _rows(table) == before
