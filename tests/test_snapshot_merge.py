"""Copy-on-write MERGE into SnapshotTable (A17 extension): upsert/delete
semantics, time travel across merges, and file-level pruning via the
manifest's footer min/max stats (Iceberg-style file skipping)."""

import pytest
from pyspark.sql import functions as F

from philotes_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "t"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_merge_upsert_and_insert(spark, table):
    table.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.merge(_df(spark, [(2, "B2"), (9, "new")]), key_cols=["k"])
    got = {r.k: r.v for r in table.read().collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}
    # time travel: v1 unchanged
    v1 = {r.k: r.v for r in table.read(version=1).collect()}
    assert v1 == {1: "a", 2: "b", 3: "c"}
    assert table._resolve()["operation"] == "merge"


def test_merge_with_deletes(spark, table):
    table.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    changes = spark.createDataFrame(
        [(2, "B2", False), (3, None, True)], "k long, v string, _del boolean"
    )
    table.merge(changes, key_cols=["k"], delete_col="_del")
    got = {r.k: r.v for r in table.read().collect()}
    assert got == {1: "a", 2: "B2"}  # 3 deleted, not re-inserted


def test_merge_prunes_untouched_files(spark, table):
    # two disjoint key-range files, stats recorded from the footers
    lo = _df(spark, [(i, f"lo{i}") for i in range(0, 100)]).coalesce(1)
    hi = _df(spark, [(i, f"hi{i}") for i in range(1000, 1100)]).coalesce(1)
    table.commit(lo, stats_cols=["k"])
    table.commit(hi)  # stats_cols inherited from the parent manifest
    m = table._resolve()
    assert len(m["files"]) == 2
    assert all(m["file_stats"][f]["k"] for f in m["files"])

    # change set touches only the low range → the hi file must carry over
    # by reference (same path), not be rewritten
    table.merge(_df(spark, [(5, "LO5")]), key_cols=["k"])
    m2 = table._resolve()
    hi_files = [f for f in m["files"] if m["file_stats"][f]["k"][0] >= 1000]
    assert hi_files and all(f in m2["files"] for f in hi_files), (
        "file outside the change-set key range was rewritten"
    )
    assert len(m2["files"]) == len(hi_files) + m2["added_files"]
    got = {r.k: r.v for r in table.read().collect()}
    assert got[5] == "LO5" and got[1050] == "hi1050" and len(got) == 200


def test_merge_without_stats_rewrites_all(spark, table):
    table.commit(_df(spark, [(1, "a"), (2, "b")]))  # no stats_cols
    v = table.merge(_df(spark, [(2, "B")]), key_cols=["k"])
    m = table._resolve(version=v)
    # full rewrite: no parent file survives by reference
    parent_files = set(table._resolve(version=1)["files"])
    assert not parent_files & set(m["files"])
    assert {r.k: r.v for r in table.read().collect()} == {1: "a", 2: "B"}


def test_merge_expire_keeps_live_files(spark, table):
    table.commit(_df(spark, [(1, "a"), (2, "b")]), stats_cols=["k"])
    table.merge(_df(spark, [(2, "B")]), key_cols=["k"])
    deleted = table.expire_snapshots(keep_last=1)
    assert deleted >= 1  # the rewritten v1 file is gone
    assert {r.k: r.v for r in table.read().collect()} == {1: "a", 2: "B"}
    with pytest.raises(ValueError):
        table.read(version=1)


def test_merge_empty_table_and_partitioned_rejected(spark, table, tmp_path):
    with pytest.raises(FileNotFoundError):
        table.merge(_df(spark, [(1, "a")]), key_cols=["k"])
    p = SnapshotTable(spark, str(tmp_path / "p"))
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("b")
    )
    p.commit(df, partition_by=["b"])
    with pytest.raises(NotImplementedError):
        p.merge(df, key_cols=["k"])
