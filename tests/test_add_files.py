"""CALL add_files / register_table — adopting existing parquet
(Iceberg's migration procedures; VERDICT r15 what's-missing #5 tail).

``add_files`` must be metadata-plus-hard-links — never a data rewrite
(adopting 100 TB is a driver-side footer walk, not a Spark job over
100 TB) — with the full read surface (stats pruning, $files sizes,
MoR delta suppression) working over adopted files exactly as over
written ones. ``register_table`` binds an existing manifest chain
under a statement name.
"""

import os

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
        .repartition(2)
    )


def _rows(table):
    return sorted((r.k, r.g, r.v) for r in table.read().collect())


def test_adopts_by_hard_link_with_stats_and_pruning(spark, table, tmp_path):
    table.commit(_df(spark, 0, 100), stats_cols=["k"])
    src = str(tmp_path / "foreign")
    _df(spark, 100, 200).coalesce(2).write.parquet(src)

    v = table.add_files(src)
    m = table._resolve()
    assert m["operation"] == "add-files" and m["version"] == v
    assert _rows(table) == [(k, k % 7, k * 2) for k in range(200)]
    # zero-copy: same inode as the source where the fs allows links
    adopted = [f for f in m["files"] if f in set(m["files"]) - set(
        table._resolve(version=1)["files"]
    )]
    assert adopted
    srcs = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    linked = {os.stat(f).st_ino for f in adopted}
    assert linked == {os.stat(s).st_ino for s in srcs}
    # stats were recorded at adoption: range pruning works immediately
    kept, total = table.pruned_file_count("k", lo=150, hi=199)
    assert kept < total
    # and file_meta covers them (no per-file stat on $files)
    assert set(m["file_meta"]) == set(m["files"])


def test_bootstrap_empty_table_and_sql_surface(spark, tmp_path):
    src = str(tmp_path / "legacy")
    _df(spark, 0, 50).write.parquet(src)
    t = SnapshotTable(spark, str(tmp_path / "t2"))
    out = sql_stmt(
        spark,
        f"CALL add_files('t2', source => '{src}')",
        {"t2": t},
    ).collect()[0]
    assert out.operation == "add_files" and out.version == 1
    assert _rows(t) == [(k, k % 7, k * 2) for k in range(50)]


def test_refusals_name_their_remedy(spark, table, tmp_path):
    import datetime as dt

    # partitioned table
    p = SnapshotTable(spark, str(tmp_path / "p"))
    p.commit(
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1)], "ts timestamp, k int"
        ),
        partition_by=["days(ts)"],
    )
    src = str(tmp_path / "f1")
    _df(spark, 0, 10).write.parquet(src)
    with pytest.raises(ValueError, match="partitioned"):
        p.add_files(src)
    # schema mismatch
    table.commit(_df(spark, 0, 10))
    bad = str(tmp_path / "f2")
    spark.range(5).selectExpr("id AS k", "CAST(id AS STRING) AS g").write.parquet(bad)
    with pytest.raises(ValueError, match="does not match the table schema"):
        table.add_files(bad)
    # empty source
    empty = str(tmp_path / "f3")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no \\*.parquet"):
        table.add_files(empty)


def test_adoption_cannot_resurrect_pending_deleted_keys(spark, table, tmp_path):
    """Adopted rows inherit the pending MoR deltas like any append —
    adoption must not resurrect keys a pending equality delta deleted."""
    table.commit(_df(spark, 0, 100), stats_cols=["k"])
    ch = table.read().filter("k < 10").withColumn("_del", F.lit(True))
    table.merge(ch, key_cols=["k"], delete_col="_del", mode="mor")
    src = str(tmp_path / "overlap")
    _df(spark, 0, 20).write.parquet(src)  # keys 0..9 are pending-deleted
    table.add_files(src)
    got = sorted(r.k for r in table.read().select("k").collect())
    assert got == sorted(list(range(10, 100)) + list(range(10, 20)))


def test_register_table_binds_existing_chain(spark, table, tmp_path):
    table.commit(_df(spark, 0, 30))
    tables: dict = {}
    out = sql_stmt(
        spark,
        f"CALL register_table('ext', location => '{table.path}')",
        tables,
    ).collect()[0]
    assert out.version == 1 and "ext" in tables
    # the registered name serves the sql() surfaces that resolve
    # snapshot tables: time travel and the $-metadata tables
    assert sorted(
        r.k for r in sql_stmt(
            spark, "SELECT k FROM ext VERSION AS OF 1 WHERE k < 5", tables
        ).collect()
    ) == [0, 1, 2, 3, 4]
    n = sql_stmt(
        spark, "SELECT COUNT(*) AS n FROM ext$files", tables
    ).first()["n"]
    assert n == len(tables["ext"]._resolve()["files"])
    # name collision and empty location refuse with the remedy named
    with pytest.raises(ValueError, match="already registered"):
        sql_stmt(
            spark,
            f"CALL register_table('ext', location => '{table.path}')",
            tables,
        )
    with pytest.raises(ValueError, match="no snapshot manifest chain"):
        sql_stmt(
            spark,
            f"CALL register_table('ghost', location => '{tmp_path}/nope')",
            tables,
        )
