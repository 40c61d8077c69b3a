"""Time-travel SQL *statements* (sample-queries.sql:47-52 as text) must
execute against snapshot tables: FOR VERSION AS OF, FOR TIMESTAMP AS OF,
both spellings, in joins, mixed with plain tables — and plain SQL passes
through untouched.
"""

import pytest
from pyspark.sql import functions as F

from philotes_spark.sql_frontend import sql
from philotes_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def t(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "tt"))
    tbl.commit(spark.range(0, 10).select(F.col("id").alias("v")))
    tbl.commit(spark.range(10, 25).select(F.col("id").alias("v")))
    return tbl


def test_version_as_of_statement(spark, t):
    got = sql(
        spark,
        "SELECT COUNT(*) AS n FROM events_v FOR VERSION AS OF 1",
        {"events_v": t},
    ).collect()
    assert got[0].n == 10
    # spark/delta spelling without FOR
    got = sql(
        spark, "SELECT COUNT(*) AS n FROM events_v VERSION AS OF 2", {"events_v": t}
    ).collect()
    assert got[0].n == 25


def test_timestamp_as_of_statement(spark, t):
    import datetime as dt

    t1 = t.snapshots().orderBy("version").collect()[0].timestamp_ms
    lit = dt.datetime.fromtimestamp(t1 / 1000, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    got = sql(
        spark,
        f"SELECT COUNT(*) AS n FROM ev FOR TIMESTAMP AS OF TIMESTAMP '{lit}'",
        {"ev": t},
    ).collect()
    assert got[0].n == 10


def test_as_of_inside_join_and_aggregate(spark, t):
    out = sql(
        spark,
        """
        SELECT a.v FROM ev VERSION AS OF 1 a
        JOIN ev VERSION AS OF 2 b ON a.v = b.v
        WHERE a.v >= 8 ORDER BY a.v
        """,
        {"ev": t},
    ).collect()
    assert [r.v for r in out] == [8, 9]


def test_plain_sql_passes_through(spark):
    assert sql(spark, "SELECT 1 + 1 AS two").collect()[0].two == 2


def test_unregistered_table_rejected(spark, t):
    with pytest.raises(ValueError, match="not a registered snapshot table"):
        sql(spark, "SELECT * FROM nope VERSION AS OF 1", {"ev": t})


def test_version_as_of_string_reads_tag(spark, t):
    """Iceberg/Spark accept a STRING in VERSION AS OF naming a ref:
    `VERSION AS OF 'audit-v1'` resolves the tag."""
    t.tag("audit-v1", version=1)
    got = sql(
        spark,
        "SELECT COUNT(*) AS n FROM ev FOR VERSION AS OF 'audit-v1'",
        {"ev": t},
    ).collect()
    assert got[0].n == 10
    with pytest.raises(ValueError, match="no tag or branch"):
        sql(spark, "SELECT * FROM ev VERSION AS OF 'nope'", {"ev": t})
    # a BRANCH name resolves to the branch head (Iceberg branch read)
    br = t.create_branch("wip")
    br.commit(
        spark.range(100, 104).withColumnRenamed("id", "v")
    )
    got = sql(
        spark, "SELECT COUNT(*) AS n FROM ev VERSION AS OF 'wip'", {"ev": t}
    ).collect()
    assert got[0].n == 29  # 25 main rows forked + 4 staged


# --- DML statements -----------------------------------------------------------


def test_delete_statement_text(spark, tmp_path):
    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 50).withColumnRenamed("id", "v"))
    res = sql_frontend.sql(
        spark,
        "DELETE FROM tbl WHERE v >= 40",
        snapshot_tables={"tbl": t},
        dml_keys={"tbl": ["v"]},
    ).collect()
    assert [(r.table, r.operation, r.version) for r in res] == [("tbl", "delete", 2)]
    assert sorted(r.v for r in t.read().collect()) == list(range(40))
    # and the statement surface still time-travels to the pre-DML state
    old = sql_frontend.sql(
        spark, "SELECT COUNT(*) AS n FROM tbl VERSION AS OF 1",
        snapshot_tables={"tbl": t},
    ).collect()
    assert old[0].n == 50


def test_update_statement_text_multi_set(spark, tmp_path):
    from pyspark.sql import Row

    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [Row(k=i, a=float(i), b="x") for i in range(10)]
        )
    )
    sql_frontend.sql(
        spark,
        "UPDATE tbl SET a = a * 2, b = concat(b, '!') WHERE k >= 8",
        snapshot_tables={"tbl": t},
        dml_keys={"tbl": ["k"]},
    ).collect()
    got = {r.k: (r.a, r.b) for r in t.read().collect()}
    assert got[7] == (7.0, "x") and got[8] == (16.0, "x!") and got[9] == (18.0, "x!")


def test_dml_requires_registration_and_keys(spark, tmp_path):
    import pytest as _pytest

    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5).withColumnRenamed("id", "v"))
    with _pytest.raises(ValueError, match="not a registered"):
        sql_frontend.sql(spark, "DELETE FROM nope WHERE v = 1",
                         snapshot_tables={"tbl": t}, dml_keys={"tbl": ["v"]})
    with _pytest.raises(ValueError, match="key columns"):
        sql_frontend.sql(spark, "DELETE FROM tbl WHERE v = 1",
                         snapshot_tables={"tbl": t})


def test_merge_statement_text_upsert_and_delete(spark, tmp_path):
    from pyspark.sql import Row

    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([Row(k=i, val=float(i)) for i in range(10)])
    )
    spark.createDataFrame(
        [
            Row(k=3, val=300.0, _del=False),   # update
            Row(k=42, val=420.0, _del=False),  # insert
            Row(k=7, val=0.0, _del=True),      # delete
        ]
    ).createOrReplaceTempView("chg")
    try:
        res = sql_frontend.sql(
            spark,
            "MERGE INTO tbl USING chg AS s ON tbl.k = s.k "
            "WHEN MATCHED AND _del THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
            snapshot_tables={"tbl": t},
        ).collect()
        assert [(r.table, r.operation, r.version) for r in res] == [
            ("tbl", "merge", 2)
        ]
        got = {r.k: r.val for r in t.read().collect()}
        assert got[3] == 300.0 and got[42] == 420.0 and 7 not in got
        assert len(got) == 10  # 10 - 1 deleted + 1 inserted
    finally:
        spark.catalog.dropTempView("chg")


def test_merge_statement_rejects_non_equi_on(spark, tmp_path):
    import pytest as _pytest

    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5).withColumnRenamed("id", "k"))
    spark.range(0, 2).withColumnRenamed("id", "k").createOrReplaceTempView("chg2")
    try:
        with _pytest.raises(ValueError, match="unsupported MERGE ON"):
            sql_frontend.sql(
                spark,
                "MERGE INTO tbl USING chg2 AS s ON tbl.k >= s.k "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *",
                snapshot_tables={"tbl": t},
            )
    finally:
        spark.catalog.dropTempView("chg2")


def test_insert_statement_text_select_and_values(spark, tmp_path):
    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5).withColumnRenamed("id", "v"))
    res = sql_frontend.sql(
        spark,
        "INSERT INTO tbl (v) VALUES (100), (101)",
        snapshot_tables={"tbl": t},
    ).collect()
    assert [(r.table, r.operation, r.version) for r in res] == [("tbl", "insert", 2)]
    sql_frontend.sql(
        spark,
        "INSERT INTO tbl SELECT CAST(id + 200 AS BIGINT) AS v FROM range(2)",
        snapshot_tables={"tbl": t},
    ).collect()
    got = sorted(r.v for r in t.read().collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 200, 201]
    # pre-insert state intact via time travel
    assert len(t.read(version=1).collect()) == 5


def test_insert_statement_rejects_schema_mismatch(spark, tmp_path):
    import pytest as _pytest

    from philotes_spark import sql_frontend
    from philotes_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 3).withColumnRenamed("id", "v"))
    with _pytest.raises(ValueError, match="do not match"):
        sql_frontend.sql(
            spark,
            "INSERT INTO tbl SELECT 1 AS wrong_col",
            snapshot_tables={"tbl": t},
        )
