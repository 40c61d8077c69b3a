"""Data-quality constraint semantics (philotes_spark/quality.py) on
crafted frames — pins the SQL-standard edge cases: NULL is not a
uniqueness violation, NULL FK children are exempt, NULLs never count
against accepted-values/range (those are not_null's job)."""

from pyspark.sql import Row

from philotes_spark import quality as Q


def _report(spark, checks, tables):
    rows = Q.run_checks(checks, tables).collect()
    return {r.check_name: (r.violations, r.status) for r in rows}


def test_not_null_counts_nulls(spark):
    t = spark.createDataFrame([Row(x=1), Row(x=None), Row(x=None)])
    rep = _report(spark, [Q.not_null("t", "x")], {"t": t})
    assert rep["not_null(t.x)"] == (2, "fail")


def test_unique_ignores_nulls_counts_dupes(spark):
    t = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=2), Row(k=None), Row(k=None)]
    )
    rep = _report(spark, [Q.unique("t", "k")], {"t": t})
    # 3 non-null rows over 2 distinct keys = 1 duplicate; nulls exempt
    assert rep["unique(t.k)"] == (1, "fail")


def test_accepted_values_and_range_exempt_nulls(spark):
    t = spark.createDataFrame(
        [Row(s="a", v=5.0), Row(s="z", v=-1.0), Row(s=None, v=None)]
    )
    rep = _report(
        spark,
        [Q.accepted_values("t", "s", ["a", "b"]), Q.in_range("t", "v", 0, 10)],
        {"t": t},
    )
    assert rep["accepted_values(t.s)"] == (1, "fail")
    assert rep["in_range(t.v)"] == (1, "fail")


def test_foreign_key_orphans_and_null_exemption(spark):
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=2), Row(fk=99), Row(fk=None)]
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    rep = _report(
        spark, [Q.foreign_key("c", "fk", "p", "pk")], {"c": child, "p": parent}
    )
    assert rep["foreign_key(c.fk->p.pk)"] == (1, "fail")


def test_all_green_report(spark):
    t = spark.createDataFrame([Row(k=1, s="a"), Row(k=2, s="b")])
    rep = _report(
        spark,
        [Q.unique("t", "k"), Q.accepted_values("t", "s", ["a", "b"])],
        {"t": t},
    )
    assert all(v == (0, "pass") for v in rep.values())
