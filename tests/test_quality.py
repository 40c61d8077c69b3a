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


def test_streaming_per_batch_dq_report(spark, sf_dir, tmp_path):
    """The post-batch validation loop of a CDC pipeline: run_checks
    inside foreachBatch produces a per-micro-batch violations report,
    and the per-batch violation totals sum to the batch-mode report
    over the same data — DQ composes with streaming without any
    stream-specific code."""
    from pyspark.sql import functions as F

    from philotes_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    feed = str(tmp_path / "feed")
    # two files → availableNow still may batch them together; totals, not
    # batch counts, are the contract
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        feed, mode="append"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        feed, mode="append"
    )
    checks = [
        Q.accepted_values(
            "events", "event_type",
            ["click", "view", "signup", "purchase", "error"],
        ),
        Q.in_range("events", "value", 0, 400),
        Q.not_null("events", "value"),
    ]
    reports: list[dict[str, int]] = []

    def sink(batch_df, batch_id):
        rows = Q.run_checks(checks, {"events": batch_df}).collect()
        reports.append({r.check_name: r.violations for r in rows})

    q = (
        spark.readStream.schema(ev.schema)
        .parquet(feed)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert reports, "at least one micro-batch must report"
    streamed_totals = {
        name: sum(rep.get(name, 0) for rep in reports)
        for name in {k for rep in reports for k in rep}
    }
    batch_rows = Q.run_checks(checks, {"events": ev}).collect()
    batch_totals = {r.check_name: r.violations for r in batch_rows}
    assert streamed_totals == batch_totals
