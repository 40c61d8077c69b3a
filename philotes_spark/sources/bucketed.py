"""Bucketed tables: co-located, shuffle-free joins (SURVEY §4 scale
technique).

At 100 TB the dominant cost of a fact⋈fact join is the shuffle. Bucketing
pays that shuffle ONCE at write time — both tables hash-clustered into
the same number of buckets on the join key — and every subsequent join on
that key reads co-located buckets with ZERO exchange (Spark plans a
SortMergeJoin whose children are bucket-aligned scans). The reference's
analogue is Iceberg's bucket partition transform feeding Trino's
colocated joins; in Spark it is the built-in ``bucketBy`` +
``spark.sql.sources.bucketing.enabled`` (on by default).

When to use (documented contract, pinned by tests/test_bucketed_join.py):
- a join key used repeatedly across a workload (orders⋈customer,
  lineitem⋈orders) — amortize one write-side shuffle over many reads;
- bucket count ≈ cluster parallelism at the target scale; both sides
  MUST use the same count for exchange-free planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-clustered into ``n_buckets`` on ``key``.
    ``sort=True`` additionally sorts within buckets, letting the join skip
    its sort stage too (scans come back sort-merge-ready)."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange on either side (asserted in the plan-audit test)."""
    return spark.table(left_table).join(spark.table(right_table), key)
